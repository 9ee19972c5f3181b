"""Multi-candidate speculative decoding (candidate-solutions engine).

Per cycle the draft proposes several candidate blocks which the target
verifies in ONE batched forward; the candidate with the longest accepted
prefix wins (ties broken by draft score, then lower index).  TPU-native
re-design of reference benchmark_candidate_solutions.py:417-741 with fully
static shapes:

* the candidate count is a static ``max_candidates``; cycles that want fewer
  (adaptive budget) pad with copies of the base candidate whose draft score
  is -inf, so they can never win a tie;
* candidate builders (``fixed_prefix_rank``, ``uncertainty_sparse_rank``,
  ``branch_beam``) are pure tensor ops on the draft logits — no host sync;
* verification shares the committed-context KV read-only across candidates
  and keeps per-candidate block K/V separate; committing the winner is a
  gather + one dynamic_update_slice (replaces the reference's full-cache
  clone + batch_repeat_interleave + batch_select_indices,
  benchmark_candidate_solutions.py:76-81, 574-576, 615-618);
* the adaptive per-cycle candidate budget (reference
  resolve_cycle_max_candidates, :382-414) runs on-device from the previous
  cycle's acceptance ratio.

Mode note: ``branch_beam`` enumerates the full (top-k)^depth assignment
space and keeps the global top-C by score, instead of the reference's
per-position beam pruning (:134-143) — identical when depth*log(k) is small
(the regimes actually swept in run_fixed_prefix_sweep.sh), strictly better
otherwise.  Greedy draft only (the reference raises for temperature > 0,
:441-442; the posterior sample may still be stochastic).
"""

from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dflash_tpu.core.config import DraftConfig, ModelConfig
from dflash_tpu.models import dflash_draft, qwen3
from dflash_tpu.ops.sampling import acceptance_length, sample, topk_desc
from dflash_tpu.spec.engine import (
    GenerationResult,
    LoopState,
    SpecEngine,
    _draft_stage,
    _prefill,
)

_NEG = jnp.float32(-1e30)


class CandidateConfig(NamedTuple):
    mode: str = "fixed_prefix_rank"  # | "uncertainty_sparse_rank" | "branch_beam"
    max_candidates: int = 4
    rank_top_k: int = 4  # reference --branch-top-k
    fixed_prefix_len: int = 2
    sparse_max_positions: int = 4
    branch_depth: int = 2
    margin_threshold: float = -1.0  # < 0 disables the probability-margin gate
    # adaptive per-cycle budget (reference resolve_cycle_max_candidates)
    adaptive: bool = False
    adaptive_budgets: Tuple[int, int, int] = (1, 2, 4)  # low, mid, high
    adaptive_accept_thresholds: Tuple[float, float] = (0.75, 0.45)  # high, mid
    adaptive_warmup_cycles: int = 4
    adaptive_probe_interval: int = 32
    # Shared-prefix verify: every builder keeps candidate positions < p
    # identical (p = fixed_prefix_len for the rank modes, 1 for branch_beam),
    # so the [C, B] verify recomputes those p rows C-fold.  When True the
    # verify runs on a flattened [1, p + C*(B-p)] row set whose attention
    # mask routes each candidate's suffix rows to the SHARED prefix rows —
    # p*(C-1) fewer rows through every matmul, attention, lm_head and
    # posterior sample per cycle.  Token-identical at greedy; at T > 0 the
    # shared prefix rows share ONE posterior sample across candidates
    # (self-consistent — the unflattened path drew C independent samples of
    # the same distribution for identical rows).
    shared_prefix: bool = True
    # Verify attention backend: "fused" = the Pallas two-part flash kernel
    # (kernels/verify_fused.py) — no [rows, T] HBM score transient, the
    # round-4-identified lever for the linear multi-row verify cost.
    attn_impl: str = "xla"


# ---------------------------------------------------------------------------
# Candidate builders — pure functions of (base block, draft logits)
# ---------------------------------------------------------------------------

def build_fixed_prefix_rank(
    block: jax.Array,  # [1, B] greedy base block
    draft_logits: jax.Array,  # [1, B-1, V] (row p-1 <-> block position p)
    cc: CandidateConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Candidates [C, B] + draft scores [C].

    Candidate 0 = greedy base; candidate r keeps positions < fixed_prefix_len
    and sets every suffix position to its rank-(r+1) token (reference
    build_fixed_prefix_rank_candidates, :181-249).  Scores are summed top-k
    logits per rank.
    """
    C = cc.max_candidates
    B = block.shape[1]
    V = draft_logits.shape[-1]
    suffix_start = max(1, min(cc.fixed_prefix_len, B))
    n_rank = min(C, cc.rank_top_k, V)

    suffix_logits = draft_logits[0, suffix_start - 1 :, :]  # [S, V]
    # exact top-n_rank without the vocab-wide sort lax.top_k lowers to (the
    # sort was the dominant candidate-cycle overhead at a 151k vocab)
    topv, topi = topk_desc(suffix_logits, n_rank)  # [S, n_rank]
    cand = jnp.broadcast_to(block, (C, B))
    ranks = jnp.minimum(jnp.arange(C), n_rank - 1)  # pad ranks clamp to last
    suffix_tokens = topi.T[ranks]  # [C, S]
    cand = jnp.concatenate([cand[:, :suffix_start], suffix_tokens.astype(jnp.int32)], axis=1)
    scores = topv.T.sum(axis=1)[ranks]  # [C]
    # Rows beyond the real rank pool duplicate the last rank: mask them out.
    valid = jnp.arange(C) < n_rank
    cand = jnp.where(valid[:, None], cand, jnp.broadcast_to(block, (C, B)))
    scores = jnp.where(valid, scores, _NEG)
    return cand, scores


def build_uncertainty_sparse_rank(
    block: jax.Array,
    draft_logits: jax.Array,
    cc: CandidateConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Single-position alternates at the most-uncertain suffix slots
    (reference build_uncertainty_sparse_rank_candidates, :252-379)."""
    C = cc.max_candidates
    B = block.shape[1]
    V = draft_logits.shape[-1]
    suffix_start = max(1, min(cc.fixed_prefix_len, B))
    S = B - suffix_start
    rank_k = min(cc.rank_top_k, V)
    if S <= 0 or rank_k <= 1 or C <= 1:
        base = jnp.broadcast_to(block, (C, B))
        return base, jnp.where(jnp.arange(C) == 0, 0.0, _NEG)

    suffix_logits = draft_logits[0, suffix_start - 1 :, :].astype(jnp.float32)  # [S, V]
    topv, topi = topk_desc(suffix_logits, rank_k)  # [S, rank_k]
    uncertainty = -(topv[:, 0] - topv[:, 1])  # higher = more uncertain

    keep = jnp.ones((S,), bool)
    if cc.margin_threshold >= 0:
        # top-2 probabilities from the already-extracted top-2 logits (the
        # softmax denominator is a full-row LSE; no second vocab pass)
        lse = jax.nn.logsumexp(suffix_logits, axis=-1)
        p2 = jnp.exp(topv[:, :2] - lse[:, None])
        keep = (p2[:, 0] - p2[:, 1]) <= cc.margin_threshold

    m = min(cc.sparse_max_positions, S)
    order = jnp.argsort(jnp.where(keep, uncertainty, _NEG), descending=True)
    sel = order[:m]  # suffix indices of the m most-uncertain kept positions
    sel_keep = keep[sel]

    alt = rank_k - 1
    alt_logits = topv[sel, 1:]  # [m, alt]
    alt_tokens = topi[sel, 1:]
    composite = uncertainty[sel][:, None] * 1e6 + alt_logits  # [m, alt]
    composite = jnp.where(sel_keep[:, None], composite, _NEG)

    n_alt = C - 1
    flat = composite.reshape(-1)
    k_eff = min(n_alt, m * alt)
    top_comp, top_idx = jax.lax.top_k(flat, k_eff)
    pos_choice = top_idx // alt  # index into sel
    alt_choice = top_idx % alt

    chosen_positions = sel[pos_choice] + suffix_start  # [k_eff] block positions
    chosen_tokens = alt_tokens[pos_choice, alt_choice]
    valid = top_comp > _NEG / 2

    base_score = jnp.where(sel_keep, topv[sel, 0], 0.0).sum()
    cand_scores = base_score - topv[sel, 0][pos_choice] + alt_logits[pos_choice, alt_choice]

    base = jnp.broadcast_to(block, (C, B))
    rows = jnp.arange(1, k_eff + 1)
    onehot = jax.nn.one_hot(chosen_positions, B, dtype=bool)  # [k_eff, B]
    onehot = onehot & valid[:, None]
    cand = base.at[rows].set(
        jnp.where(onehot, chosen_tokens[:, None], base[rows])
    )
    scores = jnp.full((C,), _NEG)
    scores = scores.at[0].set(base_score)
    scores = scores.at[rows].set(jnp.where(valid, cand_scores, _NEG))
    return cand, scores


def build_branch_beam(
    block: jax.Array,
    draft_logits: jax.Array,
    cc: CandidateConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Branch over the first ``branch_depth`` uncertain positions with top-k
    options each (reference select_branch_positions + build_candidate_blocks,
    :84-178), by full enumeration + global top-C."""
    C = cc.max_candidates
    B = block.shape[1]
    V = draft_logits.shape[-1]
    d = min(B - 1, cc.branch_depth)
    k = min(cc.rank_top_k, V)
    if d <= 0 or C <= 1 or k <= 1:
        base = jnp.broadcast_to(block, (C, B))
        return base, jnp.where(jnp.arange(C) == 0, 0.0, _NEG)
    if k ** d > 4096:
        raise ValueError(f"branch space {k}**{d} too large; reduce depth/top-k")

    head_logits = draft_logits[0, :d, :].astype(jnp.float32)
    raw_topv, topi = topk_desc(head_logits, k)  # [d, k]
    lse = jax.nn.logsumexp(head_logits, axis=-1)
    topv = raw_topv - lse[:, None]  # log-probs of the top-k tokens

    if cc.margin_threshold >= 0:
        p2 = jnp.exp(topv[:, :2])
        selected = (p2[:, 0] - p2[:, 1]) <= cc.margin_threshold  # [d]
        # Unselected positions may only use their greedy option.
        opt_ok = jnp.arange(k)[None, :] == 0
        topv = jnp.where(selected[:, None] | opt_ok, topv, _NEG)

    # Enumerate all k^d assignments.
    n = k ** d
    combo = jnp.arange(n)
    choice = jnp.stack([(combo // (k ** j)) % k for j in range(d)], axis=1)  # [n, d]
    pos_idx = jnp.arange(d)
    combo_scores = topv[pos_idx[None, :], choice].sum(axis=1)  # [n]
    combo_tokens = topi[pos_idx[None, :], choice]  # [n, d]
    is_greedy = (choice == 0).all(axis=1)
    combo_scores = jnp.where(is_greedy, _NEG, combo_scores)  # base handled separately

    k_eff = min(C - 1, n)
    top_s, top_i = jax.lax.top_k(combo_scores, k_eff)
    valid = top_s > _NEG / 2

    base = jnp.broadcast_to(block, (C, B))
    rows = jnp.arange(1, k_eff + 1)
    new_heads = jnp.where(
        valid[:, None], combo_tokens[top_i].astype(jnp.int32), base[rows, 1 : d + 1]
    )
    cand = base.at[rows, 1 : d + 1].set(new_heads)
    base_score = topv[:, 0].sum()
    scores = jnp.full((C,), _NEG)
    scores = scores.at[0].set(base_score)
    scores = scores.at[rows].set(jnp.where(valid, top_s, _NEG))
    return cand, scores


_BUILDERS = {
    "fixed_prefix_rank": build_fixed_prefix_rank,
    "uncertainty_sparse_rank": build_uncertainty_sparse_rank,
    "branch_beam": build_branch_beam,
}


def resolve_cycle_budget(
    cc: CandidateConfig,
    cycle_idx: jax.Array,
    last_accept_ratio: jax.Array,  # -1.0 encodes "no previous cycle"
) -> jax.Array:
    """On-device port of reference resolve_cycle_max_candidates (:382-414)."""
    if not cc.adaptive:
        return jnp.int32(cc.max_candidates)
    low, mid, high = cc.adaptive_budgets
    hi_thr, mid_thr = cc.adaptive_accept_thresholds
    base = jnp.where(
        last_accept_ratio < 0,
        high,
        jnp.where(
            last_accept_ratio >= hi_thr,
            low,
            jnp.where(last_accept_ratio >= mid_thr, mid, high),
        ),
    )
    probe = (cc.adaptive_probe_interval > 0) & (cycle_idx > 0) & (
        cycle_idx % max(cc.adaptive_probe_interval, 1) == 0
    )
    sel = jnp.where(
        (cycle_idx < cc.adaptive_warmup_cycles) | probe, high, base
    )
    return jnp.clip(sel, 1, cc.max_candidates).astype(jnp.int32)


# ---------------------------------------------------------------------------
# The candidate cycle
# ---------------------------------------------------------------------------

def _candidate_cycle(
    state: LoopState,
    t_params,
    d_params,
    temperature: jax.Array,
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    block_size: int,
    stop_token_ids: Tuple[int, ...],
    cc: CandidateConfig,
    forced_acc: Optional[jax.Array] = None,
) -> LoopState:
    B = block_size
    C = cc.max_candidates
    T = state.output_ids.shape[1]
    start = state.start
    key, k_post = jax.random.split(state.key)

    block_positions = start + jnp.arange(B, dtype=jnp.int32)[None, :]

    # draft: the engine's stage, with the logits the candidate builders rank
    d_kv, block, draft_logits = _draft_stage(
        state, t_params, d_params, tcfg=tcfg, dcfg=dcfg, block_size=B,
        with_logits=True,
    )

    # build candidates + adaptive budget masking
    cand, scores = _BUILDERS[cc.mode](block, draft_logits, cc)
    last_tau = jax.lax.dynamic_index_in_dim(
        state.acc_trace, jnp.maximum(state.cycle_idx - 1, 0), 0, keepdims=False
    )
    last_ratio = jnp.where(
        state.cycle_idx == 0, -1.0, last_tau.astype(jnp.float32) / B
    )
    budget = resolve_cycle_budget(cc, state.cycle_idx, last_ratio)
    in_budget = jnp.arange(C) < budget
    cand = jnp.where(in_budget[:, None], cand, jnp.broadcast_to(block, (C, B)))
    scores = jnp.where(in_budget, scores, _NEG)

    # batched verify over the shared context
    use_flat = cc.shared_prefix and C > 1 and B > 1
    if use_flat:
        # Shared-prefix flattened verify: all builders keep positions < p_sh
        # identical across candidates, so those rows' K/V, hidden, logits and
        # posterior are candidate-independent — compute them ONCE.  Rows =
        # [p_sh shared prefix | C x (B - p_sh) per-candidate suffixes]; the
        # row mask sends suffix rows to {shared prefix} + {own candidate's
        # earlier suffix rows}, exactly the attention set of the [C, B]
        # layout.  p_sh*(C-1) fewer rows through every layer + lm_head.
        p_sh = 1 if cc.mode == "branch_beam" else max(1, min(cc.fixed_prefix_len, B - 1))
        S = B - p_sh
        R = p_sh + C * S
        flat = jnp.concatenate([cand[0, :p_sh], cand[:, p_sh:].reshape(-1)])[None]
        ri = jnp.arange(R, dtype=jnp.int32)
        is_pre = ri < p_sh
        cand_of = jnp.where(is_pre, -1, (ri - p_sh) // S)
        pos_in_blk = jnp.where(is_pre, ri, p_sh + (ri - p_sh) % S)
        row_mask = (pos_in_blk[None, :] <= pos_in_blk[:, None]) & (
            is_pre[None, :] | (cand_of[None, :] == cand_of[:, None])
        )
        v_embeds = qwen3.embed(t_params, flat)  # [1, R, H]
        res = qwen3.forward_block_candidates(
            t_params, tcfg, v_embeds, start + pos_in_blk[None, :],
            state.t_kv, start, tap_ids=dcfg.target_layer_ids, blk_mask=row_mask,
            attn_impl=cc.attn_impl,
        )
        post_flat = sample(
            qwen3.lm_head(t_params, res.hidden), temperature, k_post
        )  # [1, R]
        posterior_all = jnp.concatenate(
            [
                jnp.broadcast_to(post_flat[0, :p_sh], (C, p_sh)),
                post_flat[0, p_sh:].reshape(C, S),
            ],
            axis=1,
        )  # [C, B]
    else:
        v_embeds = qwen3.embed(t_params, cand)  # [C, B, H]
        res = qwen3.forward_block_candidates(
            t_params, tcfg, v_embeds, jnp.broadcast_to(block_positions, (C, B)),
            state.t_kv, start, tap_ids=dcfg.target_layer_ids,
            attn_impl=cc.attn_impl,
        )
        posterior_all = sample(
            qwen3.lm_head(t_params, res.hidden), temperature, k_post
        )  # [C, B]
    acc_all = acceptance_length(cand[:, 1:], posterior_all)  # [C]

    # lexicographic winner: tau desc, draft score desc, index asc — staged
    # exactly rather than as a float composite: at acc=4 the 1e6-scaled
    # float32 composite's ULP is 0.5, which silently discards score gaps
    # below ~50 logits and the index term entirely (the reference's own
    # composite, benchmark_candidate_solutions.py:606, has the same flaw;
    # this implements its documented intent)
    tier1 = acc_all == jnp.max(acc_all)
    score_m = jnp.where(tier1, scores, _NEG)
    tier2 = tier1 & (score_m == jnp.max(score_m))
    winner = jnp.argmax(tier2)  # first True == lowest index
    acc = acc_all[winner]
    if forced_acc is not None:
        # Benchmark-only acceptance override (same contract as the vanilla
        # engine, spec/engine.py _verify_stage): emulates a target tau
        # distribution for cost studies when no trained draft checkpoint is
        # reachable.  Candidate building, the C-way batched verify, winner
        # selection and block-K/V commit all run identically — only the
        # accepted-prefix length is overridden.
        f = forced_acc[state.cycle_idx]
        acc = jnp.where(f >= 0, jnp.minimum(f, block_size - 1), acc)
    tau = acc + 1

    # commit winner tokens + bonus
    idx = jnp.arange(B + 1, dtype=jnp.int32)
    win_block = cand[winner][None, :]
    commit = jnp.where(idx[None, :B] <= acc, win_block, dcfg.mask_token_id)
    commit = jnp.concatenate(
        [commit, jnp.full((1, 1), dcfg.mask_token_id, jnp.int32)], axis=1
    )
    bonus = jnp.take(posterior_all[winner], acc)
    commit = commit.at[0, tau].set(bonus)
    output_ids = jax.lax.dynamic_update_slice(state.output_ids, commit, (0, start))

    committed_mask = idx[None, :] <= tau
    eos_hit = jnp.zeros((), bool)
    for sid in stop_token_ids:
        eos_hit = eos_hit | jnp.any((commit == sid) & committed_mask)

    # commit winner's block K/V into the main cache (branch-select == gather);
    # update_any quantizes on write when the cache is int8
    from dflash_tpu.cache.kv import update_any

    if use_flat:
        # winner rows = shared prefix rows + the winner's suffix span
        suf0 = p_sh + winner * S

        def win_rows(x):  # [L, 1, R, n_kv, d] -> [L, B, n_kv, d]
            x0 = x[:, 0]
            suf = jax.lax.dynamic_slice_in_dim(x0, suf0, S, axis=1)
            return jnp.concatenate([x0[:, :p_sh], suf], axis=1)

        blk_k = win_rows(res.blk_k)
        blk_v = win_rows(res.blk_v)
        taps_win = jnp.concatenate(
            [
                res.taps[0, :p_sh],
                jax.lax.dynamic_slice_in_dim(res.taps[0], suf0, S, axis=0),
            ],
            axis=0,
        )[None]  # [1, B, n_taps * H]
    else:
        blk_k = res.blk_k[:, winner]  # [L, B, n_kv, d]
        blk_v = res.blk_v[:, winner]
        taps_win = res.taps[winner][None]
    t_kv = jax.vmap(update_any, in_axes=(0, 0, 0, None))(
        state.t_kv, blk_k[:, None], blk_v[:, None], start
    )

    features = jax.lax.dynamic_update_slice(
        state.features, taps_win, (0, start, 0)
    )
    acc_trace = jax.lax.dynamic_update_index_in_dim(
        state.acc_trace, tau, state.cycle_idx, 0
    )
    return LoopState(
        output_ids=output_ids,
        start=start + tau,
        done=state.done | eos_hit,
        cycle_idx=state.cycle_idx + 1,
        acc_trace=acc_trace,
        key=key,
        t_kv=t_kv,
        d_kv=d_kv,
        features=features,
    )


def _candidate_decode_impl(
    t_params,
    d_params,
    state: LoopState,
    max_length: jax.Array,
    temperature: jax.Array,
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    block_size: int,
    stop_token_ids: Tuple[int, ...],
    max_cycles: int,
    cc: CandidateConfig,
    forced_acc: Optional[jax.Array] = None,
) -> LoopState:
    def cond(s: LoopState):
        return (s.start < max_length) & (~s.done) & (s.cycle_idx < max_cycles)

    def body(s: LoopState):
        return _candidate_cycle(
            s, t_params, d_params, temperature,
            tcfg=tcfg, dcfg=dcfg, block_size=block_size,
            stop_token_ids=stop_token_ids, cc=cc, forced_acc=forced_acc,
        )

    return jax.lax.while_loop(cond, body, state)


_candidate_decode = jax.jit(
    _candidate_decode_impl,
    static_argnames=("tcfg", "dcfg", "block_size", "stop_token_ids", "max_cycles", "cc"),
)


def candidate_generate(
    engine: SpecEngine,
    input_ids: np.ndarray,
    cc: CandidateConfig,
    temperature: float = 0.0,
    seed: int = 0,
    forced_acc: Optional[np.ndarray] = None,
) -> GenerationResult:
    """Full multi-candidate generation on the given engine's models."""
    ids, prompt_len, _ = engine._pad_prompt(input_ids)
    key = jax.random.PRNGKey(seed)
    temp = jnp.float32(temperature)
    plen = jnp.int32(prompt_len)
    max_length = jnp.int32(prompt_len + engine.max_new_tokens)
    if forced_acc is not None:
        fa = np.full((engine.max_new_tokens,), -1, np.int32)
        fa[: len(forced_acc)] = np.asarray(forced_acc, np.int32)[: engine.max_new_tokens]
        forced_acc = jnp.asarray(fa)

    t0 = time.perf_counter()
    state = _prefill(
        engine.t_params, engine.d_params, ids, plen, temp, key,
        tcfg=engine.tcfg, dcfg=engine.dcfg, total_len=engine.total_len,
        max_cycles=engine.max_new_tokens, kv_quant=engine.kv_quant,
    )
    state.output_ids.block_until_ready()
    ttft = time.perf_counter() - t0

    t1 = time.perf_counter()
    state = _candidate_decode(
        engine.t_params, engine.d_params, state, max_length, temp,
        tcfg=engine.tcfg, dcfg=engine.dcfg, block_size=engine.block_size,
        stop_token_ids=engine.stop_token_ids, max_cycles=engine.max_new_tokens,
        cc=cc, forced_acc=forced_acc,
    )
    state.output_ids.block_until_ready()
    decode_wall = time.perf_counter() - t1

    out = np.asarray(state.output_ids)
    n_cycles = int(state.cycle_idx)
    acc = np.asarray(state.acc_trace)[:n_cycles].tolist()
    seq = engine._trim(out, prompt_len)
    num_out = int(seq.shape[1] - prompt_len)
    return GenerationResult(
        output_ids=seq,
        num_input_tokens=prompt_len,
        num_output_tokens=num_out,
        time_to_first_token=ttft,
        time_per_output_token=decode_wall / max(num_out, 1),
        acceptance_lengths=acc,
        decode_wall_s=decode_wall,
    )
