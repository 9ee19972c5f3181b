"""The draft -> verify -> accept speculative decoding engine.

The reference implements this loop host-side with a device sync every cycle
(the ``.item()`` acceptance readback, reference benchmark.py:163, and
``torch.cuda.synchronize`` in ``cuda_time``, benchmark.py:39-41).  Here the
*entire decode* — every draft forward, verify forward, acceptance test, KV
frontier update and EOS check — runs on-device inside one jitted
``lax.while_loop``; the host only sees the final token buffer and the
per-cycle acceptance trace.

Cycle anatomy (mirrors reference benchmark.py:94-194 semantically):
  1. slice the current block (bonus token + mask tokens) from the output buf
  2. project the newly committed feature rows into the draft context cache
     (a sliding B-row window ending at the frontier — rewrites are idempotent)
  3. draft forward over the noise block; target lm_head on rows 1..B-1;
     greedy draft tokens fill block[1:]
  4. target verify forward over the block (causal, KV written at frontier)
  5. acceptance = longest prefix of draft tokens matching the target's
     posterior (cumprod rule); commit accepted prefix + bonus token
  6. write the verify pass's tap features at the frontier (recycling,
     reference benchmark.py:189); advance frontier; EOS check on the
     committed tokens

KV "crop" (reference benchmark.py:187) is implicit: caches are indexed by
absolute position and masked by the frontier, so rollback costs nothing.
"""

from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dflash_tpu.cache.kv import (
    KVCache,
    init_kv_cache,
    init_quant_kv_cache,
    write_prompt_rows,
)
from dflash_tpu.core.config import DraftConfig, ModelConfig
from dflash_tpu.models import dflash_draft, qwen3
from dflash_tpu.ops.sampling import TOPK_POOL, acceptance_length, sample, sample_topk_topp


class SamplingFilters(NamedTuple):
    """Per-request top-k / top-p sampling filters (the rest of the reference
    serving client's ``sampling_params``, benchmark_sglang.py:42-47).  Traced
    leaves — scalars for the single-request engine, [R] vectors per lane in
    the batched engine.  ``top_k <= 0`` and ``top_p >= 1`` disable."""

    top_k: jax.Array  # int32
    top_p: jax.Array  # float32


def _sample_posterior(
    logits: jax.Array,
    temperature: jax.Array,
    key: jax.Array,
    filters: Optional[SamplingFilters],
    topk_pool: int = TOPK_POOL,
) -> jax.Array:
    if filters is None:
        return sample(logits, temperature, key)
    return sample_topk_topp(
        logits, temperature, key, filters.top_k, filters.top_p, pool=topk_pool
    )


class LoopState(NamedTuple):
    output_ids: jax.Array  # [1, T] int32; committed prefix + mask_id tail
    start: jax.Array  # [] int32 frontier: next block start; row `start` holds the bonus token
    done: jax.Array  # [] bool — a stop token was committed
    cycle_idx: jax.Array  # [] int32
    acc_trace: jax.Array  # [C] int32 — tau per cycle
    key: jax.Array
    t_kv: KVCache
    d_kv: KVCache
    features: jax.Array  # [1, T, n_taps * H] target tap features per position


class GenerationResult(NamedTuple):
    output_ids: np.ndarray  # [1, L] trimmed (prompt + generation)
    num_input_tokens: int
    num_output_tokens: int
    time_to_first_token: float
    time_per_output_token: float
    acceptance_lengths: list
    decode_wall_s: float


# ---------------------------------------------------------------------------
# jitted stages
# ---------------------------------------------------------------------------

def _prefill_target(
    t_params,
    input_ids: jax.Array,  # [1, P]
    prompt_len: jax.Array,  # [] int32
    *,
    tcfg: ModelConfig,
    tap_ids: Tuple[int, ...],
    total_len: int,
    kv_quant: bool,
    chunk: Optional[int] = None,
    mesh=None,
    seq_axis: Optional[str] = None,
    attn_impl: str = "xla",
):
    """Shared target-side prefill: returns (t_kv, taps [1,P,F], last_hidden).

    Three strategies, all numerically equivalent:
      * one cache-free O(P^2) forward (default; models/qwen3.forward_prefill),
      * ring-attention sequence-sharded over ``seq_axis`` (long prompts,
        multi-chip — parallel/ring.py),
      * ``chunk``-token chunked prefill through the incremental-cache forward
        (long prompts on one chip: peak activation memory O(chunk * P)).
    """
    P = input_ids.shape[1]
    dtype = t_params["embed"].dtype
    if kv_quant:
        t_kv = init_quant_kv_cache(tcfg, 1, total_len)
    else:
        t_kv = init_kv_cache(tcfg, 1, total_len, dtype)
    positions = jnp.arange(P, dtype=jnp.int32)[None, :]
    embeds = qwen3.embed(t_params, input_ids)

    if chunk is None:
        res = qwen3.forward_prefill(
            t_params, tcfg, embeds, positions, tap_ids=tap_ids,
            mesh=mesh, seq_axis=seq_axis,
        )  # mesh also routes MoE layers through the EP dispatch
        t_kv = write_prompt_rows(t_kv, res.k, res.v)
        last_hidden = jax.lax.dynamic_slice_in_dim(res.hidden, prompt_len - 1, 1, axis=1)
        return t_kv, res.taps, last_hidden

    if P % chunk != 0:
        raise ValueError(f"prompt pad {P} not divisible by prefill chunk {chunk}")
    C = chunk
    H = tcfg.hidden_size
    n_taps = max(len(tap_ids), 1)
    taps_buf = jnp.zeros((1, P, n_taps * H), dtype)
    last_hidden0 = jnp.zeros((1, 1, H), dtype)

    def body(c, carry):
        t_kv, taps_buf, last_hidden = carry
        c0 = c * C
        emb_c = jax.lax.dynamic_slice(embeds, (0, c0, 0), (1, C, H))
        pos_c = c0 + jnp.arange(C, dtype=jnp.int32)[None, :]
        mask = qwen3.causal_mask(pos_c[0], total_len)
        res = qwen3.forward(
            t_params, tcfg, emb_c, pos_c, t_kv, c0, mask, tap_ids=tap_ids,
            mesh=mesh,
            attn_limit=(c0 + C) if attn_impl == "bucketed" else None,
        )
        taps_buf = jax.lax.dynamic_update_slice(taps_buf, res.taps, (0, c0, 0))
        # Keep the hidden row at prompt_len-1 when it falls inside this chunk.
        rel = prompt_len - 1 - c0
        row = jax.lax.dynamic_slice_in_dim(
            res.hidden, jnp.clip(rel, 0, C - 1), 1, axis=1
        )
        last_hidden = jnp.where((rel >= 0) & (rel < C), row, last_hidden)
        return res.kv, taps_buf, last_hidden

    t_kv, taps_buf, last_hidden = jax.lax.fori_loop(
        0, P // C, body, (t_kv, taps_buf, last_hidden0)
    )
    return t_kv, taps_buf, last_hidden


def _prefill_impl(
    t_params,
    d_params,
    input_ids: jax.Array,  # [1, P] padded with zeros beyond prompt_len
    prompt_len: jax.Array,  # [] int32
    temperature: jax.Array,
    key: jax.Array,
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    total_len: int,
    max_cycles: int,
    kv_quant: bool = False,
    prefill_chunk: Optional[int] = None,
    mesh=None,
    seq_axis: Optional[str] = None,
    attn_impl: str = "xla",
    filters: Optional[SamplingFilters] = None,
    topk_pool: int = TOPK_POOL,
) -> LoopState:
    """Target prefill + first-token sample + draft context prefill.

    Mirrors reference benchmark.py:70-83 (``logits_to_keep=1`` -> lm_head on
    the last prompt row only) plus the draft-side context projection that the
    reference performs lazily inside the first cycle.
    """
    P = input_ids.shape[1]
    H = tcfg.hidden_size
    key, k_sample = jax.random.split(key)

    dtype = t_params["embed"].dtype
    d_kv = init_kv_cache(dcfg.model, 1, total_len, dtype)
    positions = jnp.arange(P, dtype=jnp.int32)[None, :]

    t_kv, taps, last_hidden = _prefill_target(
        t_params, input_ids, prompt_len,
        tcfg=tcfg, tap_ids=dcfg.target_layer_ids, total_len=total_len,
        kv_quant=kv_quant, chunk=prefill_chunk, mesh=mesh, seq_axis=seq_axis,
        attn_impl=attn_impl,
    )
    first_token = _sample_posterior(
        qwen3.lm_head(t_params, last_hidden), temperature, k_sample, filters,
        topk_pool,
    )  # [1,1]

    output_ids = jnp.full((1, total_len), dcfg.mask_token_id, jnp.int32)
    prompt_row = jnp.where(
        jnp.arange(P)[None, :] < prompt_len, input_ids.astype(jnp.int32), dcfg.mask_token_id
    )
    output_ids = jax.lax.dynamic_update_slice(output_ids, prompt_row, (0, 0))
    output_ids = output_ids.at[0, prompt_len].set(first_token[0, 0])

    features = jnp.zeros((1, total_len, dcfg.num_taps * H), taps.dtype)
    features = jax.lax.dynamic_update_slice(features, taps, (0, 0, 0))

    d_kv = dflash_draft.append_ctx(
        d_params, dcfg, d_kv, taps, positions, jnp.zeros((), jnp.int32)
    )

    return LoopState(
        output_ids=output_ids,
        start=prompt_len.astype(jnp.int32),
        done=jnp.zeros((), bool),
        cycle_idx=jnp.zeros((), jnp.int32),
        acc_trace=jnp.zeros((max_cycles,), jnp.int32),
        key=key,
        t_kv=t_kv,
        d_kv=d_kv,
        features=features,
    )


def _prefill_from_prefix_impl(
    t_params,
    d_params,
    input_ids: jax.Array,  # [1, P] padded
    prompt_len: jax.Array,  # [] int32
    prefix_kv,  # KVCache | QuantKVCache rows pytree, leaves [L, 1, P0, ...]
    prefix_taps: jax.Array,  # [1, P0, n_taps * H]
    temperature: jax.Array,
    key: jax.Array,
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    total_len: int,
    max_cycles: int,
    kv_quant: bool = False,
    filters: Optional[SamplingFilters] = None,
    topk_pool: int = TOPK_POOL,
) -> LoopState:
    """Prefill resuming from a cached prompt prefix (engine prefix cache,
    the TPU-native counterpart of SGLang's radix cache): the cached rows are
    committed at position 0 and only the suffix [P0, P) runs a forward —
    O((P-P0)·P) attention instead of O(P²)."""
    P = input_ids.shape[1]
    P0 = prefix_taps.shape[1]
    H = tcfg.hidden_size
    key, k_sample = jax.random.split(key)

    dtype = t_params["embed"].dtype
    d_kv = init_kv_cache(dcfg.model, 1, total_len, dtype)
    if kv_quant:
        t_kv = init_quant_kv_cache(tcfg, 1, total_len)
    else:
        t_kv = init_kv_cache(tcfg, 1, total_len, dtype)
    # The cached rows are in the cache's own representation (bf16 or
    # int8+scales), so the commit is a direct per-leaf write — no requant.
    t_kv = jax.tree.map(
        lambda buf, rows: jax.lax.dynamic_update_slice(
            buf, rows.astype(buf.dtype), (0,) * buf.ndim
        ),
        t_kv, prefix_kv,
    )

    suffix_ids = input_ids[:, P0:]
    positions = P0 + jnp.arange(P - P0, dtype=jnp.int32)[None, :]
    mask = qwen3.causal_mask(positions[0], total_len)
    res = qwen3.forward(
        t_params, tcfg, qwen3.embed(t_params, suffix_ids), positions, t_kv,
        jnp.int32(P0), mask, tap_ids=dcfg.target_layer_ids,
    )
    taps = jnp.concatenate([prefix_taps.astype(res.taps.dtype), res.taps], axis=1)
    last_hidden = jax.lax.dynamic_slice_in_dim(
        res.hidden, prompt_len - 1 - P0, 1, axis=1
    )
    first_token = _sample_posterior(
        qwen3.lm_head(t_params, last_hidden), temperature, k_sample, filters,
        topk_pool,
    )

    output_ids = jnp.full((1, total_len), dcfg.mask_token_id, jnp.int32)
    prompt_row = jnp.where(
        jnp.arange(P)[None, :] < prompt_len, input_ids.astype(jnp.int32), dcfg.mask_token_id
    )
    output_ids = jax.lax.dynamic_update_slice(output_ids, prompt_row, (0, 0))
    output_ids = output_ids.at[0, prompt_len].set(first_token[0, 0])

    features = jnp.zeros((1, total_len, dcfg.num_taps * H), taps.dtype)
    features = jax.lax.dynamic_update_slice(features, taps, (0, 0, 0))

    all_positions = jnp.arange(P, dtype=jnp.int32)[None, :]
    d_kv = dflash_draft.append_ctx(
        d_params, dcfg, d_kv, taps, all_positions, jnp.zeros((), jnp.int32)
    )

    return LoopState(
        output_ids=output_ids,
        start=prompt_len.astype(jnp.int32),
        done=jnp.zeros((), bool),
        cycle_idx=jnp.zeros((), jnp.int32),
        acc_trace=jnp.zeros((max_cycles,), jnp.int32),
        key=key,
        t_kv=res.kv,
        d_kv=d_kv,
        features=features,
    )


_prefill_from_prefix = jax.jit(
    _prefill_from_prefix_impl,
    static_argnames=(
        "tcfg", "dcfg", "total_len", "max_cycles", "kv_quant", "topk_pool",
    ),
)


def _prefill_chunk_impl(
    t_params,
    scratch_kv,  # KVCache | QuantKVCache sized [L, 1, P0_cap, ...] (donated)
    taps_buf: jax.Array,  # [1, P0_cap, n_taps * H] (donated)
    chunk_ids: jax.Array,  # [1, C] the chunk's token ids
    c0: jax.Array,  # [] int32 — absolute start position of this chunk
    *,
    tcfg: ModelConfig,
    tap_ids: Tuple[int, ...],
):
    """ONE chunk of an interleaved admission prefill (engine/batching.py):
    a C-token incremental forward against the partial prompt KV, dispatched
    BETWEEN decode windows so a long admission never stalls the running
    lanes for a full O(P²) prefill (the serving role of SGLang's chunked
    prefill, reference benchmark_sglang.py:436-447).  The completed prefix
    rows feed the existing ``_prefill_from_prefix`` resume path."""
    C = chunk_ids.shape[1]
    L = taps_buf.shape[1]
    pos_c = c0 + jnp.arange(C, dtype=jnp.int32)[None, :]
    mask = qwen3.causal_mask(pos_c[0], L)
    res = qwen3.forward(
        t_params, tcfg, qwen3.embed(t_params, chunk_ids), pos_c,
        scratch_kv, c0, mask, tap_ids=tap_ids,
    )
    taps_buf = jax.lax.dynamic_update_slice(taps_buf, res.taps, (0, c0, 0))
    return res.kv, taps_buf


_prefill_chunk = jax.jit(
    _prefill_chunk_impl,
    static_argnames=("tcfg", "tap_ids"),
    donate_argnums=(1, 2),
)


class CycleAux(NamedTuple):
    tau: jax.Array  # [] int32 — committed tokens this cycle
    l_gen: jax.Array  # [] float32 — EOS-aware drafted length (DiffuSpec ADL
    #   signal, reference benchmark_dynamic_schedule.py:344-349)


def _draft_stage(
    state: LoopState,
    t_params,
    d_params,
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    block_size: int,
    ctx_window: Optional[int] = None,
    draft_temperature: Optional[jax.Array] = None,
    draft_steps: int = 1,
    with_logits: bool = False,
):
    """Draft context append + non-causal draft forward + draft sampling.

    Returns (updated draft KV cache, drafted block [1, B]); with
    ``with_logits`` also the final draft logits [1, B-1, V] (the candidate
    builders rank alternates from them).  With ``draft_steps > 1``, re-embeds
    and re-denoises the drafted block repeatedly before verification
    (reference multi-step refinement, benchmark.py:112-141 — measured there
    to collapse tau; kept for parity).
    """
    B = block_size
    W = ctx_window if ctx_window is not None else B
    T = state.output_ids.shape[1]
    start = state.start
    _, _, k_draft = jax.random.split(state.key, 3)

    block = jax.lax.dynamic_slice(state.output_ids, (0, start), (1, B))  # [1, B]
    block_positions = start + jnp.arange(B, dtype=jnp.int32)[None, :]

    # -- draft context append: W-row window ending at the frontier ----------
    w0 = jnp.clip(start - W, 0, T - W)
    feats_w = jax.lax.dynamic_slice(
        state.features, (0, w0, 0), (1, W, state.features.shape[2])
    )
    w_positions = w0 + jnp.arange(W, dtype=jnp.int32)[None, :]
    d_kv = dflash_draft.append_ctx(d_params, dcfg, state.d_kv, feats_w, w_positions, w0)

    # -- draft forward: unmask the whole block in one pass ------------------
    for _ in range(max(1, draft_steps)):
        noise_embeds = qwen3.embed(t_params, block)  # target embeddings, benchmark.py:116
        d_hidden = dflash_draft.forward(
            d_params, dcfg, noise_embeds, block_positions, d_kv, start
        )
        # Target lm_head on rows 1..B-1 (reference benchmark.py:130-140).
        draft_logits = qwen3.lm_head(t_params, d_hidden[:, 1:])
        if draft_temperature is None:
            draft_tokens = jnp.argmax(draft_logits, axis=-1).astype(jnp.int32)
        else:
            draft_tokens = sample(draft_logits, draft_temperature, k_draft)
        block = jnp.concatenate([block[:, :1], draft_tokens], axis=1)
    if with_logits:
        return d_kv, block, draft_logits
    return d_kv, block


def _verify_stage(
    state: LoopState,
    d_kv: KVCache,
    block: jax.Array,  # [1, B] drafted block
    t_params,
    temperature: jax.Array,
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    block_size: int,
    stop_token_ids: Tuple[int, ...],
    forced_acc: Optional[jax.Array] = None,
    with_aux: bool = False,
    mesh=None,
    attn_impl: str = "xla",
    filters: Optional[SamplingFilters] = None,
    topk_pool: int = TOPK_POOL,
):
    B = block_size
    T = state.output_ids.shape[1]
    start = state.start
    key, k_post, _ = jax.random.split(state.key, 3)
    block_positions = start + jnp.arange(B, dtype=jnp.int32)[None, :]

    # -- verify forward -----------------------------------------------------
    v_embeds = qwen3.embed(t_params, block)
    if attn_impl in ("xla", "fused"):
        # Two-part verify (default since round 4): the committed-context
        # cache is READ-ONLY inside the layer scan (pure xs — no ys), the
        # block rows attend via the LSE-merged two-part attention, and the
        # accepted rows commit ONCE at cycle end.  The previous structure
        # (attn_impl="xla_fullbuf") wrote block K/V into the cache per layer
        # inside the scan, which forced a full cache-layer copy through the
        # scan's ys every layer every cycle (~190 MB/cycle single-stream at
        # total_len 657; the 16-lane batched loop's profiled ~4.4 ms/cycle
        # "ys write-back").  Measured A/B single-stream: 1.063 -> 1.011
        # ms/tok (the candidate path's C=1 cycle exposed the win,
        # docs/RESULTS.md round 4).
        res = qwen3.forward_block_candidates(
            t_params, tcfg, v_embeds, block_positions, state.t_kv, start,
            tap_ids=dcfg.target_layer_ids, mesh=mesh, attn_impl=attn_impl,
        )
        from dflash_tpu.cache.kv import update_any as _upd

        new_t_kv = jax.vmap(_upd, in_axes=(0, 0, 0, None))(
            state.t_kv, res.blk_k, res.blk_v, start
        )
        res = qwen3.ForwardResult(hidden=res.hidden, taps=res.taps, kv=new_t_kv)
    else:
        v_mask = qwen3.causal_mask(block_positions[0], T)
        res = qwen3.forward(
            t_params, tcfg, v_embeds, block_positions, state.t_kv, start, v_mask,
            tap_ids=dcfg.target_layer_ids, mesh=mesh,
            attn_impl="xla" if attn_impl in ("bucketed", "xla_fullbuf") else attn_impl,
            attn_limit=(start + B) if attn_impl == "bucketed" else None,
        )
    posterior = _sample_posterior(
        qwen3.lm_head(t_params, res.hidden), temperature, k_post, filters,
        topk_pool,
    )  # [1, B]

    # -- accept + commit ----------------------------------------------------
    acc = acceptance_length(block[:, 1:], posterior)[0]  # [] int32
    if forced_acc is not None:
        # Benchmark-only acceptance override: emulates a reference-matching
        # tau distribution when no trained draft checkpoint is available.
        # All compute/data movement is identical to the real rule.
        f = forced_acc[state.cycle_idx]
        acc = jnp.where(f >= 0, jnp.minimum(f, block_size - 1), acc)
    tau = acc + 1
    idx = jnp.arange(B + 1, dtype=jnp.int32)
    commit = jnp.where(idx[None, :B] <= acc, block, dcfg.mask_token_id)
    commit = jnp.concatenate(
        [commit, jnp.full((1, 1), dcfg.mask_token_id, jnp.int32)], axis=1
    )
    bonus = jnp.take(posterior[0], acc)
    commit = commit.at[0, tau].set(bonus)  # bonus token at the new frontier
    output_ids = jax.lax.dynamic_update_slice(state.output_ids, commit, (0, start))

    committed_mask = idx[None, :] <= tau
    eos_hit = jnp.zeros((), bool)
    for sid in stop_token_ids:
        eos_hit = eos_hit | jnp.any((commit == sid) & committed_mask)

    # -- recycle verify features (reference benchmark.py:189) ---------------
    features = jax.lax.dynamic_update_slice(state.features, res.taps, (0, start, 0))

    acc_trace = jax.lax.dynamic_update_index_in_dim(
        state.acc_trace, tau, state.cycle_idx, 0
    )
    new_state = LoopState(
        output_ids=output_ids,
        start=start + tau,
        done=state.done | eos_hit,
        cycle_idx=state.cycle_idx + 1,
        acc_trace=acc_trace,
        key=key,
        t_kv=res.kv,
        d_kv=d_kv,
        features=features,
    )
    if not with_aux:
        return new_state
    # EOS-aware drafted length l_gen in [1, B]: index of the first stop token
    # among the drafted rows block[1:], +1; B if none.
    if stop_token_ids:
        is_stop = jnp.zeros((B - 1,), bool)
        for sid in stop_token_ids:
            is_stop = is_stop | (block[0, 1:] == sid)
        first = jnp.argmax(is_stop)
        l_gen = jnp.where(
            jnp.any(is_stop), jnp.minimum(first + 1, B), B
        ).astype(jnp.float32)
    else:
        l_gen = jnp.float32(B)
    return new_state, CycleAux(tau=tau, l_gen=l_gen)


def _cycle(
    state: LoopState,
    t_params,
    d_params,
    temperature: jax.Array,
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    block_size: int,
    stop_token_ids: Tuple[int, ...],
    forced_acc: Optional[jax.Array] = None,
    ctx_window: Optional[int] = None,
    draft_temperature: Optional[jax.Array] = None,
    draft_steps: int = 1,
    with_aux: bool = False,
    mesh=None,
    attn_impl: str = "xla",
    filters: Optional[SamplingFilters] = None,
    topk_pool: int = TOPK_POOL,
):
    """One fused draft -> verify -> accept cycle (see module docstring)."""
    d_kv, block = _draft_stage(
        state, t_params, d_params,
        tcfg=tcfg, dcfg=dcfg, block_size=block_size, ctx_window=ctx_window,
        draft_temperature=draft_temperature, draft_steps=draft_steps,
    )
    return _verify_stage(
        state, d_kv, block, t_params, temperature,
        tcfg=tcfg, dcfg=dcfg, block_size=block_size,
        stop_token_ids=stop_token_ids, forced_acc=forced_acc, with_aux=with_aux,
        mesh=mesh, attn_impl=attn_impl, filters=filters, topk_pool=topk_pool,
    )


def _decode_impl(
    t_params,
    d_params,
    state: LoopState,
    max_length: jax.Array,  # [] int32 = prompt_len + max_new_tokens
    temperature: jax.Array,
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    block_size: int,
    stop_token_ids: Tuple[int, ...],
    max_cycles: int,
    forced_acc: Optional[jax.Array] = None,
    draft_steps: int = 1,
    mesh=None,
    attn_impl: str = "xla",
    filters: Optional[SamplingFilters] = None,
    topk_pool: int = TOPK_POOL,
) -> LoopState:
    def cond(s: LoopState):
        return (s.start < max_length) & (~s.done) & (s.cycle_idx < max_cycles)

    def body(s: LoopState):
        return _cycle(
            s, t_params, d_params, temperature,
            tcfg=tcfg, dcfg=dcfg, block_size=block_size,
            stop_token_ids=stop_token_ids, forced_acc=forced_acc,
            draft_steps=draft_steps, mesh=mesh, attn_impl=attn_impl,
            filters=filters, topk_pool=topk_pool,
        )

    return jax.lax.while_loop(cond, body, state)


_prefill = jax.jit(
    _prefill_impl,
    static_argnames=(
        "tcfg", "dcfg", "total_len", "max_cycles", "kv_quant",
        "prefill_chunk", "mesh", "seq_axis", "attn_impl", "topk_pool",
    ),
)
_decode = jax.jit(
    _decode_impl,
    static_argnames=(
        "tcfg", "dcfg", "block_size", "stop_token_ids", "max_cycles",
        "draft_steps", "mesh", "attn_impl", "topk_pool",
    ),
)


# ---------------------------------------------------------------------------
# Autoregressive baseline (reference block_size=1 path, benchmark.py:104-108:
# draft skipped, one token per cycle — the built-in correctness oracle).
# ---------------------------------------------------------------------------

class ARState(NamedTuple):
    output_ids: jax.Array
    start: jax.Array
    done: jax.Array
    key: jax.Array
    t_kv: KVCache


@partial(
    jax.jit,
    static_argnames=(
        "tcfg", "total_len", "mask_token_id", "kv_quant",
        "prefill_chunk", "mesh", "seq_axis", "attn_impl",
    ),
)
def _ar_prefill(
    t_params, input_ids, prompt_len, temperature, key,
    *, tcfg: ModelConfig, total_len: int, mask_token_id: int, kv_quant: bool = False,
    prefill_chunk: Optional[int] = None, mesh=None, seq_axis: Optional[str] = None,
    attn_impl: str = "xla", filters: Optional[SamplingFilters] = None,
) -> ARState:
    P = input_ids.shape[1]
    key, k_sample = jax.random.split(key)
    t_kv, _, last_hidden = _prefill_target(
        t_params, input_ids, prompt_len,
        tcfg=tcfg, tap_ids=(), total_len=total_len, kv_quant=kv_quant,
        chunk=prefill_chunk, mesh=mesh, seq_axis=seq_axis, attn_impl=attn_impl,
    )
    first_token = _sample_posterior(
        qwen3.lm_head(t_params, last_hidden), temperature, k_sample, filters
    )
    output_ids = jnp.full((1, total_len), mask_token_id, jnp.int32)
    prompt_row = jnp.where(
        jnp.arange(P)[None, :] < prompt_len, input_ids.astype(jnp.int32), mask_token_id
    )
    output_ids = jax.lax.dynamic_update_slice(output_ids, prompt_row, (0, 0))
    output_ids = output_ids.at[0, prompt_len].set(first_token[0, 0])
    return ARState(output_ids, prompt_len.astype(jnp.int32), jnp.zeros((), bool), key, t_kv)


@partial(jax.jit, static_argnames=("tcfg", "stop_token_ids", "mesh", "attn_impl"))
def _ar_decode(
    t_params, state: ARState, max_length, temperature,
    *, tcfg: ModelConfig, stop_token_ids: Tuple[int, ...], mesh=None,
    attn_impl: str = "xla", filters: Optional[SamplingFilters] = None,
) -> ARState:
    T = state.output_ids.shape[1]

    def cond(s: ARState):
        return (s.start < max_length) & (~s.done)

    def body(s: ARState):
        key, k_post = jax.random.split(s.key)
        tok = jax.lax.dynamic_slice(s.output_ids, (0, s.start), (1, 1))
        positions = s.start[None, None] * jnp.ones((1, 1), jnp.int32)
        embeds = qwen3.embed(t_params, tok)
        if attn_impl == "xla":
            # Same two-part structure as the spec verify (read-only ctx in
            # the layer scan + one end-of-step commit): the in-scan cache
            # write forced a full cache-layer ys copy per layer per step —
            # the AR baseline deserves the same fix the spec path got, so
            # the headline speedup ratio compares two best-effort paths.
            res = qwen3.forward_block_candidates(
                t_params, tcfg, embeds, positions, s.t_kv, s.start,
                tap_ids=(), mesh=mesh,
            )
            from dflash_tpu.cache.kv import update_any as _upd

            new_kv = jax.vmap(_upd, in_axes=(0, 0, 0, None))(
                s.t_kv, res.blk_k, res.blk_v, s.start
            )
            res = qwen3.ForwardResult(hidden=res.hidden, taps=res.taps, kv=new_kv)
        else:
            mask = qwen3.causal_mask(positions[0], T)
            res = qwen3.forward(
                t_params, tcfg, embeds, positions, s.t_kv, s.start, mask,
                mesh=mesh,
                attn_impl="xla" if attn_impl in ("bucketed", "xla_fullbuf") else attn_impl,
                attn_limit=(s.start + 1) if attn_impl == "bucketed" else None,
            )
        nxt = _sample_posterior(
            qwen3.lm_head(t_params, res.hidden), temperature, k_post, filters
        )[0, 0]
        output_ids = s.output_ids.at[0, s.start + 1].set(nxt)
        eos = jnp.zeros((), bool)
        for sid in stop_token_ids:
            eos = eos | (nxt == sid) | (tok[0, 0] == sid)
        return ARState(output_ids, s.start + 1, s.done | eos, key, res.kv)

    return jax.lax.while_loop(cond, body, state)


# ---------------------------------------------------------------------------
# Host-level engine
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class SpecEngine:
    """Single-request speculative/AR generation over jitted device loops.

    Prompt lengths are padded to ``prompt_bucket`` multiples and the token /
    cache buffers are sized ``prompt_cap + max_new_tokens + block + 1``, so a
    fixed (prompt_cap, max_new_tokens) pair compiles exactly one prefill and
    one decode executable per mode.
    """

    def __init__(
        self,
        tcfg: ModelConfig,
        dcfg: DraftConfig,
        t_params,
        d_params,
        *,
        max_new_tokens: int,
        block_size: Optional[int] = None,
        prompt_cap: int = 1024,
        prompt_bucket: int = 128,
        stop_token_ids: Sequence[int] = (),
        kv_quant: bool = False,
        prefill_chunk: Optional[int] = None,
        mesh=None,
        seq_axis: Optional[str] = None,
        attn_impl: str = "xla",
        topk_pool: int = TOPK_POOL,
    ):
        self.tcfg = tcfg
        self.dcfg = dcfg
        self.t_params = t_params
        self.d_params = d_params
        self.max_new_tokens = int(max_new_tokens)
        self.block_size = int(block_size if block_size is not None else dcfg.block_size)
        self.prompt_cap = int(prompt_cap)
        self.prompt_bucket = int(prompt_bucket)
        self.stop_token_ids = tuple(int(s) for s in stop_token_ids)
        self.kv_quant = bool(kv_quant)
        # "auto": full O(P^2) prefill for short prompts, chunked past the
        # measured crossover (~4k on v5e, docs/RESULTS.md TTFT table).
        self.prefill_chunk = prefill_chunk
        self.mesh = mesh
        self.seq_axis = seq_axis
        self.attn_impl = attn_impl
        # static top-k/top-p candidate pool: exact for any top_k <= topk_pool
        # (ops/sampling.py); generate() rejects wider requests loudly
        self.topk_pool = int(topk_pool)
        self.total_len = self.prompt_cap + self.max_new_tokens + self.block_size + 1
        if attn_impl == "pallas":
            # frontier-bounded kernel streams the cache in fixed-size chunks
            self.total_len = _round_up(self.total_len, 512)
        elif attn_impl == "fused":
            # The fused two-part verify kernel (kernels/verify_fused.py)
            # chunks the ctx cache in CK | 512 blocks and silently falls back
            # to XLA on unaligned caches, so fused engines align.  NOT done
            # unconditionally: the spare rows cost real HBM at batched lane
            # counts (24 lanes OOM'd) and ~2% single-stream TPOT (bigger
            # full-buffer attention reads) — measured round 5.  A
            # CandidateConfig(attn_impl="fused") therefore needs an engine
            # built with attn_impl="fused" to actually engage the kernel.
            self.total_len = _round_up(self.total_len, 128)

    def _resolve_chunk(self, padded_len: int) -> Optional[int]:
        if self.prefill_chunk == "auto":
            # Round 5: the flash prefill kernel removed the O(P²) transient
            # that made chunking win past 4k (8k: full+flash 763 ms vs
            # chunked 1915 — docs/RESULTS.md TTFT table), and the kernel
            # engages automatically for supported geometries — so "auto"
            # now stays on the one-dispatch full prefill until far past any
            # measured crossover.  Chunking remains for explicit settings
            # (peak-memory control at extreme lengths).
            if padded_len <= 16384:
                return None
            for c in (512, 256, 128):
                if padded_len % c == 0:
                    return c
            return None
        return self.prefill_chunk

    def _pad_prompt(self, input_ids: np.ndarray) -> tuple[jax.Array, int, int]:
        input_ids = np.asarray(input_ids)
        if input_ids.ndim == 1:
            input_ids = input_ids[None, :]
        prompt_len = int(input_ids.shape[1])
        if prompt_len > self.prompt_cap:
            raise ValueError(f"prompt_len {prompt_len} exceeds prompt_cap {self.prompt_cap}")
        P = min(self.prompt_cap, _round_up(max(prompt_len, 1), self.prompt_bucket))
        padded = np.zeros((1, P), np.int32)
        padded[0, :prompt_len] = input_ids[0]
        return jnp.asarray(padded), prompt_len, P

    def _trim(self, output_ids: np.ndarray, prompt_len: int) -> np.ndarray:
        """Reference post-processing (benchmark.py:196-202): cut at
        max_length, strip mask tokens, truncate at first stop token.  Mask
        stripping applies to the GENERATED region only — a prompt may
        legitimately contain the mask token id."""
        max_length = prompt_len + self.max_new_tokens
        seq = output_ids[0, :max_length]
        gen = seq[prompt_len:]
        gen = gen[gen != self.dcfg.mask_token_id]
        if self.stop_token_ids:
            hits = np.nonzero(np.isin(gen, list(self.stop_token_ids)))[0]
            if hits.size > 0:
                gen = gen[: hits[0] + 1]
        return np.concatenate([seq[:prompt_len], gen])[None, :]

    @staticmethod
    def _filters(top_k: int, top_p: float) -> Optional[SamplingFilters]:
        """Host-side: None when both filters are no-ops (keeps the unfiltered
        executables for the common greedy/temperature-only path)."""
        if top_k <= 0 and top_p >= 1.0:
            return None
        return SamplingFilters(jnp.int32(top_k), jnp.float32(top_p))

    def generate(
        self,
        input_ids: np.ndarray,
        temperature: float = 0.0,
        seed: int = 0,
        forced_acc: Optional[np.ndarray] = None,
        draft_steps: int = 1,
        top_k: int = 0,
        top_p: float = 1.0,
    ) -> GenerationResult:
        if top_k > self.topk_pool:
            raise ValueError(
                f"top_k={top_k} exceeds the engine's exact pool "
                f"(topk_pool={self.topk_pool}); build the engine with a "
                f"wider topk_pool instead of silently clamping"
            )
        ids, prompt_len, padded_len = self._pad_prompt(input_ids)
        key = jax.random.PRNGKey(seed)
        temp = jnp.float32(temperature)
        plen = jnp.int32(prompt_len)
        max_length = jnp.int32(prompt_len + self.max_new_tokens)
        filters = self._filters(top_k, top_p)

        t0 = time.perf_counter()
        state = _prefill(
            self.t_params, self.d_params, ids, plen, temp, key,
            tcfg=self.tcfg, dcfg=self.dcfg, total_len=self.total_len,
            max_cycles=self.max_new_tokens, kv_quant=self.kv_quant,
            prefill_chunk=self._resolve_chunk(padded_len), mesh=self.mesh,
            seq_axis=self.seq_axis, attn_impl=self.attn_impl, filters=filters,
            topk_pool=self.topk_pool,
        )
        state.output_ids.block_until_ready()
        ttft = time.perf_counter() - t0

        if forced_acc is not None:
            fa = np.full((self.max_new_tokens,), -1, np.int32)
            fa[: len(forced_acc)] = np.asarray(forced_acc, np.int32)[: self.max_new_tokens]
            forced_acc = jnp.asarray(fa)

        t1 = time.perf_counter()
        state = _decode(
            self.t_params, self.d_params, state, max_length, temp,
            tcfg=self.tcfg, dcfg=self.dcfg, block_size=self.block_size,
            stop_token_ids=self.stop_token_ids, max_cycles=self.max_new_tokens,
            forced_acc=forced_acc, draft_steps=draft_steps, mesh=self.mesh,
            attn_impl=self.attn_impl, filters=filters,
            topk_pool=self.topk_pool,
        )
        state.output_ids.block_until_ready()
        decode_wall = time.perf_counter() - t1

        out = np.asarray(state.output_ids)
        n_cycles = int(state.cycle_idx)
        acc = np.asarray(state.acc_trace)[:n_cycles].tolist()
        seq = self._trim(out, prompt_len)
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

    def ar_generate(
        self,
        input_ids: np.ndarray,
        temperature: float = 0.0,
        seed: int = 0,
    ) -> GenerationResult:
        ids, prompt_len, padded_len = self._pad_prompt(input_ids)
        key = jax.random.PRNGKey(seed)
        temp = jnp.float32(temperature)
        plen = jnp.int32(prompt_len)
        max_length = jnp.int32(prompt_len + self.max_new_tokens)

        t0 = time.perf_counter()
        state = _ar_prefill(
            self.t_params, ids, plen, temp, key,
            tcfg=self.tcfg, total_len=self.total_len,
            mask_token_id=self.dcfg.mask_token_id, kv_quant=self.kv_quant,
            prefill_chunk=self._resolve_chunk(padded_len), mesh=self.mesh,
            seq_axis=self.seq_axis, attn_impl=self.attn_impl,
        )
        state.output_ids.block_until_ready()
        ttft = time.perf_counter() - t0

        t1 = time.perf_counter()
        state = _ar_decode(
            self.t_params, state, max_length, temp,
            tcfg=self.tcfg, stop_token_ids=self.stop_token_ids, mesh=self.mesh,
            attn_impl=self.attn_impl,
        )
        state.output_ids.block_until_ready()
        decode_wall = time.perf_counter() - t1

        out = np.asarray(state.output_ids)
        seq = self._trim(out, prompt_len)
        num_out = int(seq.shape[1] - prompt_len)
        return GenerationResult(
            output_ids=seq,
            num_input_tokens=prompt_len,
            num_output_tokens=num_out,
            time_to_first_token=ttft,
            time_per_output_token=decode_wall / max(num_out, 1),
            acceptance_lengths=[1] * num_out,
            decode_wall_s=decode_wall,
        )
