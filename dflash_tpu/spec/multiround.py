"""Multi-round EXACT speculative sampling (temperature > 0 correctness).

TPU-native port of reference benchmark_multiround_spec.py:71-256: per decode
step the target's distribution p is computed once; proposal rounds with
decreasing draft block sizes each sample a token from the draft's
position-1 distribution q_r and accept with probability min(1, p~/q_r)
against the current residual p~; on rejection the residual becomes
normalize(max(0, p~ - q_r)); if every round rejects, the final token is
sampled from the residual.  Exactly one token commits per step, and the
marginal distribution of that token is provably the target's p — this is the
algorithm-study tool for exact sampled speculation (ideas.md:75-85: slower
than vanilla; kept for capability parity).

The per-step target forward and the per-round draft proposal are jitted
(one executable per configured round block size); the accept/residual
arithmetic runs on-device inside the step function.
"""

from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dflash_tpu.cache.kv import KVCache, init_kv_cache
from dflash_tpu.core.config import DraftConfig, ModelConfig
from dflash_tpu.models import dflash_draft, qwen3
from dflash_tpu.spec.engine import SpecEngine


def _softmax_probs(logits: jax.Array, temperature: jax.Array) -> jax.Array:
    t = jnp.maximum(temperature, 1e-5)
    return jax.nn.softmax(logits.astype(jnp.float32) / t, axis=-1)


@partial(jax.jit, static_argnames=("tcfg", "dcfg"))
def _ar_step_with_taps(
    t_params, output_ids, pos, t_kv, temperature,
    *, tcfg: ModelConfig, dcfg: DraftConfig,
):
    """One target forward on the token at ``pos``; returns (probs, taps, kv)."""
    T = output_ids.shape[1]
    tok = jax.lax.dynamic_slice(output_ids, (0, pos), (1, 1))
    positions = pos[None, None] * jnp.ones((1, 1), jnp.int32)
    mask = qwen3.causal_mask(positions[0], T)
    res = qwen3.forward(
        t_params, tcfg, qwen3.embed(t_params, tok), positions, t_kv, pos, mask,
        tap_ids=dcfg.target_layer_ids,
    )
    probs = _softmax_probs(qwen3.lm_head(t_params, res.hidden)[:, -1], temperature)
    return probs, res.taps, res.kv


@partial(jax.jit, static_argnames=("tcfg", "dcfg", "round_bs"))
def _round_proposal(
    t_params, d_params, taps, last_token, pos, temperature,
    *, tcfg: ModelConfig, dcfg: DraftConfig, round_bs: int,
):
    """Draft proposal distribution for one round (reference
    proposal_distribution_from_round, :72-116): cache-less draft forward with
    a 1-row context (the last step's tap features), block of ``round_bs``
    mask tokens led by the last committed token; position-1 logits."""
    m = dcfg.model
    block = jnp.full((1, round_bs), dcfg.mask_token_id, jnp.int32)
    block = block.at[0, 0].set(last_token)
    ctx_cache = init_kv_cache(m, 1, 1, taps.dtype)
    # ctx row at pos-1 while the taps come from the forward AT pos: an
    # off-by-one the reference itself has (pos_start = current_pos - ctx_len,
    # benchmark_multiround_spec.py:98-104) — kept verbatim for parity; the
    # exactness guarantee holds for ANY proposal distribution regardless.
    ctx_positions = (pos - 1)[None, None] * jnp.ones((1, 1), jnp.int32)
    ctx_cache = dflash_draft.append_ctx(
        d_params, dcfg, ctx_cache, taps, ctx_positions, jnp.zeros((), jnp.int32)
    )
    block_positions = pos + jnp.arange(round_bs, dtype=jnp.int32)[None, :]
    hidden = dflash_draft.forward(
        d_params, dcfg, qwen3.embed(t_params, block), block_positions,
        ctx_cache, jnp.int32(1),
    )
    logits = qwen3.lm_head(t_params, hidden[:, 1:2])[:, 0]
    return _softmax_probs(logits, temperature)


class RoundTraceRow(NamedTuple):
    step_idx: int
    round_idx: int
    configured_block_size: int
    token_id: int
    proposal_prob: float
    residual_prob: float
    accept_prob: float
    accepted: bool


def multiround_generate(
    engine: SpecEngine,
    input_ids: np.ndarray,
    round_block_sizes: Tuple[int, ...] = (16, 8, 4),
    temperature: float = 1.0,
    seed: int = 0,
    max_new_tokens: int | None = None,
    collect_trace: bool = False,
):
    """Returns (GenerationResult-like namespace, accepted_rounds, round_trace)."""
    from dflash_tpu.spec.engine import GenerationResult, _ar_prefill

    tcfg, dcfg = engine.tcfg, engine.dcfg
    max_new = max_new_tokens or engine.max_new_tokens
    ids, prompt_len, _ = engine._pad_prompt(input_ids)
    key = jax.random.PRNGKey(seed)
    temp = jnp.float32(temperature)
    stop_ids = set(engine.stop_token_ids)

    t0 = time.perf_counter()
    st = _ar_prefill(
        engine.t_params, ids, jnp.int32(prompt_len), temp, key,
        tcfg=tcfg, total_len=engine.total_len, mask_token_id=dcfg.mask_token_id,
        kv_quant=engine.kv_quant,
    )
    st.output_ids.block_until_ready()
    ttft = time.perf_counter() - t0

    output_ids = st.output_ids
    t_kv = st.t_kv
    key = st.key
    pos = prompt_len  # position of the last committed token
    max_length = prompt_len + max_new
    first_token = int(np.asarray(output_ids)[0, prompt_len])
    stop_hit = first_token in stop_ids

    accepted_rounds: list[int] = []
    trace: list[dict] = []
    decode_t0 = time.perf_counter()

    while (pos + 1) < max_length and not stop_hit:
        probs, taps, t_kv = _ar_step_with_taps(
            engine.t_params, output_ids, jnp.int32(pos), t_kv, temp,
            tcfg=tcfg, dcfg=dcfg,
        )
        residual = probs  # [1, V]
        last_token = int(np.asarray(output_ids)[0, pos])
        step_idx = pos - prompt_len + 1
        chosen = None
        accepted_round = len(round_block_sizes) + 1

        for round_idx, bs in enumerate(round_block_sizes, start=1):
            if bs == 1:
                proposal = probs
            else:
                proposal = _round_proposal(
                    engine.t_params, engine.d_params, taps,
                    jnp.int32(last_token), jnp.int32(pos), temp,
                    tcfg=tcfg, dcfg=dcfg, round_bs=bs,
                )
            key, k_tok, k_u = jax.random.split(key, 3)
            tok = int(jax.random.categorical(k_tok, jnp.log(jnp.maximum(proposal[0], 1e-30))))
            q_t = float(proposal[0, tok])
            p_t = float(residual[0, tok])
            accept_prob = min(1.0, p_t / max(q_t, 1e-12))
            u = float(jax.random.uniform(k_u))
            accepted = u < accept_prob
            if collect_trace:
                trace.append(
                    {
                        "step_idx": step_idx, "round_idx": round_idx,
                        "configured_block_size": bs, "token_id": tok,
                        "proposal_prob": q_t, "residual_prob": p_t,
                        "accept_prob": accept_prob, "u": u, "accepted": accepted,
                    }
                )
            if accepted:
                chosen = tok
                accepted_round = round_idx
                break
            residual = jnp.clip(residual - proposal, 0.0)
            mass = float(residual.sum())
            residual = probs if mass <= 1e-12 else residual / mass

        if chosen is None:
            key, k_tok = jax.random.split(key)
            chosen = int(
                jax.random.categorical(k_tok, jnp.log(jnp.maximum(residual[0], 1e-30)))
            )

        pos += 1
        output_ids = output_ids.at[0, pos].set(chosen)
        accepted_rounds.append(accepted_round)
        if chosen in stop_ids:
            stop_hit = True

    decode_wall = time.perf_counter() - decode_t0
    out = np.asarray(output_ids)[:, : pos + 1]
    seq = out[:, out[0] != dcfg.mask_token_id]
    num_out = int(seq.shape[1] - prompt_len)
    result = GenerationResult(
        output_ids=seq,
        num_input_tokens=prompt_len,
        num_output_tokens=num_out,
        time_to_first_token=ttft,
        time_per_output_token=decode_wall / max(num_out, 1),
        acceptance_lengths=[1] * num_out,
        decode_wall_s=decode_wall,
    )
    return result, accepted_rounds, trace
