"""Suffix-seeding experiment: recycle the rejected suffix of the previous
block as the initialization ("seed") of masked positions in the next block.

TPU-native port of reference benchmark_suffix_seed.py:28-157.  Seeding only
changes the draft's *noise input* (the denoising initialization) — the draft
still overwrites block positions 1..B-1 with its own samples, so acceptance
semantics are unchanged.  The reference measured this to hurt tau
(results.md:138-150: dense tau 2.52 vs none 7.92); it is kept for capability
parity and ablation studies.

Modes (reference pick_seed_positions): ``dense`` seeds every position 1..B-1
with the recycled tokens in order; ``sparse`` seeds positions 2, 4, 6, ...
"""

from __future__ import annotations

import time
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dflash_tpu.core.config import DraftConfig, ModelConfig
from dflash_tpu.models import dflash_draft, qwen3
from dflash_tpu.spec.engine import (
    GenerationResult,
    LoopState,
    SpecEngine,
    _prefill,
    _verify_stage,
)


class SeedState(NamedTuple):
    inner: LoopState
    recycled: jax.Array  # [1, B] rejected-suffix tokens from the last cycle
    recycled_count: jax.Array  # [] int32


def seed_positions_mask(block_size: int, mode: str) -> np.ndarray:
    """Boolean mask over block positions that may be seeded
    (reference pick_seed_positions, benchmark_suffix_seed.py:28-36)."""
    m = np.zeros((block_size,), bool)
    if block_size <= 1 or mode == "none":
        return m
    if mode == "dense":
        m[1:] = True
    else:  # sparse
        m[2::2] = True
    return m


def _seeded_cycle(
    state: SeedState,
    t_params,
    d_params,
    temperature: jax.Array,
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    block_size: int,
    stop_token_ids: Tuple[int, ...],
    mode: str,
    max_seed_tokens: int,
) -> SeedState:
    B = block_size
    s = state.inner
    T = s.output_ids.shape[1]
    start = s.start

    block = jax.lax.dynamic_slice(s.output_ids, (0, start), (1, B))
    block_positions = start + jnp.arange(B, dtype=jnp.int32)[None, :]

    # -- seed the noise block from the recycled suffix ----------------------
    pos_mask = jnp.asarray(seed_positions_mask(B, mode))
    if max_seed_tokens >= 0:
        nth = jnp.cumsum(pos_mask.astype(jnp.int32)) - 1
        pos_mask = pos_mask & (nth < max_seed_tokens)
    # The i-th seeded position takes recycled[i]; only the first
    # `recycled_count` recycled tokens are real.
    seed_idx = jnp.cumsum(pos_mask.astype(jnp.int32)) - 1  # [B]
    usable = pos_mask & (seed_idx < state.recycled_count)
    seeded = jnp.where(
        usable[None, :], jnp.take(state.recycled[0], jnp.clip(seed_idx, 0, B - 1))[None, :], block
    )

    # -- draft over the seeded noise block ----------------------------------
    w0 = jnp.clip(start - B, 0, T - B)
    feats_w = jax.lax.dynamic_slice(s.features, (0, w0, 0), (1, B, s.features.shape[2]))
    w_positions = w0 + jnp.arange(B, dtype=jnp.int32)[None, :]
    d_kv = dflash_draft.append_ctx(d_params, dcfg, s.d_kv, feats_w, w_positions, w0)
    noise_embeds = qwen3.embed(t_params, seeded)
    d_hidden = dflash_draft.forward(d_params, dcfg, noise_embeds, block_positions, d_kv, start)
    draft_logits = qwen3.lm_head(t_params, d_hidden[:, 1:])
    draft_tokens = jnp.argmax(draft_logits, axis=-1).astype(jnp.int32)
    block = jnp.concatenate([block[:, :1], draft_tokens], axis=1)

    # -- verify + accept: the engine's stage (no local copy) ----------------
    inner = _verify_stage(
        s, d_kv, block, t_params, temperature,
        tcfg=tcfg, dcfg=dcfg, block_size=B, stop_token_ids=stop_token_ids,
    )
    tau = inner.start - start

    # -- recycle the rejected suffix (reference :151-157) -------------------
    # recycled = block[tau:B] rolled to the front; count = B - tau (0 if all accepted)
    rolled = jnp.roll(block[0], -tau)  # first B-tau entries are the suffix
    new_count = jnp.where(tau < B, B - tau, 0)
    return SeedState(inner=inner, recycled=rolled[None, :], recycled_count=new_count)


from functools import partial


@partial(
    jax.jit,
    static_argnames=(
        "tcfg", "dcfg", "block_size", "stop_token_ids", "max_cycles", "mode",
        "max_seed_tokens",
    ),
)
def _seeded_decode(
    t_params, d_params, state: SeedState, max_length, temperature,
    *, tcfg, dcfg, block_size, stop_token_ids, max_cycles, mode, max_seed_tokens,
) -> SeedState:
    def cond(st: SeedState):
        return (
            (st.inner.start < max_length)
            & (~st.inner.done)
            & (st.inner.cycle_idx < max_cycles)
        )

    def body(st: SeedState):
        return _seeded_cycle(
            st, t_params, d_params, temperature,
            tcfg=tcfg, dcfg=dcfg, block_size=block_size,
            stop_token_ids=stop_token_ids, mode=mode, max_seed_tokens=max_seed_tokens,
        )

    return jax.lax.while_loop(cond, body, state)


def suffix_seed_generate(
    engine: SpecEngine,
    input_ids: np.ndarray,
    mode: str = "none",
    max_seed_tokens: int = -1,
    temperature: float = 0.0,
    seed: int = 0,
) -> GenerationResult:
    if mode not in ("none", "dense", "sparse"):
        raise ValueError(f"unknown suffix seed mode {mode!r}")
    ids, prompt_len, _ = engine._pad_prompt(input_ids)
    key = jax.random.PRNGKey(seed)
    temp = jnp.float32(temperature)
    max_length = jnp.int32(prompt_len + engine.max_new_tokens)

    t0 = time.perf_counter()
    inner = _prefill(
        engine.t_params, engine.d_params, ids, jnp.int32(prompt_len), temp, key,
        tcfg=engine.tcfg, dcfg=engine.dcfg, total_len=engine.total_len,
        max_cycles=engine.max_new_tokens, kv_quant=engine.kv_quant,
    )
    inner.output_ids.block_until_ready()
    ttft = time.perf_counter() - t0

    state = SeedState(
        inner=inner,
        recycled=jnp.full((1, engine.block_size), engine.dcfg.mask_token_id, jnp.int32),
        recycled_count=jnp.zeros((), jnp.int32),
    )
    t1 = time.perf_counter()
    state = _seeded_decode(
        engine.t_params, engine.d_params, state, max_length, temp,
        tcfg=engine.tcfg, dcfg=engine.dcfg, block_size=engine.block_size,
        stop_token_ids=engine.stop_token_ids, max_cycles=engine.max_new_tokens,
        mode=mode, max_seed_tokens=max_seed_tokens,
    )
    state.inner.output_ids.block_until_ready()
    decode_wall = time.perf_counter() - t1

    out = np.asarray(state.inner.output_ids)
    n_cycles = int(state.inner.cycle_idx)
    acc = np.asarray(state.inner.acc_trace)[:n_cycles].tolist()
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
