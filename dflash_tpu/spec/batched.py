"""Batched (multi-request) speculative decoding via ``vmap`` over the
single-request engine, sharded dp (requests) x tp (model) on a device mesh.

Each request carries its own frontier, KV caches and acceptance state — the
heterogeneous-tau commit problem (SURVEY §7 hard part 5) is solved by lifting
the per-request cycle through ``vmap``: a batched ``lax.while_loop`` keeps
stepping until every lane's frontier reaches its own ``max_length`` (or EOS),
freezing finished lanes.  This replaces the reference's harness-level
batching, which decodes prompts *sequentially* inside each batch
(benchmark_batched.py:214 — it never batches the forward pass).

Shardings: params tp-sharded (parallel.mesh), per-request state dp-sharded
on the leading request axis; GSPMD then emits all collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from dflash_tpu.core.config import DraftConfig, ModelConfig
from dflash_tpu.spec.engine import LoopState, _cycle, _decode_impl, _prefill_impl


def batched_prefill(
    t_params,
    d_params,
    input_ids: jax.Array,  # [R, 1, P]
    prompt_lens: jax.Array,  # [R]
    temperature: jax.Array,
    keys: jax.Array,  # [R, 2] PRNG keys
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    total_len: int,
    max_cycles: int,
) -> LoopState:
    """Per-request prefill; returns a LoopState with leading request axis."""
    f = partial(
        _prefill_impl, tcfg=tcfg, dcfg=dcfg, total_len=total_len, max_cycles=max_cycles
    )
    return jax.vmap(f, in_axes=(None, None, 0, 0, None, 0))(
        t_params, d_params, input_ids, prompt_lens, temperature, keys
    )


def batched_decode(
    t_params,
    d_params,
    state: LoopState,  # leading request axis on every leaf
    max_lengths: jax.Array,  # [R]
    temperature: jax.Array,
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    block_size: int,
    stop_token_ids: Tuple[int, ...],
    max_cycles: int,
    forced_acc=None,  # optional [R, max_cycles] per-lane acceptance override
) -> LoopState:
    def f(tp, dp, st, ml, t, fa):
        return _decode_impl(
            tp, dp, st, ml, t,
            tcfg=tcfg, dcfg=dcfg, block_size=block_size,
            stop_token_ids=stop_token_ids, max_cycles=max_cycles,
            forced_acc=fa,
        )

    fa_axis = None if forced_acc is None else 0
    return jax.vmap(f, in_axes=(None, None, 0, 0, None, fa_axis))(
        t_params, d_params, state, max_lengths, temperature, forced_acc
    )


def batched_cycle(
    state: LoopState,
    t_params,
    d_params,
    temperature: jax.Array,
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    block_size: int,
    stop_token_ids: Tuple[int, ...],
) -> LoopState:
    """One draft->verify->accept step for every active request (the unit the
    continuous-batching scheduler drives)."""
    f = partial(
        _cycle,
        tcfg=tcfg,
        dcfg=dcfg,
        block_size=block_size,
        stop_token_ids=stop_token_ids,
    )
    return jax.vmap(f, in_axes=(0, None, None, None))(
        state, t_params, d_params, temperature
    )


jit_batched_prefill = jax.jit(
    batched_prefill, static_argnames=("tcfg", "dcfg", "total_len", "max_cycles")
)
jit_batched_decode = jax.jit(
    batched_decode,
    static_argnames=("tcfg", "dcfg", "block_size", "stop_token_ids", "max_cycles"),
)
jit_batched_cycle = jax.jit(
    batched_cycle, static_argnames=("tcfg", "dcfg", "block_size", "stop_token_ids")
)
