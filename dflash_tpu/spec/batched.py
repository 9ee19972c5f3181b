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
from dflash_tpu.spec.engine import (
    LoopState,
    SamplingFilters,
    _cycle,
    _decode_impl,
    _prefill_impl,
)


# Per-leaf vmap axis for the request/lane dimension.  KV caches put the
# lane axis at position 1, BEHIND the layer axis: the per-layer scan inside
# the forward then consumes the stacked caches natively — with lanes leading,
# XLA transposes the whole multi-GB KV stack to layer-major and back every
# cycle (profiled at ~2.4 ms/cycle at 8 lanes, docs/RESULTS.md).
STATE_AXES = LoopState(
    output_ids=0, start=0, done=0, cycle_idx=0, acc_trace=0, key=0,
    t_kv=1, d_kv=1, features=0,
)


def state_shardings(mesh):
    """NamedShardings placing the lane axis of every LoopState leaf on dp."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def leaf(axis):
        def mk(x):
            spec = [None] * x.ndim
            spec[axis] = "dp"
            return NamedSharding(mesh, P(*spec))
        return mk

    def sub(tree, axis):
        return jax.tree.map(leaf(axis), tree)

    def apply(state: LoopState):
        return LoopState(
            output_ids=sub(state.output_ids, 0),
            start=sub(state.start, 0),
            done=sub(state.done, 0),
            cycle_idx=sub(state.cycle_idx, 0),
            acc_trace=sub(state.acc_trace, 0),
            key=sub(state.key, 0),
            t_kv=sub(state.t_kv, 1),
            d_kv=sub(state.d_kv, 1),
            features=sub(state.features, 0),
        )

    return apply


def shard_state(state: LoopState, mesh) -> LoopState:
    """dp-shard a batched LoopState's lane axis across the mesh."""
    return jax.tree.map(jax.device_put, state, state_shardings(mesh)(state))


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
    kv_quant: bool = False,
    filters: SamplingFilters | None = None,  # scalar leaves, shared by the group
    topk_pool: int = 64,
) -> LoopState:
    """Per-request prefill; returns a LoopState with the request axis per
    STATE_AXES (leading everywhere except the KV caches, where it sits
    behind the layer axis)."""
    f = partial(
        _prefill_impl, tcfg=tcfg, dcfg=dcfg, total_len=total_len,
        max_cycles=max_cycles, kv_quant=kv_quant, topk_pool=topk_pool,
    )
    return jax.vmap(
        lambda tp, dp, ids, pl, temp, k: f(tp, dp, ids, pl, temp, k, filters=filters),
        in_axes=(None, None, 0, 0, None, 0), out_axes=STATE_AXES,
    )(t_params, d_params, input_ids, prompt_lens, temperature, keys)


def batched_decode(
    t_params,
    d_params,
    state: LoopState,  # leading request axis on every leaf
    max_lengths: jax.Array,  # [R]
    temperature: jax.Array,  # scalar or [R] per-lane (reference per-request
    #   sampling_params, benchmark_sglang.py:107-222)
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    block_size: int,
    stop_token_ids: Tuple[int, ...],
    max_cycles: int,
    forced_acc=None,  # optional [R, max_cycles] per-lane acceptance override
    filters: SamplingFilters | None = None,  # optional [R]-leaf per-lane top-k/top-p
    topk_pool: int = 64,
) -> LoopState:
    # NOT vmap(_decode_impl): a vmapped while_loop freezes finished lanes by
    # selecting over EVERY carry each iteration — profiled at 2.3 GB of KV
    # read+write per cycle at 8 lanes (docs/RESULTS.md).  Instead the loop is
    # written at the batched level and the freeze select covers only the
    # small per-lane state; the KV caches / feature buffers of finished lanes
    # advance freely (their writes land at the frozen frontier, beyond the
    # committed region, and nobody reads a finished lane's cache again).
    R = max_lengths.shape[0]
    temps = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (R,))

    def cycle_one(st, temp, fa, flt):
        return _cycle(
            st, t_params, d_params, temp,
            tcfg=tcfg, dcfg=dcfg, block_size=block_size,
            stop_token_ids=stop_token_ids, forced_acc=fa, filters=flt,
            topk_pool=topk_pool,
        )

    fa_axis = None if forced_acc is None else 0
    vcycle = jax.vmap(
        cycle_one, in_axes=(STATE_AXES, 0, fa_axis, 0), out_axes=STATE_AXES
    )

    def lane_active(st):
        return (st.start < max_lengths) & (~st.done) & (st.cycle_idx < max_cycles)

    def cond(st):
        return jnp.any(lane_active(st))

    def body(st):
        new = vcycle(st, temps, forced_acc, filters)
        active = lane_active(st)

        def sel(old, new_):
            a = active.reshape((R,) + (1,) * (old.ndim - 1))
            return jnp.where(a, new_, old)

        return st._replace(
            output_ids=sel(st.output_ids, new.output_ids),
            start=jnp.where(active, new.start, st.start),
            done=jnp.where(active, new.done, st.done),
            cycle_idx=jnp.where(active, new.cycle_idx, st.cycle_idx),
            acc_trace=sel(st.acc_trace, new.acc_trace),
            key=sel(st.key, new.key),
            t_kv=new.t_kv,
            d_kv=new.d_kv,
            features=new.features,
        )

    return jax.lax.while_loop(cond, body, state)


def batched_cycles(
    state: LoopState,
    t_params,
    d_params,
    temperature: jax.Array,  # scalar or [R] per-lane
    max_lengths: jax.Array,  # [R] per-lane prompt_len + max_new_tokens
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    block_size: int,
    stop_token_ids: Tuple[int, ...],
    n_steps: int = 1,
    forced_acc=None,  # optional [max_cycles] shared acceptance override
    filters: SamplingFilters | None = None,  # optional [R]-leaf per-lane top-k/top-p
    topk_pool: int = 64,
) -> LoopState:
    """``n_steps`` speculative cycles for every active lane in ONE dispatch.

    Multi-step scheduling for the continuous-batching engine: the host
    syncs (retire/admit) only every ``n_steps`` cycles.  Through a
    high-latency device tunnel the per-dispatch cost dominates a single
    ~10 ms cycle, so batching cycles per dispatch is the difference between
    13 and >100 tok/s at concurrency 1 (docs/RESULTS.md).  Lanes that finish
    mid-window freeze their visible state exactly as in batched_decode;
    their caches advance harmlessly.
    """
    R = max_lengths.shape[0]
    temps = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (R,))
    f = partial(
        _cycle, tcfg=tcfg, dcfg=dcfg, block_size=block_size,
        stop_token_ids=stop_token_ids, forced_acc=forced_acc,
        topk_pool=topk_pool,
    )
    vcycle = jax.vmap(
        lambda st, temp, flt: f(st, t_params, d_params, temp, filters=flt),
        in_axes=(STATE_AXES, 0, 0), out_axes=STATE_AXES,
    )

    def body(_, st):
        new = vcycle(st, temps, filters)
        active = (st.start < max_lengths) & (~st.done)

        def sel(old, new_):
            a = active.reshape((R,) + (1,) * (old.ndim - 1))
            return jnp.where(a, new_, old)

        return st._replace(
            output_ids=sel(st.output_ids, new.output_ids),
            start=jnp.where(active, new.start, st.start),
            done=jnp.where(active, new.done, st.done),
            cycle_idx=jnp.where(active, new.cycle_idx, st.cycle_idx),
            acc_trace=sel(st.acc_trace, new.acc_trace),
            key=sel(st.key, new.key),
            t_kv=new.t_kv,
            d_kv=new.d_kv,
            features=new.features,
        )

    return jax.lax.fori_loop(0, n_steps, body, state)


def batched_cycle(
    state: LoopState,
    t_params,
    d_params,
    temperature: jax.Array,  # scalar or [R] per-lane
    *,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    block_size: int,
    stop_token_ids: Tuple[int, ...],
) -> LoopState:
    """One draft->verify->accept step for every active request (the unit the
    continuous-batching scheduler drives)."""
    R = state.start.shape[0]
    temps = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (R,))
    f = partial(
        _cycle,
        tcfg=tcfg,
        dcfg=dcfg,
        block_size=block_size,
        stop_token_ids=stop_token_ids,
    )
    return jax.vmap(f, in_axes=(STATE_AXES, None, None, 0), out_axes=STATE_AXES)(
        state, t_params, d_params, temps
    )


jit_batched_prefill = jax.jit(
    batched_prefill,
    static_argnames=(
        "tcfg", "dcfg", "total_len", "max_cycles", "kv_quant", "topk_pool",
    ),
)
jit_batched_decode = jax.jit(
    batched_decode,
    static_argnames=(
        "tcfg", "dcfg", "block_size", "stop_token_ids", "max_cycles",
        "topk_pool",
    ),
)
jit_batched_cycle = jax.jit(
    batched_cycle, static_argnames=("tcfg", "dcfg", "block_size", "stop_token_ids")
)
