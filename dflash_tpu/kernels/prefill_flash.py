"""Tiled causal flash attention for the PREFILL pass.

The cache-free prefill (models/qwen3.py::forward_prefill) computes plain
O(S²) attention through XLA, which materializes [nh, S, S] score transients
— the measured TTFT turns quadratic-bound past ~4k (docs/RESULTS.md TTFT
table: 8k full 2592 ms / chunked 1915 ms, vs a ~0.6-0.9 s compute floor).
Unlike the decode-shape kernels this round measured and rejected
(verify_fused.py: per-layer pallas boundaries cost more than VMEM
management saves at 16-58 query rows), prefill is exactly where a hand
kernel should win: thousands of query rows per dispatch, MXU-shaped tiles,
and score tiles that never need to exist in HBM.

One program per (lane, kv-head, q-tile, kv-tile), kv inner; the index map
clamps the kv-tile at the causal frontier of its q-tile so upper-triangle
tiles are neither fetched (Pallas skips repeated blocks) nor computed.
Numerics match ``gqa_attention`` with the causal mask (tests pin both).
Reference behavior being replaced: flash-attn for the target prefill
(reference benchmark.py:70-78 via Transformers' dispatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(
    q_ref,  # VMEM [1, 1, g, QT, d]
    k_ref,  # VMEM [1, 1, KT, d]
    v_ref,  # VMEM [1, 1, KT, d]
    o_ref,  # VMEM [1, 1, g, QT, d] (q dtype)
    acc_ref,  # VMEM [g*QT, d] f32
    m_ref,  # VMEM [g*QT, 128] f32
    l_ref,  # VMEM [g*QT, 128] f32
    *,
    QT: int,
    KT: int,
    scale: float,
):
    qt = pl.program_id(2)
    kt = pl.program_id(3)
    n_kt = pl.num_programs(3)
    max_kt = (qt * QT + QT - 1) // KT  # last kv tile any row of qt attends

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    g, _, d = q_ref.shape[2:]
    GQ = g * QT
    q = q_ref[0, 0].reshape(GQ, d)

    @pl.when(kt <= max_kt)
    def _():
        k = k_ref[0, 0]  # [KT, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [GQ, KT]
        # row r = g_idx * QT + i  ->  query position qt*QT + i
        q_pos = qt * QT + jax.lax.broadcasted_iota(jnp.int32, (GQ, KT), 0) % QT
        k_pos = kt * KT + jax.lax.broadcasted_iota(jnp.int32, (GQ, KT), 1)
        valid = k_pos <= q_pos
        s = jnp.where(valid, s, _NEG)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, 0]
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(kt == n_kt - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = out.reshape(g, QT, d).astype(o_ref.dtype)


def _flash_lanes(
    q,  # [L, n_kv, g, S, d]
    k,  # [L, n_kv, S, d]
    v,
    *,
    scale: float,
    interpret: bool,
):
    L, n_kv, g, S, d = q.shape
    QT = next(t for t in (512, 256, 128) if S % t == 0)
    KT = QT
    n_qt = S // QT
    n_kt = S // KT

    def k_idx(l, h, qt, kt):
        # clamp at the causal frontier: upper-triangle tiles repeat the last
        # valid block index, so Pallas never re-fetches them
        max_kt = (qt * QT + QT - 1) // KT
        return (l, h, jnp.minimum(kt, max_kt), 0)

    return pl.pallas_call(
        functools.partial(_kernel, QT=QT, KT=KT, scale=scale),
        grid=(L, n_kv, n_qt, n_kt),
        in_specs=[
            pl.BlockSpec((1, 1, g, QT, d), lambda l, h, qt, kt: (l, h, 0, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KT, d), k_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KT, d), k_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, g, QT, d), lambda l, h, qt, kt: (l, h, 0, qt, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((L, n_kv, g, S, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * QT, d), jnp.float32),
            pltpu.VMEM((g * QT, 128), jnp.float32),
            pltpu.VMEM((g * QT, 128), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


@functools.lru_cache(maxsize=None)
def _make_call(scale: float, interpret: bool):
    """custom_vmap: fold a vmapped lane axis (spec/batched.py batched_prefill)
    into the kernel's lane grid dimension."""

    @jax.custom_batching.custom_vmap
    def call(q, k, v):
        return _flash_lanes(
            q[None], k[None], v[None], scale=scale, interpret=interpret
        )[0]

    @call.def_vmap
    def _rule(axis_size, in_batched, q, k, v):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        qb, kb, vb = in_batched
        out = _flash_lanes(
            bc(q, qb), bc(k, kb), bc(v, vb), scale=scale, interpret=interpret
        )
        return out, True

    return call


def supported(S: int, d: int) -> bool:
    return d % 128 == 0 and S % 128 == 0


def flash_prefill_attention(
    q: jax.Array,  # [B, S, nh, d]
    k: jax.Array,  # [B, S, n_kv, d]
    v: jax.Array,
    scale: float,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Causal prefill attention, tiled flash.  Returns [B, S, nh*d].

    Falls back to the XLA path on unsupported shapes (tiny test models).
    Causality is positional (row i attends keys j <= i) — identical to
    forward_prefill's mask for its arange positions, including padded tail
    rows (they sit at the end, so no real row ever attends one)."""
    B, S, nh, d = q.shape
    n_kv = k.shape[2]
    g = nh // n_kv
    interpret = interpret or jax.default_backend() != "tpu"
    if not supported(S, d) or B != 1:
        from dflash_tpu.ops.attention import gqa_attention

        causal = (
            jnp.arange(S, dtype=jnp.int32)[:, None]
            >= jnp.arange(S, dtype=jnp.int32)[None, :]
        )
        return gqa_attention(q, k, v, causal, scale)

    # [S, nh, d] -> [n_kv, g, S, d]; [S, n_kv, d] -> [n_kv, S, d]
    qh = jnp.transpose(q[0].reshape(S, n_kv, g, d), (1, 2, 0, 3))
    kh = jnp.moveaxis(k[0], 1, 0)
    vh = jnp.moveaxis(v[0], 1, 0)
    out = _make_call(float(scale), bool(interpret))(qh, kh, vh)
    # [n_kv, g, S, d] -> [1, S, nh*d]
    out = jnp.transpose(out, (2, 0, 1, 3)).reshape(1, S, nh * d)
    return out.astype(q.dtype)
