"""Frontier-bounded flash attention for the speculative verify pass.

The XLA-path attention (ops/attention.py) attends over the whole preallocated
cache buffer with masking — it reads all T rows every cycle even when only
``start + B`` are valid.  This Pallas kernel streams contiguous [CK, n_kv, d]
K/V chunks from HBM with double-buffered DMA and STOPS at the frontier, so
per-cycle attention traffic is O(start + B) instead of O(T) — the difference
at long context (T = 16k with start = 2k reads 8x less).

One program processes every kv head (batched MXU dots over the head axis);
queries for the whole block (g*B rows per head) stay resident in VMEM with a
running (flash) fp32 softmax.

Semantics match ``gqa_attention`` with the verify mask (key_pos <= q_pos):
the numerics tests pin the two together (interpret mode + TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(
    start_ref,  # SMEM [1] int32 — frontier
    q_ref,  # VMEM [n_kv, g*B, d]
    k_hbm,  # ANY  [T, n_kv, d]
    v_hbm,  # ANY  [T, n_kv, d]
    o_ref,  # VMEM [n_kv, g*B, d] f32
    k_buf,  # VMEM scratch [2, CK, n_kv, d]
    v_buf,  # VMEM scratch [2, CK, n_kv, d]
    acc_ref,  # VMEM scratch [n_kv, g*B, d] f32
    m_ref,  # VMEM scratch [n_kv, g*B, 128] f32
    l_ref,  # VMEM scratch [n_kv, g*B, 128] f32
    sems,  # DMA semaphores [2, 2]
    *,
    B: int,
    CK: int,
    scale: float,
):
    start = start_ref[0]
    limit = start + B  # rows [0, limit) are valid keys
    n_chunks = (limit + CK - 1) // CK
    n_kv, GB, d = q_ref.shape

    def k_dma(slot, c):
        return pltpu.make_async_copy(
            k_hbm.at[pl.ds(c * CK, CK)], k_buf.at[slot], sems.at[slot, 0]
        )

    def v_dma(slot, c):
        return pltpu.make_async_copy(
            v_hbm.at[pl.ds(c * CK, CK)], v_buf.at[slot], sems.at[slot, 1]
        )

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, _NEG)
    l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[:].astype(jnp.float32)  # [n_kv, GB, d]
    # q row r of any head corresponds to block offset r % B -> pos start + r%B.
    row_block = jax.lax.broadcasted_iota(jnp.int32, (n_kv, GB, CK), 1) % B
    q_pos = start + row_block

    def body(c, _):
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            k_dma((c + 1) % 2, c + 1).start()
            v_dma((c + 1) % 2, c + 1).start()

        k_dma(slot, c).wait()
        v_dma(slot, c).wait()

        # Transpose chunks to head-major [n_kv, CK, d] in VMEM: Mosaic wants
        # matching leading batch dims on both matmul operands.
        k = jnp.moveaxis(k_buf[slot], 0, 1).astype(jnp.float32)  # [n_kv, CK, d]
        v = jnp.moveaxis(v_buf[slot], 0, 1).astype(jnp.float32)
        # [n_kv, GB, CK] — contract d, batch over the kv-head axis.
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        key_pos = c * CK + jax.lax.broadcasted_iota(jnp.int32, (n_kv, GB, CK), 2)
        s = jnp.where(key_pos <= q_pos, s, _NEG)

        m_prev = m_ref[:, :, :1]  # [n_kv, GB, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=2, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    o_ref[:] = acc_ref[:] / jnp.maximum(l_ref[:, :, :1], 1e-30)


def _call_kernel(q_heads, k_cache, v_cache, start, *, B, CK, scale, interpret=False):
    n_kv, GB, d = q_heads.shape
    return pl.pallas_call(
        functools.partial(_kernel, B=B, CK=CK, scale=scale),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_kv, GB, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, CK, n_kv, d), k_cache.dtype),
            pltpu.VMEM((2, CK, n_kv, d), v_cache.dtype),
            pltpu.VMEM((n_kv, GB, d), jnp.float32),
            pltpu.VMEM((n_kv, GB, 128), jnp.float32),
            pltpu.VMEM((n_kv, GB, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(start[None].astype(jnp.int32) if start.ndim == 0 else start, q_heads, k_cache, v_cache)


@functools.partial(jax.jit, static_argnames=("block", "ck", "interpret"))
def verify_attention(
    q: jax.Array,  # [1, B, nh, d]
    k_cache: jax.Array,  # [1, T, n_kv, d]
    v_cache: jax.Array,
    start: jax.Array,  # [] int32 frontier
    block: int,
    ck: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Returns [1, B, nh*d] — bounded-read causal verify attention."""
    _, B, nh, d = q.shape
    T = k_cache.shape[1]
    n_kv = k_cache.shape[2]
    g = nh // n_kv
    if T % ck:
        ck = next((c for c in (512, 256, 128) if T % c == 0), None)
        if ck is None:
            raise ValueError(f"cache len {T} must be a multiple of 128")
    # Mosaic compiles only for TPU; everywhere else (CPU tests) interpret.
    interpret = interpret or jax.devices()[0].platform != "tpu"
    scale = d ** -0.5

    # [B, nh, d] -> [n_kv, g*B, d] with row r = g_idx * B + b_idx
    qh = q[0].reshape(B, n_kv, g, d)
    qh = jnp.transpose(qh, (1, 2, 0, 3)).reshape(n_kv, g * B, d)

    out = _call_kernel(
        qh, k_cache[0], v_cache[0], start, B=block, CK=ck, scale=scale,
        interpret=interpret,
    )
    # [n_kv, g*B, d] -> [1, B, nh*d]
    out = out.reshape(n_kv, g, B, d)
    out = jnp.transpose(out, (2, 0, 1, 3)).reshape(1, B, nh * d)
    return out.astype(q.dtype)
