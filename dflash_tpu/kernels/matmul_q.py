"""Pallas int8 weight-only dequant-matmul for decode-shaped GEMMs.

Decode matmuls are skinny — S in [8, 64] activation rows against [K, N]
weights — and entirely HBM-bandwidth-bound: the whole weight matrix streams
through VMEM once per step.  Storing weights int8 with per-output-channel
fp32 scales halves the bytes vs bf16; the kernel dequantizes tiles in VMEM
(int8 -> bf16 on the VPU) and feeds the MXU, applying the channel scales once
on the final accumulator.

Grid: (N/bn, K/bk) with K innermost so the [S, bn] fp32 accumulator block
stays resident in VMEM across the K sweep (initialized at k==0, scaled and
cast at the last k step).  Replaces the cuBLAS bf16 matmuls the reference
leans on (SURVEY §2.2) for the quantized serving path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, out_ref):
    # One grid step = one [K, bn] weight stripe: full-K dot, scale, write.
    # The activation block [S, K] stays resident across the whole grid; the
    # weight stripes double-buffer through VMEM (multi-MB DMAs — bandwidth-
    # friendly, unlike small square tiles).
    x = x_ref[:]  # [S, K] bf16
    w = w_ref[:].astype(x.dtype)  # [K, bn] int8 -> bf16 on the fly
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    out_ref[:] = (acc * scale_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn",))
def matmul_int8(
    x: jax.Array,  # [S, K] bf16/f32
    w_q: jax.Array,  # [K, N] int8
    scale: jax.Array,  # [1, N] f32
    bn: int = 1024,
) -> jax.Array:
    """Returns x @ (w_q * scale) as f32, shape [S, N]."""
    S, K = x.shape
    K2, N = w_q.shape
    assert K == K2, (K, K2)
    bn = min(bn, N)
    while N % bn:
        bn //= 2
    # Pad S up to the bf16 sublane tile.
    S_pad = max(16, ((S + 15) // 16) * 16)
    if S_pad != S:
        x = jnp.pad(x, ((0, S_pad - S), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((S_pad, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S_pad, bn), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S_pad, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * S_pad * K * N,
            bytes_accessed=K * N + S_pad * K * 2 + S_pad * N * 4,
            transcendentals=0,
        ),
    )(x.astype(jnp.bfloat16), w_q, scale)
    return out[:S]
