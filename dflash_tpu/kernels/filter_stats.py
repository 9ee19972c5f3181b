"""Fused multi-threshold filter statistics for exact top-k/top-p sampling.

The exact sampler (ops/sampling.py) needs, per logits row: the logsumexp Z
and — for a handful of candidate thresholds — how many elements sit at-or-
above each threshold and how much softmax mass sits strictly above it.  As
XLA ops the [rows, T, V] broadcast compare streams the logits T times
(measured 4–5 ms at [256, 152k] × 16 thresholds on v5e); this kernel reads
the logits ONCE, keeping an online-softmax accumulator and T running
count/mass registers in VMEM (HBM-bound).

Thresholds are ORDERED FLOAT BITS (uint32, see sampling._float_bits_ordered)
so the refinement loop may probe arbitrary bit-space midpoints — including
bit patterns that aren't valid floats — while the comparison stays a total
order over the data.

Replaces the exact-sampling role of the reference serving stack's
flashinfer sampling kernels (SGLang sampling_params, reference
benchmark_sglang.py:42-47), TPU-native.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed output columns: [0:T] count_ge, [T:2T] count_gt, [2T:3T] sumexp_gt,
# then one 128-lane group holding (m, s, row_min, ...)
THR_CAP = 64
OUT_COLS = 3 * THR_CAP + 128

NEG_BIG = -3.0e38  # "max of nothing" sentinel (finite: keeps exp() defined)


def _ordered_bits(x: jax.Array) -> jax.Array:
    """float32 -> uint32 preserving total order (sampling._float_bits_ordered)."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(b < 0, ~b, b ^ jnp.int32(-(2 ** 31))).astype(jnp.uint32)


def _kernel(x_ref, thr_ref, out_ref, cge, cgt, sgt, ms, *, n_thr: int):
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        cge[:] = jnp.zeros_like(cge)
        cgt[:] = jnp.zeros_like(cgt)
        sgt[:] = jnp.zeros_like(sgt)
        ms[:] = jnp.full_like(ms, NEG_BIG)
        ms[:, 1:2] = jnp.zeros_like(ms[:, 1:2])  # running sumexp s = 0
        ms[:, 2:3] = jnp.full_like(ms[:, 2:3], -NEG_BIG)  # running min

    x = x_ref[:]  # [RB, VT] f32 (padding rows/cols hold NEG_BIG)
    u = _ordered_bits(x)
    m_old = ms[:, 0:1]
    m_new = jnp.maximum(m_old, jnp.max(x, axis=1, keepdims=True))
    rescale = jnp.exp(m_old - m_new)
    e = jnp.exp(x - m_new)
    ms[:, 0:1] = m_new
    ms[:, 1:2] = ms[:, 1:2] * rescale + jnp.sum(e, axis=1, keepdims=True)
    # row min over REAL values (padding is NEG_BIG; real logits are finite
    # and > NEG_BIG, so mask it out by treating NEG_BIG as +inf here)
    x_min = jnp.where(x <= NEG_BIG, -NEG_BIG, x)
    ms[:, 2:3] = jnp.minimum(ms[:, 2:3], jnp.min(x_min, axis=1, keepdims=True))
    for t in range(n_thr):
        th = thr_ref[:, t:t + 1]  # [RB, 1] uint32
        ge = u >= th
        gt = u > th
        cge[:, t:t + 1] += jnp.sum(ge, axis=1, keepdims=True).astype(jnp.float32)
        cgt[:, t:t + 1] += jnp.sum(gt, axis=1, keepdims=True).astype(jnp.float32)
        sgt[:, t:t + 1] = sgt[:, t:t + 1] * rescale + jnp.sum(
            jnp.where(gt, e, 0.0), axis=1, keepdims=True
        )

    @pl.when(j == nv - 1)
    def _finalize():
        out_ref[:, 0:THR_CAP] = cge[:]
        out_ref[:, THR_CAP:2 * THR_CAP] = cgt[:]
        out_ref[:, 2 * THR_CAP:3 * THR_CAP] = sgt[:]
        out_ref[:, 3 * THR_CAP:] = jnp.pad(
            ms[:], ((0, 0), (0, 128 - ms.shape[1]))
        )


@functools.partial(jax.jit, static_argnames=("n_thr", "block_v", "block_r"))
def filter_stats_tpu(
    x: jax.Array,  # [N, V] float32 logits (temperature-scaled)
    thr_bits: jax.Array,  # [N, T] uint32 ordered-bit thresholds, T <= THR_CAP
    n_thr: int,
    block_v: int = 2048,
    block_r: int = 128,
) -> tuple:
    """One pass over ``x``: per row, (count_ge [N,T], count_gt [N,T],
    mass_gt [N,T] — softmax mass strictly above each threshold, normalized
    over the full row — lse [N], row_min [N])."""
    N, V = x.shape
    T = thr_bits.shape[1]
    assert T <= THR_CAP and n_thr <= T
    RB = min(block_r, max(8, ((N + 7) // 8) * 8))
    n_pad = (-N) % RB
    v_pad = (-V) % block_v
    if n_pad or v_pad:
        x = jnp.pad(x, ((0, n_pad), (0, v_pad)), constant_values=NEG_BIG)
    if n_pad:
        thr_bits = jnp.pad(thr_bits, ((0, n_pad), (0, 0)))
    if T < THR_CAP:
        thr_bits = jnp.pad(
            thr_bits, ((0, 0), (0, THR_CAP - T)),
            constant_values=jnp.uint32(0xFFFFFFFF),
        )
    Np, Vp = x.shape

    out = pl.pallas_call(
        functools.partial(_kernel, n_thr=n_thr),
        grid=(Np // RB, Vp // block_v),
        in_specs=[
            pl.BlockSpec((RB, block_v), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, THR_CAP), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, OUT_COLS), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, OUT_COLS), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RB, THR_CAP), jnp.float32),  # count_ge
            pltpu.VMEM((RB, THR_CAP), jnp.float32),  # count_gt
            pltpu.VMEM((RB, THR_CAP), jnp.float32),  # sumexp_gt
            pltpu.VMEM((RB, 128), jnp.float32),  # (m, s, row_min)
        ],
    )(x, thr_bits)

    out = out[:N]
    c_ge = out[:, :T].astype(jnp.int32)
    c_gt = out[:, THR_CAP:THR_CAP + T].astype(jnp.int32)
    s_gt = out[:, 2 * THR_CAP:2 * THR_CAP + T]
    m = out[:, 3 * THR_CAP]
    s = out[:, 3 * THR_CAP + 1]
    row_min = out[:, 3 * THR_CAP + 2]
    mass_gt = s_gt / s[:, None]
    lse = m + jnp.log(s)
    return c_ge, c_gt, mass_gt, lse, row_min


def filter_stats_xla(
    x: jax.Array,  # [N, V] float32
    thr_bits: jax.Array,  # [N, T] uint32
    n_thr: int,
) -> tuple:
    """Reference implementation in plain XLA ops (used on non-TPU backends
    and to pin the kernel's outputs): identical math, T-fold logits reads."""
    u = _ordered_bits(x)
    ge = u[:, None, :] >= thr_bits[:, :, None]  # [N, T, V]
    gt = u[:, None, :] > thr_bits[:, :, None]
    c_ge = ge.sum(-1).astype(jnp.int32)
    c_gt = gt.sum(-1).astype(jnp.int32)
    lse = jax.scipy.special.logsumexp(x, axis=-1)
    probs = jnp.exp(x - lse[:, None])
    mass_gt = jnp.where(gt, probs[:, None, :], 0.0).sum(-1)
    return c_ge, c_gt, mass_gt, lse, jnp.min(x, axis=-1)


@jax.custom_batching.custom_vmap
def _stats_call(x: jax.Array, thr_bits: jax.Array) -> tuple:
    V = x.shape[-1]
    T = thr_bits.shape[-1]
    lead = x.shape[:-1]
    impl = (
        filter_stats_tpu if jax.default_backend() == "tpu" else filter_stats_xla
    )
    c_ge, c_gt, mass_gt, lse, row_min = impl(
        x.reshape(-1, V), jnp.broadcast_to(thr_bits, lead + (T,)).reshape(-1, T), T
    )
    return (
        c_ge.reshape(lead + (T,)),
        c_gt.reshape(lead + (T,)),
        mass_gt.reshape(lead + (T,)),
        lse.reshape(lead),
        row_min.reshape(lead),
    )


@_stats_call.def_vmap
def _stats_call_vmap(axis_size, in_batched, x, thr_bits):
    """The kernel is row-parallel, so batching == folding the batch axis
    into rows: WITHOUT this rule, vmap over pallas_call degrades to one
    kernel launch per lane (measured 2x the whole-batch cost at 16 lanes)."""
    xb, tb = in_batched
    if not xb:
        x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
    if not tb:
        thr_bits = jnp.broadcast_to(thr_bits[None], (axis_size,) + thr_bits.shape)
    return _stats_call(x, thr_bits), (True,) * 5


def filter_stats(x: jax.Array, thr_bits: jax.Array, n_thr: int = -1) -> tuple:
    """Backend dispatch: the Pallas kernel on TPU, XLA ops elsewhere.  The
    threshold count is ``thr_bits.shape[-1]`` (``n_thr`` retained for call
    compatibility; callers pass exactly the thresholds they need).  vmap
    folds batch axes into kernel rows (see _stats_call_vmap)."""
    return _stats_call(x, thr_bits)
