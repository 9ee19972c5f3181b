"""Fused multi-row verify attention (two-part flash kernel).

The XLA two-part verify (``ops/attention.py::gqa_attention_quant_ctx_plus_block``)
materializes the ``[rows, T]`` fp32 score tensor in HBM between the score and
value matmuls every layer — round-4 ablations measured the resulting verify
row cost LINEAR at 3.2 µs/(row·tok) from R=16 up and attributed it to exactly
this attention-score transient traffic (docs/measurements/candidates_r4.json).
This kernel is the identified lever: one Pallas program per (lane, kv-head)
streams frontier-bounded ctx K/V chunks from HBM, keeps the flash running
softmax (m, l, acc) entirely in VMEM, and merges the per-candidate block rows
with their routing mask in the same accumulator — the score tensor never
exists in HBM at any size.

Design notes (the round-3 hand kernel lost to XLA; each cause is addressed):

* **No in-VMEM transposes**: ctx K/V are viewed ``[T, n_kv*d]`` (a free
  reshape of the cache layout) so each per-head chunk block is a contiguous
  ``(CK, d)`` tile — the old kernel DMA'd ``[CK, n_kv, d]`` and transposed to
  head-major inside VMEM every chunk.
* **bf16/int8 MXU feeds**: score and value matmuls take the cache dtype with
  fp32 accumulation (``preferred_element_type``); the old kernel upcast
  everything to fp32 before the dots.
* **Frontier-bounded DMA without manual double-buffering**: the grid covers
  all ``T/CK`` chunks but the index_map (scalar-prefetched per-lane
  frontiers) clamps the block index at the last valid chunk — Pallas skips
  the copy when the block index repeats, so HBM traffic is O(frontier) and
  the pipeline double-buffers automatically.

Semantics match ``gqa_attention_quant_ctx_plus_block`` (the numerics
reference, pinned by tests/test_verify_fused.py): softmax over
[ctx rows < ctx_len | block rows allowed by the routing mask], per-row int8
dequant scales folded into scores (K) and weights (V), LSE-merged.
Reference behavior being replaced: flash-attn through Transformers'
attention dispatch (reference model/dflash.py:86-99) plus the candidate
verify's KV clone + batch_repeat_interleave
(reference benchmark_candidate_solutions.py:570-576).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(
    # scalar prefetch
    starts_ref,  # SMEM [L] int32 — per-lane ctx frontier (valid rows < start)
    # inputs
    q_ref,  # VMEM [1, 1, GB, d] — queries for this (lane, head)
    ck_ref,  # VMEM [1, CK, d] — ctx K chunk (int8 or bf16/f32)
    cv_ref,  # VMEM [1, CK, d]
    bk_ref,  # VMEM [1, 1, R_pad, d] — block K rows for this (lane, head)
    bv_ref,  # VMEM [1, 1, R_pad, d]
    mask_ref,  # VMEM [GB, R_pad] f32 — 1.0 = block key attendable (tiled over g)
    *rest,
    CK: int,
    quant: bool,
    scale: float,
):
    if quant:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
        ks_ref = vs_ref = None

    lane = pl.program_id(0)
    h = pl.program_id(1)
    c = pl.program_id(2)
    NC = pl.num_programs(2)
    start = starts_ref[lane]
    # last chunk index holding any valid ctx row (>=0 so chunk 0 always runs;
    # its rows are masked out when start == 0)
    lv = jnp.maximum((start + CK - 1) // CK - 1, 0)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0]  # [GB, d]
    GB = q.shape[0]

    @pl.when(c <= lv)
    def _():  # ctx chunk: flash step over rows [c*CK, (c+1)*CK) ∩ [0, start)
        # int8 rows feed the MXU as the query dtype (the XLA path's
        # `k_q.astype(q.dtype)`) with fp32 accumulation
        k = ck_ref[0].astype(q.dtype)  # [CK, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [GB, CK]
        if quant:
            # per-row key scales fold into the scores exactly as the XLA
            # path's `s1 * (ks * scale)` (ops/attention.py).  The scale
            # block holds the full [n_kv, T] slab (tiny, fetched once —
            # Mosaic requires the last two block dims divisible by (8, 128)
            # or full, which rules out per-head/per-chunk sub-blocks);
            # pick this head's chunk here.
            ks = ks_ref[0, h, pl.ds(c * CK, CK)]
            s = s * (ks[None, :] * scale)
        else:
            s = s * scale
        key_pos = c * CK + jax.lax.broadcasted_iota(jnp.int32, (GB, CK), 1)
        valid = key_pos < start
        s = jnp.where(valid, s, _NEG)

        m_prev = m_ref[:, :1]  # [GB, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        # exp AFTER the validity select: an all-masked row has m_new == _NEG
        # and exp(s - m_new) == 1 on its masked columns — zero them instead
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if quant:
            # value scales fold into weights (full slab, chunk sliced)
            p = p * vs_ref[0, h, pl.ds(c * CK, CK)][None, :]
        v = cv_ref[0].astype(q.dtype)  # [CK, d]
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(c == NC - 1)
    def _():  # block rows: routed per-candidate keys, then finalize
        bk = bk_ref[0, 0]  # [R_pad, d]
        s2 = jax.lax.dot_general(
            q, bk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        ok = mask_ref[:] > 0.0  # [GB, R_pad]
        s2 = jnp.where(ok, s2, _NEG)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s2, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p2 = jnp.where(ok, jnp.exp(s2 - m_new), 0.0)
        l_new = l_ref[:, :1] * alpha + jnp.sum(p2, axis=1, keepdims=True)
        bv = bv_ref[0, 0]
        acc = acc_ref[:] * alpha + jax.lax.dot_general(
            p2.astype(bv.dtype), bv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = acc / jnp.maximum(l_new, 1e-30)


def _fused_lanes(
    q,  # [L, n_kv, GB, d]
    ctx_k,  # [L, T, n_kv * d] (int8 | bf16 | f32)
    ctx_ks,  # [L, n_kv, T] f32 | None
    ctx_v,
    ctx_vs,
    blk_k,  # [L, n_kv, R_pad, d]
    blk_v,
    mask_f,  # [GB, R_pad] f32 — shared across lanes/heads
    starts,  # [L] int32
    *,
    scale: float,
    interpret: bool,
):
    L, n_kv, GB, d = q.shape
    T = ctx_k.shape[1]
    R_pad = blk_k.shape[2]
    quant = ctx_ks is not None
    CK = next((c for c in (512, 256, 128) if T % c == 0), None)
    if CK is None:
        raise ValueError(f"cache len {T} must be a multiple of 128")
    CK = min(CK, T)
    NC = T // CK

    def ctx_idx(l, h, c, starts_ref):
        lv = jnp.maximum((starts_ref[l] + CK - 1) // CK - 1, 0)
        return (l, jnp.minimum(c, lv), h)

    def scale_idx(l, h, c, starts_ref):  # scales are [L, n_kv, T]; full slab
        return (l, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, GB, d), lambda l, h, c, s: (l, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CK, d), ctx_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CK, d), ctx_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, R_pad, d), lambda l, h, c, s: (l, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, R_pad, d), lambda l, h, c, s: (l, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((GB, R_pad), lambda l, h, c, s: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # ctx K/V are indexed per head via the flattened [T, n_kv*d] view: block
    # (1, CK, d) at block index (l, c, h) == elements [l, c*CK:(c+1)*CK,
    # h*d:(h+1)*d] — a contiguous (CK, d) tile, no in-VMEM transpose.
    operands = [q, ctx_k, ctx_v, blk_k, blk_v, mask_f]
    if quant:
        in_specs += [
            pl.BlockSpec((1, n_kv, T), scale_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, T), scale_idx, memory_space=pltpu.VMEM),
        ]
        operands += [ctx_ks, ctx_vs]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, n_kv, NC),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, GB, d), lambda l, h, c, s: (l, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((GB, d), jnp.float32),
            pltpu.VMEM((GB, 128), jnp.float32),
            pltpu.VMEM((GB, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, CK=CK, quant=quant, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, n_kv, GB, d), jnp.float32),
        interpret=interpret,
    )(starts.astype(jnp.int32), *operands)


@functools.lru_cache(maxsize=None)
def _make_call(scale: float, quant: bool, interpret: bool):
    """custom_vmap wrapper: the batched engine vmaps the whole spec cycle over
    lanes — without this rule that degrades to one pallas_call per lane.  The
    rule folds the vmap axis into the kernel's lane grid dimension."""

    if quant:

        @jax.custom_batching.custom_vmap
        def call(q, ctx_k, ctx_ks, ctx_v, ctx_vs, blk_k, blk_v, mask_f, start):
            return _fused_lanes(
                q[None], ctx_k[None], ctx_ks[None], ctx_v[None], ctx_vs[None],
                blk_k[None], blk_v[None], mask_f, start[None],
                scale=scale, interpret=interpret,
            )[0]

        @call.def_vmap
        def _rule(axis_size, in_batched, q, ctx_k, ctx_ks, ctx_v, ctx_vs,
                  blk_k, blk_v, mask_f, start):
            def bc(x, b):
                return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

            (qb, kb, ksb, vb, vsb, bkb, bvb, mb, sb) = in_batched
            if mb:  # mask is structural; lanes share it — take lane 0
                mask_f = mask_f[0]
            out = _fused_lanes(
                bc(q, qb), bc(ctx_k, kb), bc(ctx_ks, ksb), bc(ctx_v, vb),
                bc(ctx_vs, vsb), bc(blk_k, bkb), bc(blk_v, bvb), mask_f,
                bc(start, sb),
                scale=scale, interpret=interpret,
            )
            return out, True

        return call

    @jax.custom_batching.custom_vmap
    def call(q, ctx_k, ctx_v, blk_k, blk_v, mask_f, start):
        return _fused_lanes(
            q[None], ctx_k[None], None, ctx_v[None], None,
            blk_k[None], blk_v[None], mask_f, start[None],
            scale=scale, interpret=interpret,
        )[0]

    @call.def_vmap
    def _rule(axis_size, in_batched, q, ctx_k, ctx_v, blk_k, blk_v, mask_f, start):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        (qb, kb, vb, bkb, bvb, mb, sb) = in_batched
        if mb:
            mask_f = mask_f[0]
        out = _fused_lanes(
            bc(q, qb), bc(ctx_k, kb), None, bc(ctx_v, vb), None,
            bc(blk_k, bkb), bc(blk_v, bvb), mask_f, bc(start, sb),
            scale=scale, interpret=interpret,
        )
        return out, True

    return call


def supported(nh: int, n_kv: int, d: int, T: int) -> bool:
    """Shapes the TPU kernel handles; callers fall back to the XLA path
    otherwise (tiny test models with d < 128, odd cache lengths)."""
    return (
        d % 128 == 0
        and T % 128 == 0
        and nh % n_kv == 0
    )


def fused_ctx_block_attention(
    q: jax.Array,  # [C, B, nh, d]
    ctx_kq: jax.Array,  # [1, T, n_kv, d] int8 (quant) or bf16/f32
    ctx_ks,  # [1, T, n_kv] f32 | None
    ctx_vq: jax.Array,
    ctx_vs,
    blk_k: jax.Array,  # [C, B, n_kv, d]
    blk_v: jax.Array,
    ctx_len: jax.Array,  # [] int32 — ctx rows < ctx_len are valid
    blk_mask: jax.Array,  # [B, B] bool (C-candidate isolation added here)
    scale: float,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ``gqa_attention_quant_ctx_plus_block`` taking the frontier
    scalar instead of a materialized ctx mask.  Returns [C, B, nh * d]."""
    C, B, nh, d = q.shape
    T = ctx_kq.shape[1]
    n_kv = ctx_kq.shape[2]
    g = nh // n_kv
    R = C * B
    # Mosaic compiles only for TPU; everywhere else (CPU tests) interpret.
    interpret = interpret or jax.default_backend() != "tpu"

    if not supported(nh, n_kv, d, T):
        from dflash_tpu.ops.attention import gqa_attention_quant_ctx_plus_block

        ctx_mask = jnp.arange(T, dtype=jnp.int32) < ctx_len
        return gqa_attention_quant_ctx_plus_block(
            q, ctx_kq, ctx_ks, ctx_vq, ctx_vs, blk_k, blk_v, ctx_mask,
            blk_mask, scale,
        )

    if C > 1:
        # candidate isolation: row (c, i) may only attend key (c, j)
        iso = jnp.eye(C, dtype=bool)
        mask = (iso[:, None, :, None] & blk_mask[None, :, None, :]).reshape(R, R)
    else:
        mask = blk_mask
    R_pad = max(128, ((R + 127) // 128) * 128)
    GB = g * R

    # [C, B, nh, d] -> [n_kv, g*R, d]; row r = g_idx * R + row_idx
    qh = q.reshape(R, n_kv, g, d)
    qh = jnp.transpose(qh, (1, 2, 0, 3)).reshape(n_kv, GB, d)
    # block K/V -> head-major, padded key rows (mask keeps padding at 0)
    bk = jnp.moveaxis(blk_k.reshape(R, n_kv, d), 0, 1)  # [n_kv, R, d]
    bv = jnp.moveaxis(blk_v.reshape(R, n_kv, d), 0, 1)
    pad = ((0, 0), (0, R_pad - R), (0, 0))
    bk = jnp.pad(bk, pad)
    bv = jnp.pad(bv, pad)
    mask_f = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, R_pad - R)))
    mask_f = jnp.tile(mask_f, (g, 1))  # [GB, R_pad]
    ctx2 = ctx_kq[0].reshape(T, n_kv * d)  # free reshape of the cache layout
    ctv2 = ctx_vq[0].reshape(T, n_kv * d)
    start = ctx_len.astype(jnp.int32)

    call = _make_call(float(scale), ctx_ks is not None, bool(interpret))
    if ctx_ks is not None:
        ks2 = jnp.moveaxis(ctx_ks[0], -1, 0)  # [n_kv, T]
        vs2 = jnp.moveaxis(ctx_vs[0], -1, 0)
        out = call(qh, ctx2, ks2, ctv2, vs2, bk, bv, mask_f, start)
    else:
        out = call(qh, ctx2, ctv2, bk, bv, mask_f, start)

    # [n_kv, GB, d] -> [C, B, nh*d]
    out = out.reshape(n_kv, g, R, d)
    out = jnp.transpose(out, (2, 0, 1, 3)).reshape(C, B, nh * d)
    return out.astype(q.dtype)
