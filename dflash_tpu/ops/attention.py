"""Grouped-query attention over fixed-shape KV buffers with boolean masks.

This is the XLA-path attention used by both the causal target verify pass and
the non-causal DFlash draft pass (reference uses flash-attn / sdpa through
Transformers' dispatch, model/dflash.py:86-99).  Invalid key rows (beyond the
cache frontier, padding, future positions) are excluded with an additive
-inf-style mask in fp32 before the softmax, so stale buffer contents never
contribute.  A fused Pallas kernel with identical semantics lives in
``dflash_tpu.kernels``; this function is its numerics reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def gqa_attention(
    q: jax.Array,  # [B, Sq, n_heads, d]
    k: jax.Array,  # [B, Sk, n_kv, d]
    v: jax.Array,  # [B, Sk, n_kv, d]
    mask: jax.Array,  # bool [B, Sq, Sk] or [Sq, Sk]; True = attend
    scale: float,
) -> jax.Array:
    """Returns [B, Sq, n_heads * d]."""
    b, sq, n_heads, d = q.shape
    n_kv = k.shape[2]
    groups = n_heads // n_kv
    qg = q.reshape(b, sq, n_kv, groups, d)
    scores = jnp.einsum(
        "bqkgd,bskd->bkgqs", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if mask.ndim == 2:
        mask = mask[None]
    scores = jnp.where(mask[:, None, None, :, :], scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgqs,bskd->bqkgd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, sq, n_heads * d).astype(q.dtype)


def attention_buckets(max_len: int, smallest: int = 512) -> tuple:
    """Static bucket ladder: powers-of-two multiples of ``smallest`` up to
    ``max_len`` (always includes ``max_len``)."""
    buckets = []
    b = smallest
    while b < max_len:
        buckets.append(b)
        b *= 2
    buckets.append(max_len)
    return tuple(buckets)


def gqa_attention_bucketed(
    q: jax.Array,
    k: jax.Array,  # [B, T, n_kv, d] full cache buffer
    v: jax.Array,
    mask: jax.Array,  # bool [Sq, T] or [B, Sq, T]
    scale: float,
    limit: jax.Array,  # [] int32 — no valid key at row >= limit
    buckets: tuple,
) -> jax.Array:
    """``gqa_attention`` reading only the smallest static prefix bucket that
    covers ``limit``.

    The XLA attention reads all T cache rows every step even when only the
    frontier prefix is valid; a ``lax.switch`` over a handful of static
    prefix lengths makes per-step attention HBM traffic O(frontier) while
    keeping XLA's fused attention kernels (measured faster than a
    hand-written frontier-bounded Pallas kernel on v5e — docs/RESULTS.md).
    Requires ``mask`` to exclude every row >= limit; results are bitwise
    identical to the full read (masked tails contribute exactly zero).
    """
    idx = sum(
        jnp.asarray(limit > b, jnp.int32) for b in buckets[:-1]
    ) if len(buckets) > 1 else jnp.zeros((), jnp.int32)

    def branch(b):
        def run():
            m = mask[..., :b]
            return gqa_attention(q, k[:, :b], v[:, :b], m, scale)
        return run

    return jax.lax.switch(idx, [branch(b) for b in buckets])


def gqa_attention_quant_bucketed(
    q, k_q, k_scale, v_q, v_scale, mask, scale, limit, buckets: tuple
):
    """Bucketed variant of :func:`gqa_attention_quant` (int8 KV cache)."""
    idx = sum(
        jnp.asarray(limit > b, jnp.int32) for b in buckets[:-1]
    ) if len(buckets) > 1 else jnp.zeros((), jnp.int32)

    def branch(b):
        def run():
            return gqa_attention_quant(
                q, k_q[:, :b], k_scale[:, :b], v_q[:, :b], v_scale[:, :b],
                mask[..., :b], scale,
            )
        return run

    return jax.lax.switch(idx, [branch(b) for b in buckets])


def gqa_attention_quant(
    q: jax.Array,  # [B, Sq, n_heads, d]
    k_q: jax.Array,  # [B, Sk, n_kv, d] int8
    k_scale: jax.Array,  # [B, Sk, n_kv] f32
    v_q: jax.Array,  # int8
    v_scale: jax.Array,
    mask: jax.Array,
    scale: float,
) -> jax.Array:
    """GQA over an int8-quantized KV cache.

    The per-row dequant scales factor out of the dot products: key scales
    multiply the score column s, value scales fold into the softmax weights —
    so the matmuls consume int8 data directly (half the HBM traffic) with no
    dequantized copy of the cache ever materialized."""
    b, sq, n_heads, d = q.shape
    n_kv = k_q.shape[2]
    groups = n_heads // n_kv
    qg = q.reshape(b, sq, n_kv, groups, d)
    scores = jnp.einsum(
        "bqkgd,bskd->bkgqs", qg, k_q.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    # [B, Sk, n_kv] -> [B, n_kv, 1, 1, Sk]
    ks = jnp.moveaxis(k_scale, -1, 1)[:, :, None, None, :]
    scores = scores * (ks * scale)
    if mask.ndim == 2:
        mask = mask[None]
    scores = jnp.where(mask[:, None, None, :, :], scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    vs = jnp.moveaxis(v_scale, -1, 1)[:, :, None, None, :]
    weights = (weights * vs).astype(q.dtype)
    out = jnp.einsum(
        "bkgqs,bskd->bqkgd", weights, v_q.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, sq, n_heads * d).astype(q.dtype)


def gqa_attention_quant_ctx_plus_block(
    q: jax.Array,  # [C, B, n_heads, d] — C candidates x B block queries
    ctx_kq: jax.Array,  # [1, T, n_kv, d] int8 (or bf16 when scales are None) — SHARED ctx keys
    ctx_ks: Optional[jax.Array],  # [1, T, n_kv] f32 per-row key scales; None = unquantized ctx
    ctx_vq: jax.Array,  # [1, T, n_kv, d]
    ctx_vs: Optional[jax.Array],  # [1, T, n_kv]; None = unquantized ctx
    blk_k: jax.Array,  # [C, B, n_kv, d] per-candidate block keys (bf16/f32)
    blk_v: jax.Array,  # [C, B, n_kv, d]
    ctx_mask: jax.Array,  # [T] bool — valid committed rows (< frontier)
    blk_mask: jax.Array,  # [B, B] bool — causal within the block
    scale: float,
) -> jax.Array:
    """Shared-context + per-candidate-block attention, merged by log-sum-exp.

    The candidate verify previously broadcast (and, for int8 caches,
    dequantized) the whole ctx cache slice per candidate and concatenated it
    per layer — a C-fold copy that grows with context.  Here the softmax is
    computed in two parts — the ctx part consumes the cache rows with batch
    dim 1 (no per-candidate broadcast; int8 rows stay int8, their scales
    factoring out exactly as in :func:`gqa_attention_quant`; pass
    ``ctx_ks=ctx_vs=None`` for bf16/f32 caches) and the tiny per-candidate
    block part is bf16 — then merged with the standard flash-attention
    running-max identity.  Mathematically identical to softmax over the
    concatenation.

    Returns [C, B, n_heads * d].
    """
    Cc, B, n_heads, d = q.shape
    n_kv = ctx_kq.shape[2]
    groups = n_heads // n_kv
    qg = q.reshape(Cc, B, n_kv, groups, d)

    # --- ctx part: cache rows shared across candidates (batch dim 1) -------
    s1 = jnp.einsum(
        "cqkgd,skd->ckgqs", qg, ctx_kq[0].astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    if ctx_ks is not None:
        ks = jnp.moveaxis(ctx_ks[0], -1, 0)[None, :, None, None, :]  # [1,n_kv,1,1,T]
        s1 = s1 * (ks * scale)
    else:
        s1 = s1 * scale
    s1 = jnp.where(ctx_mask[None, None, None, None, :], s1, _NEG_INF)
    m1 = jnp.max(s1, axis=-1)  # [C, n_kv, g, B]
    e1 = jnp.exp(s1 - m1[..., None])
    l1 = jnp.sum(e1, axis=-1)
    if ctx_vs is not None:
        vs = jnp.moveaxis(ctx_vs[0], -1, 0)[None, :, None, None, :]
        e1v = (e1 * vs).astype(q.dtype)
    else:
        e1v = e1.astype(q.dtype)
    o1 = jnp.einsum(
        "ckgqs,skd->ckgqd", e1v, ctx_vq[0].astype(q.dtype),
        preferred_element_type=jnp.float32,
    )

    # --- block part: per-candidate bf16 rows -------------------------------
    s2 = jnp.einsum(
        "cqkgd,cskd->ckgqs", qg, blk_k, preferred_element_type=jnp.float32
    ) * scale
    s2 = jnp.where(blk_mask[None, None, None, :, :], s2, _NEG_INF)
    m2 = jnp.max(s2, axis=-1)
    e2 = jnp.exp(s2 - m2[..., None])
    l2 = jnp.sum(e2, axis=-1)
    o2 = jnp.einsum(
        "ckgqs,cskd->ckgqd", e2.astype(blk_v.dtype), blk_v,
        preferred_element_type=jnp.float32,
    )

    # --- LSE merge ----------------------------------------------------------
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    denom = a1 * l1 + a2 * l2
    out = (a1[..., None] * o1 + a2[..., None] * o2) / denom[..., None]
    out = jnp.moveaxis(out, 3, 1)  # [C, B, n_kv, g, d]
    return out.reshape(Cc, B, n_heads * d).astype(q.dtype)
