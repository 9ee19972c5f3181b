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
