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
