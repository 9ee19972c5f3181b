"""Rotary position embeddings.

Plain RoPE (Qwen3) plus Llama-3.1 frequency scaling.  The reference applies
RoPE with cos/sin covering ctx+block and the query sliced to its last
positions (model/dflash.py:22-28); here cos/sin are always computed for the
exact absolute positions of the tensor being rotated, which is equivalent.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _inv_freq(head_dim: int, theta: float, rope_scaling: Optional[Tuple[float, float, float, int]]) -> jax.Array:
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    if rope_scaling is None:
        return inv_freq
    # Llama-3.1 rope scaling (matches HF _compute_llama3_parameters).
    factor, low_ff, high_ff, orig_max = rope_scaling
    low_freq_wavelen = orig_max / low_ff
    high_freq_wavelen = orig_max / high_ff
    wavelen = 2.0 * math.pi / inv_freq
    scaled = inv_freq / factor
    smooth = (orig_max / wavelen - low_ff) / (high_ff - low_ff)
    smoothed = (1.0 - smooth) * scaled + smooth * inv_freq
    out = jnp.where(wavelen > low_freq_wavelen, scaled, inv_freq)
    is_mid = (wavelen <= low_freq_wavelen) & (wavelen >= high_freq_wavelen)
    return jnp.where(is_mid, smoothed, out)


def rope_cos_sin(
    positions: jax.Array,
    head_dim: int,
    theta: float,
    rope_scaling: Optional[Tuple[float, float, float, int]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for absolute ``positions`` (any shape), fp32.

    Returns cos/sin of shape ``positions.shape + (head_dim,)`` with the
    half-frequencies duplicated (HF convention: concat(freqs, freqs)).
    """
    inv_freq = _inv_freq(head_dim, theta, rope_scaling)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate ``x`` of shape [..., S, n_heads, head_dim] by per-position cos/sin [..., S, head_dim]."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    return (xf * c + _rotate_half(xf) * s).astype(dtype)
