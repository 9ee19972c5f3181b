"""RMSNorm (Qwen3/Llama style), fp32 statistics with cast back to input dtype.

Matches the semantics of HF ``Qwen3RMSNorm`` used throughout the reference
draft model (model/dflash.py:54-55, 110-111, 158-161): y = w * x / rms(x),
with the variance computed in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * weight.astype(jnp.float32)).astype(dtype)
