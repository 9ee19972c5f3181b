"""Fixed-shape KV cache with an implicit length frontier.

The reference relies on Transformers' growable ``DynamicCache`` and mutates it
with ``.crop(start)`` after every cycle to roll back rejected draft tokens
(reference benchmark.py:187, model/dflash.py:246,262).  On TPU the cache is a
preallocated pair of arrays indexed by *absolute token position*; rollback is
free: the frontier (``start``) only feeds the attention mask, and the next
cycle's writes overwrite the rejected rows before they can ever be attended.

Layout: ``[num_layers, batch, max_len, num_kv_heads, head_dim]`` — head_dim
(=128) on the lane axis, positions on a tiled axis, so per-cycle
``dynamic_update_slice`` writes at the frontier are layout-friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dflash_tpu.core.config import ModelConfig


class KVCache(NamedTuple):
    k: jax.Array  # [L, B, T, n_kv, d]
    v: jax.Array  # [L, B, T, n_kv, d]

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_kv_cache(
    cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def _masked_window_write(layer: jax.Array, new: jax.Array, write_pos: jax.Array):
    """Frontier write as a full-buffer select instead of dynamic_update_slice.

    Under vmap (per-lane write_pos) the DUS becomes a batched scatter; this
    formulation stays a gather + elementwise select that XLA fuses into one
    linear pass over the buffer.  MEASURED AND REJECTED on v5e (16-lane
    batched decode 4616 -> 4456 tok/s, single-stream 1.078 -> 1.107 ms):
    XLA's batched in-place scatter beats the full-buffer select, whose
    linear pass rewrites every row each cycle.  Kept behind
    DFLASH_KV_WRITE=mask so nobody re-derives it."""
    T, S = layer.shape[1], new.shape[1]
    t = jnp.arange(T, dtype=jnp.int32)
    pos = write_pos.astype(jnp.int32)
    rel = jnp.clip(t - pos, 0, S - 1)
    in_win = (t >= pos) & (t < pos + S)
    rows = jnp.take(new.astype(layer.dtype), rel, axis=1)  # [B, T, ...]
    shape = (1, T) + (1,) * (layer.ndim - 2)
    return jnp.where(in_win.reshape(shape), rows, layer)


def update_layer(
    k_layer: jax.Array,  # [B, T, n_kv, d]
    v_layer: jax.Array,
    k_new: jax.Array,  # [B, S, n_kv, d]
    v_new: jax.Array,
    write_pos: jax.Array,  # scalar int32: absolute position of k_new[:, 0]
) -> tuple[jax.Array, jax.Array]:
    import os

    if os.environ.get("DFLASH_KV_WRITE") == "mask":
        return (
            _masked_window_write(k_layer, k_new, write_pos),
            _masked_window_write(v_layer, v_new, write_pos),
        )
    zero = jnp.zeros((), jnp.int32)
    idx = (zero, write_pos.astype(jnp.int32), zero, zero)
    return (
        jax.lax.dynamic_update_slice(k_layer, k_new.astype(k_layer.dtype), idx),
        jax.lax.dynamic_update_slice(v_layer, v_new.astype(v_layer.dtype), idx),
    )


# ---------------------------------------------------------------------------
# INT8-quantized KV cache (per-row-per-head symmetric scales)
# ---------------------------------------------------------------------------

class QuantKVCache(NamedTuple):
    """int8 K/V with per (position, kv-head) fp32 scales.

    Halves cache HBM traffic and capacity vs bf16 (the north-star "quantized
    paged KV-cache"); rollback semantics are identical to KVCache (absolute
    positions + frontier masking)."""

    k: jax.Array  # [L, B, T, n_kv, d] int8
    k_scale: jax.Array  # [L, B, T, n_kv] f32
    v: jax.Array  # int8
    v_scale: jax.Array  # f32

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_quant_kv_cache(cfg: ModelConfig, batch: int, max_len: int) -> QuantKVCache:
    shape = (cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim)
    sshape = shape[:-1]
    return QuantKVCache(
        k=jnp.zeros(shape, jnp.int8),
        k_scale=jnp.ones(sshape, jnp.float32),
        v=jnp.zeros(shape, jnp.int8),
        v_scale=jnp.ones(sshape, jnp.float32),
    )


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., d] -> (int8 values, fp32 scale over the last axis)."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def update_layer_quant(
    k_layer: jax.Array,  # [B, T, n_kv, d] int8
    ks_layer: jax.Array,  # [B, T, n_kv] f32
    v_layer: jax.Array,
    vs_layer: jax.Array,
    k_new: jax.Array,  # [B, S, n_kv, d] bf16
    v_new: jax.Array,
    write_pos: jax.Array,
):
    zero = jnp.zeros((), jnp.int32)
    idx4 = (zero, write_pos.astype(jnp.int32), zero, zero)
    idx3 = (zero, write_pos.astype(jnp.int32), zero)
    kq, ks = quantize_rows(k_new)
    vq, vs = quantize_rows(v_new)
    return (
        jax.lax.dynamic_update_slice(k_layer, kq, idx4),
        jax.lax.dynamic_update_slice(ks_layer, ks, idx3),
        jax.lax.dynamic_update_slice(v_layer, vq, idx4),
        jax.lax.dynamic_update_slice(vs_layer, vs, idx3),
    )


def write_prompt_rows(kv, k_rows: jax.Array, v_rows: jax.Array):
    """Write prompt K/V rows [L, B, S, n_kv, d] of ALL layers at position 0
    in one dynamic_update_slice per tensor (quantizing on the way in for the
    int8 cache).

    Used by the cache-free prefill path (models/qwen3.py forward_prefill) and
    by the prefix-cache resume path (spec/engine.py _prefill_from_prefix),
    which commits the cached prefix rows before forwarding the suffix."""
    zeros5 = (0, 0, 0, 0, 0)
    if isinstance(kv, QuantKVCache):
        kq, ks = quantize_rows(k_rows)
        vq, vs = quantize_rows(v_rows)
        return QuantKVCache(
            k=jax.lax.dynamic_update_slice(kv.k, kq, zeros5),
            k_scale=jax.lax.dynamic_update_slice(kv.k_scale, ks, (0, 0, 0, 0)),
            v=jax.lax.dynamic_update_slice(kv.v, vq, zeros5),
            v_scale=jax.lax.dynamic_update_slice(kv.v_scale, vs, (0, 0, 0, 0)),
        )
    return KVCache(
        k=jax.lax.dynamic_update_slice(kv.k, k_rows.astype(kv.k.dtype), zeros5),
        v=jax.lax.dynamic_update_slice(kv.v, v_rows.astype(kv.v.dtype), zeros5),
    )


def update_any(cache_layer, k_new: jax.Array, v_new: jax.Array, write_pos: jax.Array):
    """Write new K/V rows into a per-layer cache slice of either cache type."""
    if isinstance(cache_layer, QuantKVCache):
        k, ks, v, vs = update_layer_quant(
            cache_layer.k, cache_layer.k_scale, cache_layer.v, cache_layer.v_scale,
            k_new, v_new, write_pos,
        )
        return QuantKVCache(k, ks, v, vs)
    k, v = update_layer(cache_layer.k, cache_layer.v, k_new, v_new, write_pos)
    return KVCache(k, v)
