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


def update_layer(
    k_layer: jax.Array,  # [B, T, n_kv, d]
    v_layer: jax.Array,
    k_new: jax.Array,  # [B, S, n_kv, d]
    v_new: jax.Array,
    write_pos: jax.Array,  # scalar int32: absolute position of k_new[:, 0]
) -> tuple[jax.Array, jax.Array]:
    zero = jnp.zeros((), jnp.int32)
    idx = (zero, write_pos.astype(jnp.int32), zero, zero)
    return (
        jax.lax.dynamic_update_slice(k_layer, k_new.astype(k_layer.dtype), idx),
        jax.lax.dynamic_update_slice(v_layer, v_new.astype(v_layer.dtype), idx),
    )
