"""DFlash block-diffusion draft model (TPU-native functional form).

The draft is a small Qwen3-style stack whose attention is *non-causal*: the
queries are the noise-block positions only, and the keys/values are the
concatenation of (a) per-layer linear projections of the target's mid-layer
context features and (b) projections of the block's own hidden states
(reference model/dflash.py:30-102).

A structural fact this implementation exploits: the context K/V never attend
to anything — they are pure per-row projections of
``hidden_norm(fc(target_features))`` (reference model/dflash.py:73-79,177).
So the "draft KV cache" is append-only derived state: after each verify pass
we project just the newly committed feature rows and write them at their
absolute positions (the reference instead appends ctx+noise K/V to a
DynamicCache and ``crop``s the noise back off, model/dflash.py:241-246).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dflash_tpu.cache.kv import KVCache, update_layer
from dflash_tpu.core.config import DraftConfig
from dflash_tpu.models import qwen3
from dflash_tpu.ops.attention import gqa_attention
from dflash_tpu.ops.linear import linear
from dflash_tpu.ops.norms import rms_norm
from dflash_tpu.ops.rope import apply_rope, rope_cos_sin


def init_params(key: jax.Array, cfg: DraftConfig, dtype=jnp.bfloat16) -> dict:
    m = cfg.model
    k_layers, k_fc = jax.random.split(key)
    return {
        "layers": qwen3.init_layer_params(k_layers, m, dtype),
        "final_norm": jnp.ones((m.hidden_size,), dtype),
        "fc": (
            jax.random.normal(k_fc, (cfg.num_taps * m.hidden_size, m.hidden_size), jnp.float32) * 0.02
        ).astype(dtype),
        "hidden_norm": jnp.ones((m.hidden_size,), dtype),
    }


def project_features(params: dict, cfg: DraftConfig, features: jax.Array) -> jax.Array:
    """``hidden_norm(fc(features))`` — shared context input for every layer
    (reference model/dflash.py:177)."""
    h = linear(features, params["fc"], out_dtype=features.dtype)
    return rms_norm(h, params["hidden_norm"], cfg.model.rms_norm_eps)


def ctx_kv(
    params: dict,
    cfg: DraftConfig,
    features: jax.Array,  # [B, S, n_taps * H] target tap features
    positions: jax.Array,  # [B, S] absolute positions
) -> Tuple[jax.Array, jax.Array]:
    """Per-layer context K/V for the given feature rows.

    Returns (k, v) of shape [L_draft, B, S, n_kv, d], with k_norm and RoPE
    already applied (matching reference model/dflash.py:73-82 where k_norm is
    applied after the ctx/noise concat — elementwise per row, so applying it
    to the ctx rows alone is identical).
    """
    m = cfg.model
    nkv, d = m.num_key_value_heads, m.head_dim
    B, S = features.shape[:2]
    ctx = project_features(params, cfg, features)
    cos, sin = rope_cos_sin(positions, d, m.rope_theta, m.rope_scaling)

    def layer_kv(p):
        k = linear(ctx, p["wk"]).reshape(B, S, nkv, d)
        v = linear(ctx, p["wv"]).reshape(B, S, nkv, d)
        if m.use_qk_norm:
            k = rms_norm(k, p["k_norm"], m.rms_norm_eps)
        k = apply_rope(k, cos, sin)
        return k, v

    return jax.vmap(layer_kv)(params["layers"])


def append_ctx(
    params: dict,
    cfg: DraftConfig,
    cache: KVCache,
    features: jax.Array,  # [B, S, n_taps*H]
    positions: jax.Array,  # [B, S]
    write_pos: jax.Array,  # scalar int32
) -> KVCache:
    """Project feature rows and write their K/V into the draft context cache."""
    k_new, v_new = ctx_kv(params, cfg, features, positions)
    k, v = jax.vmap(update_layer, in_axes=(0, 0, 0, 0, None))(
        cache.k, cache.v, k_new, v_new, write_pos
    )
    return KVCache(k, v)


def forward(
    params: dict,
    cfg: DraftConfig,
    noise_embeds: jax.Array,  # [B, Bk, H] target-embedding of the current block
    block_positions: jax.Array,  # [B, Bk] absolute positions
    ctx_cache: KVCache,  # [L_d, B, T, n_kv, d] context K/V (projections)
    ctx_len: jax.Array,  # scalar int32: valid context frontier (== start)
) -> jax.Array:
    """One non-causal draft forward over the noise block.

    Every block query attends all valid context rows (< ctx_len) plus every
    block position (``is_causal=False``, reference model/dflash.py:41).
    Returns final-norm'd hidden states [B, Bk, H]; the caller applies the
    *target's* lm_head to rows 1..Bk-1 (reference benchmark.py:130-139).
    """
    m = cfg.model
    B, Bk, H = noise_embeds.shape
    nh, nkv, d = m.num_attention_heads, m.num_key_value_heads, m.head_dim
    scale = d ** -0.5
    T = ctx_cache.max_len
    cos, sin = rope_cos_sin(block_positions, d, m.rope_theta, m.rope_scaling)

    # [Bk, T + Bk]: ctx keys valid below the frontier; block keys all valid.
    ctx_mask = jnp.arange(T, dtype=jnp.int32)[None, :] < ctx_len
    mask = jnp.concatenate(
        [jnp.broadcast_to(ctx_mask, (Bk, T)), jnp.ones((Bk, Bk), bool)], axis=1
    )

    def layer_step(hidden, xs):
        p, k_ctx, v_ctx = xs
        h_norm = rms_norm(hidden, p["input_ln"], m.rms_norm_eps)
        q = linear(h_norm, p["wq"]).reshape(B, Bk, nh, d)
        k = linear(h_norm, p["wk"]).reshape(B, Bk, nkv, d)
        v = linear(h_norm, p["wv"]).reshape(B, Bk, nkv, d)
        if m.use_qk_norm:
            q = rms_norm(q, p["q_norm"], m.rms_norm_eps)
            k = rms_norm(k, p["k_norm"], m.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        k_all = jnp.concatenate([k_ctx, k], axis=1)  # [B, T+Bk, n_kv, d]
        v_all = jnp.concatenate([v_ctx, v], axis=1)
        attn = gqa_attention(q, k_all, v_all, mask, scale)
        attn = linear(attn, p["wo"], out_dtype=hidden.dtype)
        hidden = hidden + attn

        h_norm2 = rms_norm(hidden, p["post_ln"], m.rms_norm_eps)
        hidden = hidden + qwen3._dense_mlp(p, h_norm2)
        return hidden, None

    hidden, _ = jax.lax.scan(
        layer_step, noise_embeds, (params["layers"], ctx_cache.k, ctx_cache.v)
    )
    return rms_norm(hidden, params["final_norm"], m.rms_norm_eps)
