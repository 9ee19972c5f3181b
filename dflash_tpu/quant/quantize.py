"""Weight-only INT8 quantization of model parameter pytrees.

Per-output-channel symmetric int8 with fp32 scales (the standard
weight-only recipe: activations stay bf16, the MXU consumes dequantized bf16
tiles — see kernels/matmul_q.py).  Norm weights and the embedding table stay
bf16 (the embedding is a gather, not a matmul); for tied-embedding models a
quantized ``lm_head`` copy is materialized so the vocab projection still runs
int8.

MoE expert banks ([L, E, K, N] gate/up/down) are quantized per (layer,
expert, output channel) — the scale granularity that keeps int8 experts
acceptance-safe.  Expert banks are the reason a Qwen3-Coder-30B-A3B-class
target (reference README.md:60-68) is HBM-feasible at all: experts are ~97%
of its weights.  They are quantized UNPADDED (pad_to=1): both the gather
path and the EP shard_map path consume them through einsums, which need no
tile padding, and padding 768 -> 1024 would waste a third of expert HBM.
The router stays bf16 (tiny, and routing is precision-sensitive).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dflash_tpu.core.config import DraftConfig, ModelConfig
from dflash_tpu.ops.linear import QTensor, quantize_weight

_MATMUL_KEYS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def _quantize_stacked(w: jax.Array, pad_to: int) -> QTensor:
    """Quantize per-layer-stacked [L, K, N] weights (per layer, per channel).

    ``lax.map`` (sequential) rather than ``vmap`` so the fp32 intermediate is
    one layer at a time — keeps the peak-memory spike of quantizing an
    already-loaded bf16 model small.
    """
    return jax.jit(lambda x: jax.lax.map(partial(quantize_weight, pad_to=pad_to), x))(w)


def _quantize_expert_stacked(w: jax.Array) -> QTensor:
    """Quantize an expert bank [L, E, K, N] per (layer, expert, out-channel).

    Nested ``lax.map`` (sequential over layers AND experts) bounds the fp32
    transient to one [K, N] expert matrix at a time."""
    per_layer = lambda le: jax.lax.map(partial(quantize_weight, pad_to=1), le)
    return jax.jit(lambda x: jax.lax.map(per_layer, x))(w)


def _quantize_layers(layers: dict, cfg: ModelConfig, pad_to: int) -> dict:
    """Quantize the matmul weights of a layer-stack dict IN PLACE.

    The input dict is mutated so each bf16 weight stack is released from HBM
    as soon as its int8 replacement exists (quantizing an 8-16GB model on a
    16GB chip would otherwise OOM on the transient double-residency)."""
    for key in _MATMUL_KEYS:
        if key not in layers:
            continue
        w = layers.pop(key)
        if cfg.is_moe and key in ("gate", "up", "down"):
            # [L, E, K, N] expert bank: per-expert scales, unpadded.
            layers[key] = jax.block_until_ready(_quantize_expert_stacked(w))
        else:
            layers[key] = jax.block_until_ready(_quantize_stacked(w, pad_to))
        del w  # last reference to the bf16 stack
    return layers


def quantize_target_params(params: dict, cfg: ModelConfig, pad_to: int = 512) -> dict:
    """Quantize a target param pytree (CONSUMES the input: bf16 weights are
    released as their int8 replacements are produced)."""
    params["layers"] = _quantize_layers(params["layers"], cfg, pad_to)
    if "lm_head" in params:
        w = params.pop("lm_head")
        params["lm_head"] = jax.block_until_ready(quantize_weight(w, pad_to))
        del w
    else:
        # Tied embeddings: materialize an int8 head so the vocab matmul
        # (the single largest decode GEMM) still runs quantized.
        params["lm_head"] = jax.block_until_ready(
            quantize_weight(params["embed"].T, pad_to)
        )
    return params


def init_params_quantized(key: jax.Array, cfg: ModelConfig, pad_to: int = 512) -> dict:
    """Random params generated DIRECTLY in int8 (for perf benchmarks of
    models whose bf16 form would not fit on-chip, e.g. Qwen3-8B on a 16GB
    v5e).  Statistically matches quantize(init_params(...)) without ever
    materializing the bf16 weights."""
    from dflash_tpu.models import qwen3

    def q(shape, k, pad: int = pad_to):
        K, N = shape[-2], shape[-1]
        Np = ((N + pad - 1) // pad) * pad if pad > 1 else N

        def one(kk):
            # random.bits(uint8) -> int8 view: no int32 transient (randint
            # materializes a 4x-sized wide intermediate, which OOMs the
            # direct-init path for multi-GB expert banks).
            bits = jax.random.bits(kk, shape[-2:-1] + (Np,), jnp.uint8)
            vals = jax.lax.bitcast_convert_type(bits, jnp.int8)
            vals = jnp.where(vals == -128, 0, vals)
            scale = jnp.full((1, Np), 0.02 * 2.5 / 127.0, jnp.float32)
            return QTensor(vals, scale, N)

        if len(shape) == 4:  # [L, E, K, N] expert bank (unpadded, see module doc)
            # lax.map over layers bounds the per-dispatch transient to one
            # layer's expert bank.
            def per_layer(kl):
                return jax.vmap(one)(jax.random.split(kl, shape[1]))

            return jax.lax.map(per_layer, jax.random.split(k, shape[0]))
        if len(shape) == 3:
            return jax.vmap(one)(jax.random.split(k, shape[0]))
        return one(k)

    L, H, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    nh, nkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    keys = iter(jax.random.split(key, 16))
    layers = {
        "input_ln": jnp.ones((L, H), jnp.bfloat16),
        "post_ln": jnp.ones((L, H), jnp.bfloat16),
        "wq": q((L, H, nh * d), next(keys)),
        "wk": q((L, H, nkv * d), next(keys)),
        "wv": q((L, H, nkv * d), next(keys)),
        "wo": q((L, nh * d, H), next(keys)),
    }
    if cfg.is_moe:
        E, Im = cfg.num_experts, cfg.moe_intermediate_size
        layers["router"] = (
            jax.random.normal(next(keys), (L, H, E), jnp.float32) * 0.02
        ).astype(jnp.bfloat16)
        layers["gate"] = q((L, E, H, Im), next(keys), pad=1)
        layers["up"] = q((L, E, H, Im), next(keys), pad=1)
        layers["down"] = q((L, E, Im, H), next(keys), pad=1)
    else:
        layers["gate"] = q((L, H, I), next(keys))
        layers["up"] = q((L, H, I), next(keys))
        layers["down"] = q((L, I, H), next(keys))
    if cfg.use_qk_norm:
        layers["q_norm"] = jnp.ones((L, d), jnp.bfloat16)
        layers["k_norm"] = jnp.ones((L, d), jnp.bfloat16)
    embed = (
        jax.random.normal(next(keys), (cfg.vocab_size, H), jnp.float32) * 0.02
    ).astype(jnp.bfloat16)
    return {
        "embed": embed,
        "layers": layers,
        "final_norm": jnp.ones((H,), jnp.bfloat16),
        "lm_head": q((H, cfg.vocab_size), next(keys)),
    }


def quantize_draft_params(params: dict, cfg: DraftConfig, pad_to: int = 512) -> dict:
    """Quantize a draft param pytree (consumes the input, see above)."""
    params["layers"] = _quantize_layers(params["layers"], cfg.model, pad_to)
    w = params.pop("fc")
    params["fc"] = jax.block_until_ready(quantize_weight(w, pad_to))
    del w
    return params
