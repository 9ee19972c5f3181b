"""Weight-only INT8 quantization of model parameter pytrees.

Per-output-channel symmetric int8 with fp32 scales (the standard
weight-only recipe: activations stay bf16, the MXU consumes dequantized bf16
tiles — see kernels/matmul_q.py).  Norm weights and the embedding table stay
bf16 (the embedding is a gather, not a matmul); for tied-embedding models a
quantized ``lm_head`` copy is materialized so the vocab projection still runs
int8.  MoE expert banks are currently kept bf16 (per-expert gather path).
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


def _quantize_layers(layers: dict, cfg: ModelConfig, pad_to: int) -> dict:
    """Quantize the matmul weights of a layer-stack dict IN PLACE.

    The input dict is mutated so each bf16 weight stack is released from HBM
    as soon as its int8 replacement exists (quantizing an 8-16GB model on a
    16GB chip would otherwise OOM on the transient double-residency)."""
    for key in _MATMUL_KEYS:
        if key not in layers:
            continue
        if cfg.is_moe and key in ("gate", "up", "down"):
            continue  # expert banks stay bf16 for now (gather path)
        w = layers.pop(key)
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


def quantize_draft_params(params: dict, cfg: DraftConfig, pad_to: int = 512) -> dict:
    """Quantize a draft param pytree (consumes the input, see above)."""
    params["layers"] = _quantize_layers(params["layers"], cfg.model, pad_to)
    w = params.pop("fc")
    params["fc"] = jax.block_until_ready(quantize_weight(w, pad_to))
    del w
    return params
