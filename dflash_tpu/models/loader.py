"""HF safetensors checkpoint loading into dflash_tpu param pytrees.

Supports the checkpoint layouts used by the reference model zoo:
  * Qwen3 dense / Llama targets (``model.layers.{i}...`` + ``lm_head``)
  * Qwen3-MoE targets (``mlp.gate`` router + ``mlp.experts.{e}...``)
  * z-lab DFlash draft checkpoints (``layers.{i}...`` + ``fc`` +
    ``hidden_norm`` + ``norm``, reference model/dflash.py:147-164)

Torch ``nn.Linear`` stores ``weight[out, in]``; our pytrees store the
transpose so matmuls read left-to-right, and per-layer tensors are stacked on
a leading layer axis for ``lax.scan``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np

from dflash_tpu.core.config import DraftConfig, ModelConfig


def _load_all_tensors(path: Path) -> Dict[str, "jnp.ndarray"]:
    from safetensors import safe_open

    files = sorted(path.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    tensors: Dict[str, jnp.ndarray] = {}
    for f in files:
        with safe_open(str(f), framework="flax") as sf:
            for name in sf.keys():
                tensors[name] = sf.get_tensor(name)
    return tensors


def _stack(tensors: Dict, fmt: str, L: int, transpose: bool = False, dtype=jnp.bfloat16):
    arrs = []
    for i in range(L):
        t = tensors[fmt.format(i=i)]
        if transpose:
            t = t.T
        arrs.append(t)
    return jnp.stack(arrs).astype(dtype)


def load_target_params(path: str | Path, cfg: ModelConfig, dtype=jnp.bfloat16) -> dict:
    """Load a Qwen3/Llama-family causal LM checkpoint."""
    path = Path(path)
    t = _load_all_tensors(path)
    L = cfg.num_hidden_layers
    p = "model."

    layers: dict = {
        "input_ln": _stack(t, p + "layers.{i}.input_layernorm.weight", L, dtype=dtype),
        "post_ln": _stack(t, p + "layers.{i}.post_attention_layernorm.weight", L, dtype=dtype),
        "wq": _stack(t, p + "layers.{i}.self_attn.q_proj.weight", L, transpose=True, dtype=dtype),
        "wk": _stack(t, p + "layers.{i}.self_attn.k_proj.weight", L, transpose=True, dtype=dtype),
        "wv": _stack(t, p + "layers.{i}.self_attn.v_proj.weight", L, transpose=True, dtype=dtype),
        "wo": _stack(t, p + "layers.{i}.self_attn.o_proj.weight", L, transpose=True, dtype=dtype),
    }
    if cfg.use_qk_norm:
        layers["q_norm"] = _stack(t, p + "layers.{i}.self_attn.q_norm.weight", L, dtype=dtype)
        layers["k_norm"] = _stack(t, p + "layers.{i}.self_attn.k_norm.weight", L, dtype=dtype)
    if cfg.is_moe:
        E = cfg.num_experts
        layers["router"] = _stack(t, p + "layers.{i}.mlp.gate.weight", L, transpose=True, dtype=dtype)
        for our, hf in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
            per_layer = []
            for i in range(L):
                per_layer.append(
                    jnp.stack(
                        [
                            t[f"{p}layers.{i}.mlp.experts.{e}.{hf}.weight"].T
                            for e in range(E)
                        ]
                    )
                )
            layers[our] = jnp.stack(per_layer).astype(dtype)
    else:
        layers["gate"] = _stack(t, p + "layers.{i}.mlp.gate_proj.weight", L, transpose=True, dtype=dtype)
        layers["up"] = _stack(t, p + "layers.{i}.mlp.up_proj.weight", L, transpose=True, dtype=dtype)
        layers["down"] = _stack(t, p + "layers.{i}.mlp.down_proj.weight", L, transpose=True, dtype=dtype)

    params = {
        "embed": t[p + "embed_tokens.weight"].astype(dtype),
        "layers": layers,
        "final_norm": t[p + "norm.weight"].astype(dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = t["lm_head.weight"].T.astype(dtype)
    return params


def load_draft_params(path: str | Path, cfg: DraftConfig, dtype=jnp.bfloat16) -> dict:
    """Load a z-lab DFlash draft checkpoint (reference model/dflash.py layout)."""
    path = Path(path)
    t = _load_all_tensors(path)
    m = cfg.model
    L = m.num_hidden_layers
    # Draft checkpoints have no "model." prefix (DFlashDraftModel is the root).
    p = "" if "layers.0.input_layernorm.weight" in t else "model."

    layers = {
        "input_ln": _stack(t, p + "layers.{i}.input_layernorm.weight", L, dtype=dtype),
        "post_ln": _stack(t, p + "layers.{i}.post_attention_layernorm.weight", L, dtype=dtype),
        "wq": _stack(t, p + "layers.{i}.self_attn.q_proj.weight", L, transpose=True, dtype=dtype),
        "wk": _stack(t, p + "layers.{i}.self_attn.k_proj.weight", L, transpose=True, dtype=dtype),
        "wv": _stack(t, p + "layers.{i}.self_attn.v_proj.weight", L, transpose=True, dtype=dtype),
        "wo": _stack(t, p + "layers.{i}.self_attn.o_proj.weight", L, transpose=True, dtype=dtype),
        "gate": _stack(t, p + "layers.{i}.mlp.gate_proj.weight", L, transpose=True, dtype=dtype),
        "up": _stack(t, p + "layers.{i}.mlp.up_proj.weight", L, transpose=True, dtype=dtype),
        "down": _stack(t, p + "layers.{i}.mlp.down_proj.weight", L, transpose=True, dtype=dtype),
    }
    if m.use_qk_norm:
        layers["q_norm"] = _stack(t, p + "layers.{i}.self_attn.q_norm.weight", L, dtype=dtype)
        layers["k_norm"] = _stack(t, p + "layers.{i}.self_attn.k_norm.weight", L, dtype=dtype)

    return {
        "layers": layers,
        "final_norm": t[p + "norm.weight"].astype(dtype),
        "fc": t[p + "fc.weight"].T.astype(dtype),
        "hidden_norm": t[p + "hidden_norm.weight"].astype(dtype),
    }
