"""Device mesh + sharding rules (the reference's 83-line NCCL shim,
distributed.py, replaced by a first-class GSPMD layer).

Axes (any may be size 1; the mesh always carries all four so PartitionSpecs
are uniform):
  - ``dp``  — data parallel over concurrent requests (replaces the
    reference's torchrun rank-striding of prompts, benchmark.py:445).
  - ``sp``  — sequence parallel for long-context *prefill* (ring attention
    over ICI, parallel/ring.py).  Decode blocks are tiny, so sp is scoped to
    prefill; params are replicated over sp.
  - ``ep``  — expert parallel: MoE expert tables (Qwen3-Coder-30B-A3B) are
    sharded over (ep, tp); attention/dense params are replicated over ep.
  - ``tp``  — tensor parallel, Megatron-style: attention heads and MLP
    intermediate column/row-sharded; KV cache sharded on the kv-head axis.
    The reference gets TP only via SGLang (benchmark_sglang.py:271-276).

All collectives (all-gather after column-sharded matmuls, reduce-scatter/
all-reduce after row-sharded ones, all-to-all for experts, ppermute for the
sp ring) are emitted by XLA/GSPMD from these shardings — no hand-written
NCCL-style calls.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dflash_tpu.core.config import DraftConfig, ModelConfig

AXES = ("dp", "sp", "ep", "tp")


def make_mesh(
    dp: int = 1,
    tp: int = 1,
    sp: int = 1,
    ep: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * sp * ep * tp
    if n > len(devices):
        raise ValueError(f"mesh dp{dp}xsp{sp}xep{ep}xtp{tp} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(dp, sp, ep, tp)
    return Mesh(dev_array, AXES)


def _layer_specs(cfg: ModelConfig) -> dict:
    specs = {
        "input_ln": P(),
        "post_ln": P(),
        "wq": P(None, None, "tp"),
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
    }
    if cfg.use_qk_norm:
        specs["q_norm"] = P()
        specs["k_norm"] = P()
    if cfg.is_moe:
        specs.update(
            router=P(),
            gate=P(None, ("ep", "tp"), None, None),  # experts over ep x tp
            up=P(None, ("ep", "tp"), None, None),
            down=P(None, ("ep", "tp"), None, None),
        )
    else:
        specs.update(
            gate=P(None, None, "tp"),
            up=P(None, None, "tp"),
            down=P(None, "tp", None),
        )
    return specs


def target_param_specs(cfg: ModelConfig) -> dict:
    specs = {
        "embed": P(),  # replicated: used for token gather + (tied) lm_head
        "layers": _layer_specs(cfg),
        "final_norm": P(),
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, "tp")  # vocab-sharded logits
    return specs


def draft_param_specs(cfg: DraftConfig) -> dict:
    return {
        "layers": _layer_specs(cfg.model),
        "final_norm": P(),
        "fc": P(None, "tp"),
        "hidden_norm": P(),
    }


def _to_shardings(specs, mesh: Mesh):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def target_param_shardings(cfg: ModelConfig, mesh: Mesh):
    return _to_shardings(target_param_specs(cfg), mesh)


def draft_param_shardings(cfg: DraftConfig, mesh: Mesh):
    return _to_shardings(draft_param_specs(cfg), mesh)


def shard_params(params, shardings):
    """Place a params pytree onto the mesh according to ``shardings``.

    INT8 ``QTensor`` params are one node in ``params`` but one sharding leaf
    in ``shardings``: the same spec is applied to both the int8 values and
    the (rank-matched, size-1 reduced axis) scales."""
    from dflash_tpu.ops.linear import QTensor

    def put(p, s):
        if isinstance(p, QTensor):
            # Scales keep size-1 where the quantization reduced an axis; a
            # sharded size-1 axis is indivisible, so those revert to None.
            parts = list(s.spec) + [None] * (p.scale.ndim - len(s.spec))
            sspec = P(*[
                None if p.scale.shape[i] == 1 else parts[i]
                for i in range(p.scale.ndim)
            ])
            return QTensor(
                jax.device_put(p.q, s),
                jax.device_put(p.scale, NamedSharding(s.mesh, sspec)),
                p.n,
            )
        return jax.device_put(p, s)

    return jax.tree.map(put, params, shardings, is_leaf=lambda x: isinstance(x, QTensor))
