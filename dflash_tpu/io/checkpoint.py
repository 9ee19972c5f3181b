"""Orbax-backed parameter checkpoints + weight-quantization cache.

The reference never saves anything (SURVEY §5 checkpoint row: models are
``from_pretrained``-loaded, benchmarks are not resumable).  The TPU build adds
the one checkpointing facility an inference engine wants: a cache of the
*quantized* parameter pytree, so the bf16->int8 quantization pass (minutes for
a 30B MoE) runs once per checkpoint and every later engine start streams the
int8 arrays straight from disk.

Pytrees may contain custom nodes (``ops.linear.QTensor``); the treedef — which
carries each QTensor's static logical width — is pickled next to the orbax
array store, so ``load_params`` reconstructs the exact structure without a
template.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Callable

import jax

_ARRAYS = "arrays"
_TREEDEF = "treedef.pkl"


def save_params(path: str | Path, params) -> None:
    """Save any parameter pytree (dense or QTensor-quantized) under ``path``."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree.flatten(params)
    flat = {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / _ARRAYS, flat, force=True)
    (path / _TREEDEF).write_bytes(pickle.dumps(treedef))


def load_params(path: str | Path):
    """Restore a pytree saved by :func:`save_params`."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    treedef = pickle.loads((path / _TREEDEF).read_bytes())
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path / _ARRAYS)
    leaves = [restored[f"leaf_{i}"] for i in range(treedef.num_leaves)]
    return jax.tree.unflatten(treedef, leaves)


def exists(path: str | Path) -> bool:
    path = Path(path)
    return (path / _TREEDEF).exists()


def cached_params(path: str | Path, build: Callable[[], object]):
    """Return params from the cache at ``path``, building + saving on miss.

    Typical use: ``cached_params(ckpt_dir, lambda: quantize_target_params(
    load_target_params(hf_dir, cfg), cfg))`` — the expensive load+quantize
    runs only when the cache is cold.
    """
    if exists(path):
        return load_params(path)
    params = build()
    save_params(path, params)
    return params
