"""Orbax checkpoint roundtrip: dense and QTensor-quantized parameter pytrees,
plus the build-once quantization cache (SURVEY §5 checkpoint row)."""

import jax
import jax.numpy as jnp
import numpy as np

from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.io.checkpoint import cached_params, exists, load_params, save_params
from dflash_tpu.models import qwen3
from dflash_tpu.quant import quantize_target_params


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_dense_roundtrip(tmp_path):
    tcfg = tiny_target_config()
    params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
    save_params(tmp_path / "ck", params)
    restored = load_params(tmp_path / "ck")
    _assert_tree_equal(params, restored)


def test_quantized_roundtrip_preserves_qtensor(tmp_path):
    tcfg = tiny_target_config()
    params = quantize_target_params(
        qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.bfloat16), tcfg
    )
    save_params(tmp_path / "ck", params)
    restored = load_params(tmp_path / "ck")
    _assert_tree_equal(params, restored)
    # structure (incl. QTensor static widths) must survive
    assert jax.tree.structure(params) == jax.tree.structure(restored)
    # and the restored params must drive the model identically
    ids = jnp.arange(8, dtype=jnp.int32)[None, :]
    h1 = qwen3.lm_head(params, qwen3.embed(params, ids))
    h2 = qwen3.lm_head(restored, qwen3.embed(restored, ids))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_cached_params_builds_once(tmp_path):
    calls = []

    def build():
        calls.append(1)
        return {"w": jnp.arange(6.0).reshape(2, 3)}

    p1 = cached_params(tmp_path / "q", build)
    assert exists(tmp_path / "q")
    p2 = cached_params(tmp_path / "q", build)
    assert len(calls) == 1
    _assert_tree_equal(p1, p2)
