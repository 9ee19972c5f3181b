"""Frontier-bounded Pallas verify attention vs the XLA reference (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dflash_tpu.kernels.attention import verify_attention
from dflash_tpu.models.qwen3 import causal_mask
from dflash_tpu.ops.attention import gqa_attention


def _run_interpret(q, k_cache, v_cache, start, block, ck):
    return verify_attention(
        q, k_cache, v_cache, jnp.int32(start), block=block, ck=ck, interpret=True
    )


@pytest.mark.parametrize("start", [0, 3, 100, 112])
def test_verify_attention_matches_reference(start):
    rng = np.random.default_rng(0)
    B, nh, n_kv, d, T, ck = 8, 8, 4, 128, 256, 128
    q = jnp.asarray(rng.normal(size=(1, B, nh, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, T, n_kv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, T, n_kv, d)).astype(np.float32))

    got = _run_interpret(q, k, v, start, B, ck)

    q_positions = start + jnp.arange(B, dtype=jnp.int32)
    mask = causal_mask(q_positions, T)
    expect = gqa_attention(q, k, v, mask, d ** -0.5)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), rtol=2e-5, atol=2e-5
    )


def test_verify_attention_ignores_rows_beyond_frontier():
    """Garbage K/V beyond start+B must not change the result (bounded read)."""
    rng = np.random.default_rng(1)
    B, nh, n_kv, d, T, ck = 4, 4, 2, 128, 256, 128
    start = 60
    q = jnp.asarray(rng.normal(size=(1, B, nh, d)).astype(np.float32))
    k = rng.normal(size=(1, T, n_kv, d)).astype(np.float32)
    v = rng.normal(size=(1, T, n_kv, d)).astype(np.float32)
    k2, v2 = k.copy(), v.copy()
    k2[:, start + B + ck:] = 1e9  # garbage in chunks the kernel must not read
    v2[:, start + B + ck:] = np.nan

    a = _run_interpret(q, jnp.asarray(k), jnp.asarray(v), start, B, ck)
    b = _run_interpret(q, jnp.asarray(k2), jnp.asarray(v2), start, B, ck)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(b)).all()
