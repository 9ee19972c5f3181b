"""Tiled causal flash prefill kernel (kernels/prefill_flash.py) vs the XLA
prefill attention — numerics and full forward_prefill integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.kernels.prefill_flash import flash_prefill_attention
from dflash_tpu.ops.attention import gqa_attention


@pytest.mark.parametrize("S,nh,nkv", [(256, 32, 8), (512, 8, 4), (128, 4, 4)])
def test_matches_xla_causal(S, nh, nkv):
    d = 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, S, nh, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, S, nkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, S, nkv, d)), jnp.float32)
    scale = d ** -0.5
    causal = jnp.tril(jnp.ones((S, S), bool))
    ref = gqa_attention(q, k, v, causal, scale)
    out = flash_prefill_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_vmap_lane_folding():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((3, 1, 256, 8, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 1, 256, 4, 128)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((3, 1, 256, 4, 128)), jnp.float32)
    scale = 128 ** -0.5
    out = jax.vmap(
        lambda a, b, c: flash_prefill_attention(a, b, c, scale, interpret=True)
    )(q, k, v)
    causal = jnp.tril(jnp.ones((256, 256), bool))
    for i in range(3):
        ref = gqa_attention(q[i], k[i], v[i], causal, scale)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref), atol=5e-5)


def test_unsupported_shapes_fall_back():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 48, 4, 16)), jnp.float32)  # d=16
    k = jnp.asarray(rng.standard_normal((1, 48, 2, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 48, 2, 16)), jnp.float32)
    causal = jnp.tril(jnp.ones((48, 48), bool))
    ref = gqa_attention(q, k, v, causal, 0.25)
    out = flash_prefill_attention(q, k, v, 0.25, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_forward_prefill_flash_matches_xla():
    """Full forward_prefill through the kernel: hidden, taps and K/V rows
    identical to the XLA path (so the KV cache the prefill seeds — and the
    draft features — are unchanged)."""
    from dflash_tpu.core.config import tiny_target_config
    from dflash_tpu.models import qwen3

    tcfg = tiny_target_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        head_dim=128, num_hidden_layers=2,
    )
    params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
    rng = np.random.default_rng(3)
    S = 256
    ids = jnp.asarray(rng.integers(1, tcfg.vocab_size - 2, (1, S)))
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    emb = qwen3.embed(params, ids)
    rx = qwen3.forward_prefill(params, tcfg, emb, pos, tap_ids=(1,), attn_impl="xla")
    rf = qwen3.forward_prefill(params, tcfg, emb, pos, tap_ids=(1,), attn_impl="flash")
    np.testing.assert_allclose(np.asarray(rf.hidden), np.asarray(rx.hidden),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rf.taps), np.asarray(rx.taps),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rf.k), np.asarray(rx.k), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rf.v), np.asarray(rx.v), atol=1e-5)
