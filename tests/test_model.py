"""Target-model invariants: incremental KV decode == full-sequence forward,
tap extraction ordering, and robustness to garbage beyond the frontier."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.cache.kv import init_kv_cache
from dflash_tpu.core.config import tiny_target_config
from dflash_tpu.models import qwen3

pytestmark = pytest.mark.smoke  # sub-2-minute CI tier (VERDICT r4 weak #5)

DTYPE = jnp.float32


def _full_forward(params, cfg, ids, total_len, tap_ids=()):
    S = ids.shape[1]
    kv = init_kv_cache(cfg, 1, total_len, DTYPE)
    positions = jnp.arange(S, dtype=jnp.int32)[None, :]
    mask = qwen3.causal_mask(positions[0], total_len)
    return qwen3.forward(
        params, cfg, qwen3.embed(params, ids), positions, kv,
        jnp.zeros((), jnp.int32), mask, tap_ids=tap_ids,
    )


def test_incremental_decode_matches_full_forward():
    cfg = tiny_target_config()
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg, DTYPE)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 10)), jnp.int32)
    total_len = 16

    full = _full_forward(params, cfg, ids, total_len)
    full_logits = np.asarray(qwen3.lm_head(params, full.hidden))

    # Prefill 4 tokens, then decode chunks of 3, 2, 1 through the cache.
    kv = init_kv_cache(cfg, 1, total_len, DTYPE)
    pos_all = jnp.arange(total_len, dtype=jnp.int32)
    chunks = [(0, 4), (4, 3), (7, 2), (9, 1)]
    outs = []
    for (startpos, n) in chunks:
        seg = ids[:, startpos : startpos + n]
        positions = pos_all[startpos : startpos + n][None, :]
        mask = qwen3.causal_mask(positions[0], total_len)
        res = qwen3.forward(
            params, cfg, qwen3.embed(params, seg), positions, kv,
            jnp.int32(startpos), mask,
        )
        kv = res.kv
        outs.append(np.asarray(qwen3.lm_head(params, res.hidden)))
    inc_logits = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(inc_logits, full_logits, rtol=2e-4, atol=2e-4)


def test_taps_match_manual_layer_outputs():
    """Tap at id L means output of layer L (= hidden_states[L+1] in HF terms,
    reference model/utils.py:16-25), concatenated in tap order."""
    cfg = tiny_target_config(num_hidden_layers=3)
    params = qwen3.init_params(jax.random.PRNGKey(1), cfg, DTYPE)
    ids = jnp.asarray([[3, 5, 7]], jnp.int32)

    res_02 = _full_forward(params, cfg, ids, 8, tap_ids=(0, 2))
    res_2 = _full_forward(params, cfg, ids, 8, tap_ids=(2,))
    H = cfg.hidden_size
    # Second tap of (0,2) equals the only tap of (2,).
    np.testing.assert_allclose(
        np.asarray(res_02.taps[..., H:]), np.asarray(res_2.taps), rtol=1e-5, atol=1e-6
    )
    # Tap of the last layer is the pre-final-norm hidden: applying final norm
    # to it reproduces res.hidden.
    from dflash_tpu.ops.norms import rms_norm

    relast = rms_norm(res_2.taps, params["final_norm"], cfg.rms_norm_eps)
    np.testing.assert_allclose(
        np.asarray(relast), np.asarray(res_2.hidden), rtol=1e-5, atol=1e-6
    )


def test_stale_cache_rows_beyond_frontier_are_invisible():
    cfg = tiny_target_config()
    params = qwen3.init_params(jax.random.PRNGKey(2), cfg, DTYPE)
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    total_len = 12

    kv_clean = init_kv_cache(cfg, 1, total_len, DTYPE)
    kv_dirty = init_kv_cache(cfg, 1, total_len, DTYPE)
    kv_dirty = kv_dirty._replace(
        k=kv_dirty.k.at[:, :, 6:].set(37.0), v=kv_dirty.v.at[:, :, 6:].set(-37.0)
    )
    positions = jnp.arange(4, dtype=jnp.int32)[None, :]
    mask = qwen3.causal_mask(positions[0], total_len)
    out_clean = qwen3.forward(
        params, cfg, qwen3.embed(params, ids), positions, kv_clean,
        jnp.zeros((), jnp.int32), mask,
    )
    out_dirty = qwen3.forward(
        params, cfg, qwen3.embed(params, ids), positions, kv_dirty,
        jnp.zeros((), jnp.int32), mask,
    )
    np.testing.assert_array_equal(
        np.asarray(out_clean.hidden), np.asarray(out_dirty.hidden)
    )
