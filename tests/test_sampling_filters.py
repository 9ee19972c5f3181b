"""Per-request top-k / top-p sampling (serving sampling_params parity).

The reference's serving client sends ``sampling_params = {temperature,
top_p, top_k, max_new_tokens}`` per request (reference
benchmark_sglang.py:42-47); SGLang applies the filters server-side.  Here
the filters run on-device inside the speculative cycle
(ops/sampling.sample_topk_topp, resolved within a static top-64 candidate
pool) and per-lane in the continuous-batching engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.engine.batching import ContinuousBatchingEngine, EngineConfig
from dflash_tpu.models import dflash_draft, qwen3
from dflash_tpu.ops.sampling import sample, sample_topk_topp

DTYPE = jnp.float32


# ---------------------------------------------------------------------------
# unit: the filtered sampler
# ---------------------------------------------------------------------------

def _logits(vocab=128, batch=1, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (batch, vocab)) * 3.0


def test_greedy_ignores_filters():
    logits = _logits()
    key = jax.random.PRNGKey(1)
    got = sample_topk_topp(logits, 0.0, key, jnp.int32(5), jnp.float32(0.5))
    np.testing.assert_array_equal(np.asarray(got), np.argmax(np.asarray(logits), -1))


def test_noop_filters_match_unfiltered_sample():
    """top_k<=0 and top_p>=1 must reproduce sample() bit-for-bit (same key)."""
    logits = _logits(batch=8)
    for seed in range(5):
        key = jax.random.PRNGKey(seed)
        base = sample(logits, 0.9, key)
        filt = sample_topk_topp(logits, 0.9, key, jnp.int32(0), jnp.float32(1.0))
        np.testing.assert_array_equal(np.asarray(base), np.asarray(filt))


def test_top_k_one_is_argmax_at_any_temperature():
    logits = _logits(batch=4)
    for seed in range(5):
        got = sample_topk_topp(
            logits, 5.0, jax.random.PRNGKey(seed), jnp.int32(1), jnp.float32(1.0)
        )
        np.testing.assert_array_equal(np.asarray(got), np.argmax(np.asarray(logits), -1))


def test_top_k_restricts_support():
    logits = _logits(batch=1)
    top2 = set(np.argsort(np.asarray(logits)[0])[-2:].tolist())
    seen = set()
    for seed in range(200):
        got = sample_topk_topp(
            logits, 2.0, jax.random.PRNGKey(seed), jnp.int32(2), jnp.float32(1.0)
        )
        seen.add(int(np.asarray(got)[0]))
    assert seen <= top2
    assert len(seen) == 2  # at T=2 both survivors should actually appear


def test_top_p_restricts_to_nucleus():
    # construct a distribution where the nucleus at p=0.5 is exactly the top
    # token: probs ~ [0.7, 0.1, ...] at T=1
    v = np.full((1, 64), -3.0, np.float32)
    v[0, 7] = 3.0
    logits = jnp.asarray(v)
    for seed in range(50):
        got = sample_topk_topp(
            logits, 1.0, jax.random.PRNGKey(seed), jnp.int32(0), jnp.float32(0.5)
        )
        assert int(np.asarray(got)[0]) == 7


def test_top_p_keeps_first_token_even_for_tiny_p():
    logits = _logits(batch=3)
    got = sample_topk_topp(
        logits, 1.0, jax.random.PRNGKey(0), jnp.int32(0), jnp.float32(1e-6)
    )
    np.testing.assert_array_equal(np.asarray(got), np.argmax(np.asarray(logits), -1))


def test_top_k_beyond_pool_clamps_not_crashes():
    logits = _logits(vocab=256)
    got = sample_topk_topp(
        logits, 1.0, jax.random.PRNGKey(0), jnp.int32(200), jnp.float32(1.0)
    )
    assert 0 <= int(np.asarray(got)[0]) < 256


def test_statistical_frequencies_within_nucleus():
    """Within the kept set, relative frequencies track the renormalized
    distribution (chi-square-free sanity: top token sampled most often)."""
    v = np.asarray([[2.0, 1.5, 1.0, -10.0, -10.0, -10.0]], np.float32)
    logits = jnp.asarray(np.pad(v, ((0, 0), (0, 58)), constant_values=-30.0))
    counts = np.zeros(64)
    keys = jax.random.split(jax.random.PRNGKey(0), 400)
    sampled = jax.vmap(
        lambda k: sample_topk_topp(logits, 1.0, k, jnp.int32(3), jnp.float32(1.0))[0]
    )(keys)
    for t in np.asarray(sampled):
        counts[int(t)] += 1
    assert counts[:3].sum() == 400  # support is exactly the top-3
    assert counts[0] > counts[2]  # ordering preserved


# ---------------------------------------------------------------------------
# engine: per-lane filters in the continuous-batching engine
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def models():
    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=4, num_layers=1)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, DTYPE)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, DTYPE)
    return tcfg, dcfg, t_params, d_params


def _engine(models, **kw):
    tcfg, dcfg, t_params, d_params = models
    cfg = EngineConfig(
        num_lanes=kw.pop("num_lanes", 3), max_new_tokens=12, block_size=4,
        prompt_cap=32, prompt_bucket=16, **kw,
    )
    return ContinuousBatchingEngine(tcfg, dcfg, t_params, d_params, cfg)


def test_submit_rejects_filters_without_flag(models):
    eng = _engine(models, sampling_filters=False)
    with pytest.raises(ValueError, match="sampling_filters"):
        eng.submit(np.asarray([5, 6, 7]), temperature=0.8, top_k=5)


def test_submit_normalizes_sglang_greedy_defaults(models):
    """The reference client's greedy request (T=0, top_k=1, top_p=1,
    benchmark_sglang.py:42-47) must be accepted by a filter-less engine."""
    eng = _engine(models, sampling_filters=False)
    req = eng.submit(np.asarray([5, 6, 7]), temperature=0.0, top_k=1, top_p=1.0)
    eng.run_until_drained()
    assert req.error is None and req.meta_info["completion_tokens"] >= 1


def test_top_k_one_lane_matches_greedy_lane(models):
    """A top_k=1 high-temperature lane and a T=0 lane decode identically,
    concurrently (per-lane filters, not engine-wide)."""
    eng = _engine(models, sampling_filters=True)
    prompt = np.asarray([9, 4, 11, 3])
    r_greedy = eng.submit(prompt, temperature=0.0)
    # top_k normalization maps top_k=1 to greedy at submit();
    # exercise the device path with top_k=2, top_p tiny => argmax-by-nucleus
    r_filt = eng.submit(prompt, temperature=1.5, top_k=2, top_p=1e-6)
    eng.run_until_drained()
    assert r_greedy.error is None and r_filt.error is None
    np.testing.assert_array_equal(r_greedy.output_ids, r_filt.output_ids)


def test_filtered_engine_greedy_matches_unfiltered_engine(models):
    """sampling_filters=True must not perturb greedy traffic."""
    prompt = np.asarray([5, 6, 7, 8])
    a = _engine(models, sampling_filters=False)
    ra = a.submit(prompt)
    a.run_until_drained()
    b = _engine(models, sampling_filters=True)
    rb = b.submit(prompt)
    b.run_until_drained()
    np.testing.assert_array_equal(ra.output_ids, rb.output_ids)


def test_filters_with_int8_kv_cache(models):
    """Per-lane filters compose with the int8 KV cache: the tight-nucleus
    hot lane still reproduces the greedy lane under kv_quant."""
    eng = _engine(models, sampling_filters=True, kv_quant=True)
    prompt = np.asarray([9, 4, 11, 3])
    g = eng.submit(prompt, temperature=0.0)
    f = eng.submit(prompt, temperature=1.5, top_k=2, top_p=1e-6)
    eng.run_until_drained()
    assert g.error is None and f.error is None
    np.testing.assert_array_equal(g.output_ids, f.output_ids)


def test_spec_engine_generate_filters(models):
    """Single-request SpecEngine path honors top_k/top_p."""
    from dflash_tpu.spec.engine import SpecEngine

    tcfg, dcfg, t_params, d_params = models
    eng = SpecEngine(
        tcfg, dcfg, t_params, d_params, max_new_tokens=12,
        prompt_cap=32, prompt_bucket=16,
    )
    prompt = np.asarray([9, 4, 11, 3])
    greedy = eng.generate(prompt, temperature=0.0)
    filt = eng.generate(prompt, temperature=2.0, top_k=2, top_p=1e-6)
    np.testing.assert_array_equal(greedy.output_ids, filt.output_ids)
