"""Per-request top-k / top-p sampling (serving sampling_params parity).

The reference's serving client sends ``sampling_params = {temperature,
top_p, top_k, max_new_tokens}`` per request (reference
benchmark_sglang.py:42-47); SGLang applies the filters server-side.  Here
the filters run on-device inside the speculative cycle
(ops/sampling.sample_topk_topp): the keep set is EXACT for any top_k/top_p
regardless of the static ``topk_pool`` (bit-space value thresholds; the pool
only seeds the guess), applied per-lane in the continuous-batching engine.
submit() accepts any top_k < vocab like SGLang.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.engine.batching import ContinuousBatchingEngine, EngineConfig
from dflash_tpu.models import dflash_draft, qwen3
from dflash_tpu.ops.sampling import (
    filtered_logits_topk_topp,
    sample,
    sample_topk_topp,
)

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
    fn = jax.jit(sample_topk_topp)
    for seed in range(5):
        key = jax.random.PRNGKey(seed)
        base = sample(logits, 0.9, key)
        filt = fn(logits, 0.9, key, jnp.int32(0), jnp.float32(1.0))
        np.testing.assert_array_equal(np.asarray(base), np.asarray(filt))


def test_top_k_one_is_argmax_at_any_temperature():
    logits = _logits(batch=4)
    fn = jax.jit(sample_topk_topp)
    for seed in range(5):
        got = fn(logits, 5.0, jax.random.PRNGKey(seed), jnp.int32(1), jnp.float32(1.0))
        np.testing.assert_array_equal(np.asarray(got), np.argmax(np.asarray(logits), -1))


def test_top_k_restricts_support():
    logits = _logits(batch=1)
    top2 = set(np.argsort(np.asarray(logits)[0])[-2:].tolist())
    seen = set()
    # jit once, then 200 cheap executions — the eager per-call dispatch of
    # the threshold search was 118 s of CI wall-clock for this test alone
    fn = jax.jit(sample_topk_topp)
    for seed in range(200):
        got = fn(logits, 2.0, jax.random.PRNGKey(seed), jnp.int32(2), jnp.float32(1.0))
        seen.add(int(np.asarray(got)[0]))
    assert seen <= top2
    assert len(seen) == 2  # at T=2 both survivors should actually appear


def test_top_p_restricts_to_nucleus():
    # construct a distribution where the nucleus at p=0.5 is exactly the top
    # token: probs ~ [0.7, 0.1, ...] at T=1
    v = np.full((1, 64), -3.0, np.float32)
    v[0, 7] = 3.0
    logits = jnp.asarray(v)
    fn = jax.jit(sample_topk_topp)
    for seed in range(50):
        got = fn(logits, 1.0, jax.random.PRNGKey(seed), jnp.int32(0), jnp.float32(0.5))
        assert int(np.asarray(got)[0]) == 7


def test_top_p_keeps_first_token_even_for_tiny_p():
    logits = _logits(batch=3)
    got = sample_topk_topp(
        logits, 1.0, jax.random.PRNGKey(0), jnp.int32(0), jnp.float32(1e-6)
    )
    np.testing.assert_array_equal(np.asarray(got), np.argmax(np.asarray(logits), -1))


def test_top_k_beyond_pool_clamps_not_crashes():
    """k far beyond the pool is EXACT (the pool only seeds the threshold
    guess; the bisection resolves the true rank-k threshold) and must
    execute without error."""
    logits = _logits(vocab=256)
    got = sample_topk_topp(
        logits, 1.0, jax.random.PRNGKey(0), jnp.int32(200), jnp.float32(1.0)
    )
    assert 0 <= int(np.asarray(got)[0]) < 256


# ---------------------------------------------------------------------------
# exactness: the pool sampler == a full-sort sampler (VERDICT r2 missing #3)
# ---------------------------------------------------------------------------

def _full_sort_masked_logits(logits, temp, k, p):
    """Ground-truth joint top-k/top-p filter via a full-vocab sort: keep
    rank < k AND full-softmax cumulative-mass-before < p; everything else
    -inf.  numpy, no pools."""
    scaled = np.asarray(logits, np.float64) / max(temp, 1e-5)
    out = np.full_like(scaled, -np.inf, np.float32)
    V = scaled.shape[-1]
    k_eff = V if k <= 0 else min(k, V)
    for b in range(scaled.shape[0]):
        order = np.argsort(-scaled[b], kind="stable")
        svals = scaled[b][order]
        probs = np.exp(svals - (np.max(svals) + np.log(np.sum(np.exp(svals - np.max(svals))))))
        cum_before = np.cumsum(probs) - probs
        keep = (np.arange(V) < k_eff) & (cum_before < p)
        out[b][order[keep]] = scaled[b][order[keep]].astype(np.float32)
    return out


@pytest.mark.parametrize("top_k", [128, 1024])
def test_exact_wide_topk_matches_full_sort(top_k):
    """top_k in (64, pool]: the kept SET equals the full-sort reference's and
    the sampled token is bit-identical (same key, categorical over the same
    masked full-vocab logits) — no silent 64-candidate clamp."""
    pool = 1024
    logits = _logits(vocab=4096, batch=4, seed=3)
    temp = 0.8
    for p in (1.0, 0.98):
        got_mask = np.asarray(filtered_logits_topk_topp(
            logits.astype(jnp.float32), jnp.float32(temp), jnp.int32(top_k),
            jnp.float32(p), pool,
        ))
        want_mask = _full_sort_masked_logits(logits, temp, top_k, p)
        np.testing.assert_array_equal(
            np.isfinite(got_mask), np.isfinite(want_mask),
            err_msg=f"keep set differs (top_k={top_k}, p={p})",
        )
        keep = np.isfinite(want_mask)
        np.testing.assert_allclose(
            got_mask[keep], want_mask[keep], rtol=1e-6, atol=1e-6
        )
        # bit-identical sampling: same key, same masked logits
        key = jax.random.PRNGKey(7)
        got = sample_topk_topp(
            logits, temp, key, jnp.int32(top_k), jnp.float32(p), pool=pool
        )
        want = jax.random.categorical(key, jnp.asarray(got_mask), axis=-1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_topp_nucleus_normalized_over_full_vocab():
    """The nucleus mass must be the FULL softmax's, and the nucleus must be
    allowed to extend PAST the candidate pool (the round-2 pool-truncation
    limitation is gone): with a light head and a long distinct tail, the true
    p=0.9 nucleus spans hundreds of tokens and the filter keeps exactly
    those."""
    rng = np.random.default_rng(0)
    v = (rng.normal(size=(1, 2048)) * 0.01).astype(np.float32)  # distinct
    v[0, :4] += 5.0
    masked = np.asarray(filtered_logits_topk_topp(
        jnp.asarray(v), jnp.float32(1.0), jnp.int32(0), jnp.float32(0.9), 64
    ))
    want = _full_sort_masked_logits(v, 1.0, 0, 0.9)
    kept = int(np.isfinite(want).sum())
    assert kept > 64, "test needs a nucleus wider than the pool"
    np.testing.assert_array_equal(np.isfinite(masked), np.isfinite(want))
    # and a peaked head with p=0.9 keeps exactly the head
    w = np.full((1, 2048), -20.0, np.float32)
    w += (rng.normal(size=(1, 2048)) * 0.01).astype(np.float32)
    w[0, :2] = np.asarray([4.0, 3.0])
    masked = np.asarray(filtered_logits_topk_topp(
        jnp.asarray(w), jnp.float32(1.0), jnp.int32(0), jnp.float32(0.9), 64
    ))
    assert np.isfinite(masked).sum() == 2


def test_exact_thresholds_tie_handling():
    """Value ties straddling rank k keep ALL tied tokens (documented)."""
    v = np.full((1, 512), -10.0, np.float32)
    v[0, :8] = 2.0  # eight-way tie at the top
    masked = np.asarray(filtered_logits_topk_topp(
        jnp.asarray(v), jnp.float32(1.0), jnp.int32(4), jnp.float32(1.0), 64
    ))
    assert np.isfinite(masked[0, :8]).all()
    assert not np.isfinite(masked[0, 8:]).any()


def test_exact_topk_deep_rank_forces_bisection():
    """top_k far beyond the pool's reach (pool=8, k=100): the threshold
    bisection must still land the exact keep set."""
    rng = np.random.default_rng(1)
    v = rng.normal(size=(2, 4096)).astype(np.float32) * 3.0
    masked = np.asarray(filtered_logits_topk_topp(
        jnp.asarray(v), jnp.float32(1.0), jnp.int32(100), jnp.float32(1.0), 8
    ))
    want = _full_sort_masked_logits(v, 1.0, 100, 1.0)
    np.testing.assert_array_equal(np.isfinite(masked), np.isfinite(want))


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


def test_submit_accepts_topk_beyond_pool_exactly(models):
    """submit() accepts any top_k < vocab (SGLang accepts arbitrary
    sampling_params, reference benchmark_sglang.py:42-47) and the sample is
    EXACT regardless of the engine's pool: a narrow-pool engine (bisection
    path) and a wide-pool engine (threshold-guess path) produce identical
    tokens for the same seed, because the keep set is pool-independent."""
    tcfg = models[0]
    narrow = _engine(models, sampling_filters=True, topk_pool=8)
    wide = _engine(models, sampling_filters=True, topk_pool=128)
    prompt = np.asarray([5, 6, 7])
    k_wide = tcfg.vocab_size - 3  # far beyond the narrow pool
    r_n = narrow.submit(prompt, temperature=1.0, top_k=k_wide, seed=11)
    narrow.run_until_drained()
    r_w = wide.submit(prompt, temperature=1.0, top_k=k_wide, seed=11)
    wide.run_until_drained()
    assert r_n.error is None and r_w.error is None
    np.testing.assert_array_equal(r_n.output_ids, r_w.output_ids)
    # top_k >= vocab is a semantic no-op: accepted and normalized off
    r_off = narrow.submit(prompt, temperature=1.0, top_k=tcfg.vocab_size, seed=3)
    narrow.run_until_drained()
    assert r_off.error is None


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
