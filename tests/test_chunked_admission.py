"""Chunk-interleaved admission prefill (the serving role of SGLang's chunked
prefill, reference benchmark_sglang.py:436-447): a long admission's prompt
prefix is prefilled in chunk-sized dispatches interleaved between decode
windows — running lanes keep decoding while the new request prefills, and
the admitted request's tokens are identical to a one-shot prefill."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.engine.batching import ContinuousBatchingEngine, EngineConfig
from dflash_tpu.models import dflash_draft, qwen3

DTYPE = jnp.float32


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
        num_lanes=kw.pop("num_lanes", 2),
        max_new_tokens=kw.pop("max_new_tokens", 12),
        block_size=4, prompt_cap=32, prompt_bucket=16, **kw,
    )
    return ContinuousBatchingEngine(tcfg, dcfg, t_params, d_params, cfg)


LONG_PROMPT = np.arange(3, 23, dtype=np.int32)  # 20 tokens -> p0=16 at chunk 8


def test_chunked_admission_token_parity(models):
    """A chunk-admitted request must produce byte-identical tokens to the
    one-shot prefill admission."""
    ref = _engine(models)
    a = ref.submit(LONG_PROMPT)
    ref.run_until_drained()

    eng = _engine(models, admission_chunk=8)
    b = eng.submit(LONG_PROMPT)
    eng.run_until_drained()
    assert b.error is None
    np.testing.assert_array_equal(a.output_ids, b.output_ids)


def test_chunked_admission_with_busy_lanes(models):
    """Chunk-admit while another lane decodes: both outputs match their solo
    runs (interleaving corrupts nothing)."""
    solo = _engine(models)
    ra = solo.submit(np.asarray([5, 6, 7]))
    solo.run_until_drained()
    solo2 = _engine(models)
    rb = solo2.submit(LONG_PROMPT)
    solo2.run_until_drained()

    eng = _engine(models, admission_chunk=8, max_new_tokens=24)
    a = eng.submit(np.asarray([5, 6, 7]), max_new_tokens=12)
    eng.step()  # a admitted and decoding
    b = eng.submit(LONG_PROMPT, max_new_tokens=12)
    eng.run_until_drained()
    assert a.error is None and b.error is None
    np.testing.assert_array_equal(a.output_ids, ra.output_ids)
    np.testing.assert_array_equal(b.output_ids, rb.output_ids)


def test_decode_advances_while_admission_in_flight(models):
    """The point of the feature: decode windows keep dispatching while the
    long admission prefills chunk by chunk."""
    eng = _engine(models, admission_chunk=4, max_new_tokens=24)
    a = eng.submit(np.asarray([5, 6, 7]), max_new_tokens=24)
    eng.step()  # a active
    c_before = eng.cycle_count
    b = eng.submit(LONG_PROMPT, max_new_tokens=8)  # p0=16 -> 4 chunks
    windows_during_admission = 0
    for _ in range(100):
        eng.step()
        if eng._prefill_tasks:
            windows_during_admission += 1
        else:
            break
    assert windows_during_admission >= 3, "admission should span several windows"
    assert eng.cycle_count > c_before, "decode advanced during admission"
    eng.run_until_drained()
    assert a.error is None and b.error is None
    assert b.output_ids is not None and a.meta_info["completion_tokens"] == 24


def test_abort_during_chunked_admission(models):
    eng = _engine(models, admission_chunk=4, max_new_tokens=24)
    a = eng.submit(np.asarray([5, 6, 7]), max_new_tokens=24)
    eng.step()
    b = eng.submit(LONG_PROMPT, max_new_tokens=8)
    # step until the task is in flight, then abort it
    for _ in range(50):
        eng.step()
        if eng._prefill_tasks:
            break
    assert eng._prefill_tasks
    assert eng.abort(b.rid) is True
    eng.run_until_drained()
    assert b.meta_info["finish_reason"]["type"] == "abort"
    assert all(l not in eng._lane_reserved for l in range(eng.cfg.num_lanes))
    assert a.error is None and a.meta_info["completion_tokens"] == 24


def test_chunked_admission_resumes_from_prefix_cache(models):
    """A cached prefix chunk-aligns and seeds the scratch: fewer chunk
    dispatches, same tokens."""
    ref = _engine(models)
    want = ref.submit(LONG_PROMPT)
    ref.run_until_drained()

    eng = _engine(models, admission_chunk=8, prefix_cache_mb=64)
    warm = eng.submit(LONG_PROMPT)  # populates the cache (chunked itself)
    eng.run_until_drained()
    h0 = eng._prefix_cache.hits
    again = eng.submit(LONG_PROMPT)
    eng.run_until_drained()
    assert eng._prefix_cache.hits > h0
    np.testing.assert_array_equal(want.output_ids, warm.output_ids)
    np.testing.assert_array_equal(want.output_ids, again.output_ids)


def test_short_prompts_bypass_chunking(models):
    eng = _engine(models, admission_chunk=16)
    r = eng.submit(np.asarray([5, 6, 7]))  # p0 = 0 -> direct path
    eng.run_until_drained()
    assert r.error is None and not eng._prefill_tasks
