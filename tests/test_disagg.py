"""Disaggregated prefill/decode (engine/disagg.py).

The prefill role runs on a SECOND CPU device of the 8-device test mesh and
ships (kv_rows, taps) to the decode engine — the same topology shape as a
v5e-2 prefill/decode split, with the interconnect replaced by host memory.
Reference equivalent: the serving role SGLang's deployment provides
(reference benchmark_sglang.py:436-447)."""

import queue

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.engine import ContinuousBatchingEngine, EngineConfig, PrefillWorker
from dflash_tpu.models import dflash_draft, qwen3

DTYPE = jnp.float32


@pytest.fixture(scope="module")
def models():
    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=4, num_layers=1)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, DTYPE)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, DTYPE)
    return tcfg, dcfg, t_params, d_params


def _mk_engine(models, *, disagg: bool, kv_quant: bool = False, lanes: int = 3):
    tcfg, dcfg, t_params, d_params = models
    worker = None
    if disagg:
        devs = jax.devices()
        assert len(devs) >= 2, "test mesh must expose >= 2 CPU devices"
        worker = PrefillWorker(
            tcfg, dcfg, t_params,
            prefill_device=devs[1], decode_device=devs[0], kv_quant=kv_quant,
        )
    eng = ContinuousBatchingEngine(
        tcfg, dcfg, t_params, d_params,
        EngineConfig(num_lanes=lanes, max_new_tokens=12, block_size=4,
                     prompt_cap=64, prompt_bucket=16, kv_quant=kv_quant),
        prefill_worker=worker,
    )
    return eng, worker


def _long_prompt(tcfg, n=40, seed=3):
    return np.random.default_rng(seed).integers(
        0, tcfg.vocab_size - 2, size=(n,)
    ).astype(np.int32)


def test_disagg_admission_token_parity_under_busy_lanes(models):
    """A request admitted through the disagg worker while other lanes decode
    must produce exactly the tokens of a colocated admission."""
    tcfg = models[0]
    plain, _ = _mk_engine(models, disagg=False)
    long_ids = _long_prompt(tcfg)
    r_ref = plain.submit(long_ids)
    plain.run_until_drained()

    eng, worker = _mk_engine(models, disagg=True)
    try:
        # busy lanes first: two short decodes running while the long
        # admission's prefix is computed on the other device
        shorts = [eng.submit(np.asarray([5, 6, 7, 8], np.int32)) for _ in range(2)]
        r = eng.submit(long_ids)
        eng.run_until_drained()
        assert r.error is None, r.error
        for s in shorts:
            assert s.error is None
        np.testing.assert_array_equal(r.output_ids, r_ref.output_ids)
        assert r.meta_info["spec_verify_ct"] == r_ref.meta_info["spec_verify_ct"]
    finally:
        worker.stop()


def test_disagg_short_prompt_admits_inline(models):
    """Prompts below one prompt_bucket skip the worker (nothing to ship)."""
    eng, worker = _mk_engine(models, disagg=True)
    try:
        r = eng.submit(np.asarray([5, 6, 7], np.int32))
        eng.run_until_drained()
        assert r.error is None
        assert worker.inflight == 0
    finally:
        worker.stop()


def test_disagg_kv_quant_parity(models):
    """int8-KV engines ship int8 rows (no requant): parity holds."""
    tcfg = models[0]
    plain, _ = _mk_engine(models, disagg=False, kv_quant=True)
    long_ids = _long_prompt(tcfg, seed=7)
    r_ref = plain.submit(long_ids)
    plain.run_until_drained()
    eng, worker = _mk_engine(models, disagg=True, kv_quant=True)
    try:
        r = eng.submit(long_ids)
        eng.run_until_drained()
        assert r.error is None, r.error
        np.testing.assert_array_equal(r.output_ids, r_ref.output_ids)
    finally:
        worker.stop()


def test_disagg_abort_before_admission(models):
    """Aborting a request while its prefix is on the prefill device completes
    it with the abort finish_reason and frees the reserved lane."""
    tcfg = models[0]
    eng, worker = _mk_engine(models, disagg=True, lanes=2)
    try:
        r = eng.submit(_long_prompt(tcfg, seed=11))
        eng.step()  # hands off to the worker
        assert eng.abort(r.rid)
        eng.run_until_drained()
        assert r.meta_info["finish_reason"]["type"] == "abort"
        assert not eng._lane_reserved
        # engine still serves
        r2 = eng.submit(np.asarray([4, 5, 6], np.int32))
        eng.run_until_drained()
        assert r2.error is None
    finally:
        worker.stop()


def test_disagg_worker_failure_is_isolated(models):
    """A worker-side failure surfaces on the request; the engine keeps
    serving other requests."""
    tcfg, dcfg, t_params, d_params = models
    eng, worker = _mk_engine(models, disagg=True, lanes=2)

    def boom(padded, p0):
        raise RuntimeError("synthetic prefill-device fault")

    worker._prefill_prefix = boom
    try:
        bad = eng.submit(_long_prompt(tcfg, seed=13))
        ok = eng.submit(np.asarray([5, 6, 7], np.int32))
        eng.run_until_drained()
        assert bad.error is not None and "disagg prefill failed" in bad.error
        assert ok.error is None
        assert not eng._lane_reserved
    finally:
        worker.stop()


def test_disagg_handoff_lands_on_decode_device(models):
    """The shipped rows are resident on the decode device before admission —
    the decode chip never touches the prefill chip's memory."""
    tcfg, dcfg, t_params, d_params = models
    devs = jax.devices()
    worker = PrefillWorker(tcfg, dcfg, t_params,
                           prefill_device=devs[1], decode_device=devs[0])
    try:
        ids = _long_prompt(tcfg)
        padded = np.zeros((1, 48), np.int32)
        padded[0, : len(ids)] = ids
        worker.submit(object(), 0, padded, 32)
        res = None
        import time
        for _ in range(600):
            got = worker.poll()
            if got:
                res = got[0]
                break
            time.sleep(0.05)
        assert res is not None and res.error is None
        for leaf in jax.tree.leaves(res.kv_rows) + [res.taps]:
            assert list(leaf.devices()) == [devs[0]]
    finally:
        worker.stop()
