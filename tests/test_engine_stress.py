"""Mixed-traffic stress for the continuous-batching engine: greedy, hot,
filtered, stop-string, streaming and invalid requests interleaved on few
lanes, with re-admission churn.  Invariants:

  * every request completes (or surfaces a per-request error) — nothing hangs;
  * greedy requests are unaffected by their neighbors: each matches its solo
    single-lane run token-for-token (lane-independence under churn);
  * streamed chunks concatenate to the final output;
  * stop-string requests end with finish_reason=stop and exclude the match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.bench.tokenizer import SyntheticTokenizer
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


def _cfg(**kw):
    return EngineConfig(
        num_lanes=kw.pop("num_lanes", 3), max_new_tokens=16, block_size=4,
        prompt_cap=32, prompt_bucket=16, sampling_filters=True, **kw,
    )


@pytest.mark.parametrize("overlap", [True, False])
def test_mixed_traffic_stress(models, overlap):
    tcfg, dcfg, t_params, d_params = models
    tok = SyntheticTokenizer(tcfg.vocab_size)
    eng = ContinuousBatchingEngine(
        tcfg, dcfg, t_params, d_params, _cfg(overlap=overlap), tokenizer=tok
    )
    rng = np.random.default_rng(42)

    def prompt(i):
        return rng.integers(10, tcfg.vocab_size - 10, size=(4 + (i % 9),))

    reqs = []
    greedy_prompts = {}
    for i in range(24):
        p = prompt(i)
        kind = i % 6
        if kind in (0, 1):  # greedy — the isolation oracle
            r = eng.submit(p, max_new_tokens=8 + (i % 5))
            greedy_prompts[r.rid] = (p, 8 + (i % 5))
        elif kind == 2:  # hot sampled
            r = eng.submit(p, temperature=1.3, top_k=8, top_p=0.9)
        elif kind == 3:  # streaming greedy
            r = eng.submit(p, max_new_tokens=8, stream=True)
        elif kind == 4:  # stop string (never matches — runs to length)
            r = eng.submit(p, max_new_tokens=8, stop=["NEVER-MATCHES"])
        else:  # effectively-greedy filter combo (top_k=1 normalization)
            r = eng.submit(p, temperature=2.0, top_k=1)
        reqs.append(r)
    # invalid request rejected up-front, engine unaffected
    with pytest.raises(ValueError):
        eng.submit(rng.integers(10, 100, size=(64,)))  # exceeds prompt_cap

    eng.run_until_drained()

    for r in reqs:
        assert r.done_event.is_set(), f"request {r.rid} never completed"
        assert r.error is None, r.error
        assert r.meta_info["completion_tokens"] >= 1
        if r.stream_queue is not None:
            chunks, finished = [], False
            while not finished:
                item = r.stream_queue.get(timeout=5)
                chunks.extend(item["token_ids"])
                finished = item["finished"]
            np.testing.assert_array_equal(
                np.asarray(chunks),
                r.output_ids[0, r.meta_info["prompt_tokens"]:],
            )
        if r.stop_strings:
            assert r.meta_info["finish_reason"]["type"] in ("length", "stop")

    # greedy isolation: each greedy request matches its solo run exactly.
    # The comparator uses the SAME lane count — a different R changes vmap
    # reduction order, which can flip argmax on near-ties with random
    # weights (see test_sharding.test_batched_requests_decode_independently).
    solo = ContinuousBatchingEngine(
        tcfg, dcfg, t_params, d_params, _cfg(num_lanes=3, overlap=overlap),
        tokenizer=tok,
    )
    for r in reqs:
        if r.rid not in greedy_prompts:
            continue
        p, mn = greedy_prompts[r.rid]
        ref = solo.submit(p, max_new_tokens=mn)
        solo.run_until_drained()
        np.testing.assert_array_equal(
            r.output_ids, ref.output_ids,
            err_msg=f"greedy request {r.rid} diverged from its solo run",
        )
