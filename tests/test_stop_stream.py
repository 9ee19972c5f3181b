"""Stop strings + streaming through the continuous-batching engine and the
HTTP serving surface (the reference client's sampling_params "stop" field,
benchmark_sglang.py:48-49, and SGLang's streaming /generate)."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.bench.tokenizer import SyntheticTokenizer
from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.engine.batching import ContinuousBatchingEngine, EngineConfig
from dflash_tpu.engine.server import EngineHTTPServer
from dflash_tpu.models import dflash_draft, qwen3

DTYPE = jnp.float32


@pytest.fixture(scope="module")
def models():
    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=4, num_layers=1)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, DTYPE)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, DTYPE)
    return tcfg, dcfg, t_params, d_params


def _engine(models, tokenizer=None, **kw):
    tcfg, dcfg, t_params, d_params = models
    cfg = EngineConfig(
        num_lanes=kw.pop("num_lanes", 2), max_new_tokens=kw.pop("max_new_tokens", 16),
        block_size=4, prompt_cap=32, prompt_bucket=16, **kw,
    )
    return ContinuousBatchingEngine(tcfg, dcfg, t_params, d_params, cfg,
                                    tokenizer=tokenizer)


PROMPT = np.asarray([9, 4, 11, 3])


def test_stop_requires_tokenizer(models):
    eng = _engine(models)
    with pytest.raises(ValueError, match="tokenizer"):
        eng.submit(PROMPT, stop=["x"])


def test_stop_string_halts_and_excludes_match(models):
    tcfg = models[0]
    tok = SyntheticTokenizer(tcfg.vocab_size)
    # baseline run to learn the greedy continuation, then stop on the text of
    # a mid-generation token
    base_eng = _engine(models, tokenizer=tok)
    base = base_eng.submit(PROMPT)
    base_eng.run_until_drained()
    gen = base.output_ids[0, 4:]
    assert gen.shape[0] >= 6, "need a few tokens to stop in the middle"
    target_tok = int(gen[4])
    stop_s = f"tok{target_tok}"  # SyntheticTokenizer decodes id -> "tokN"

    eng = _engine(models, tokenizer=tok)
    req = eng.submit(PROMPT, stop=[stop_s])
    eng.run_until_drained()
    assert req.error is None
    assert req.meta_info["finish_reason"]["type"] == "stop"
    assert req.meta_info["finish_reason"]["matched"] == stop_s
    out_gen = req.output_ids[0, 4:]
    # tokens up to (and including the boundary token of) the match, then halt:
    # strictly shorter than the unstopped run and a prefix of it
    assert out_gen.shape[0] <= 5
    np.testing.assert_array_equal(out_gen, gen[: out_gen.shape[0]])


def test_stop_string_in_final_window_still_truncates(models):
    """A stop string committed in the SAME window the request reaches
    max_new_tokens must still win: finish_reason=stop, output truncated."""
    tok = SyntheticTokenizer(models[0].vocab_size)
    base_eng = _engine(models, tokenizer=tok, max_new_tokens=8)
    base = base_eng.submit(PROMPT, max_new_tokens=8)
    base_eng.run_until_drained()
    gen = base.output_ids[0, 4:]
    assert gen.shape[0] == 8, "needs a full-length run"
    stop_s = f"tok{int(gen[6])}"  # near the end: same window as length finish

    eng = _engine(models, tokenizer=tok, max_new_tokens=8)
    req = eng.submit(PROMPT, max_new_tokens=8, stop=[stop_s])
    eng.run_until_drained()
    assert req.meta_info["finish_reason"]["type"] == "stop"
    assert req.output_ids.shape[1] < base.output_ids.shape[1]


def test_stop_string_never_matching_runs_to_length(models):
    tok = SyntheticTokenizer(models[0].vocab_size)
    eng = _engine(models, tokenizer=tok)
    req = eng.submit(PROMPT, stop=["NEVER-IN-VOCAB"])
    eng.run_until_drained()
    assert req.meta_info["finish_reason"]["type"] in ("length", "stop")
    assert req.meta_info["completion_tokens"] >= 8


def test_streaming_tokens_concatenate_to_final_output(models):
    eng = _engine(models)
    req = eng.submit(PROMPT, stream=True)
    eng.run_until_drained()
    chunks, finished = [], False
    while not finished:
        item = req.stream_queue.get(timeout=5)
        chunks.extend(item["token_ids"])
        finished = item["finished"]
    np.testing.assert_array_equal(
        np.asarray(chunks), req.output_ids[0, req.meta_info["prompt_tokens"]:]
    )
    assert item["meta_info"]["completion_tokens"] == len(chunks)


def test_streaming_matches_non_streaming_output(models):
    a = _engine(models)
    ra = a.submit(PROMPT)
    a.run_until_drained()
    b = _engine(models)
    rb = b.submit(PROMPT, stream=True)
    b.run_until_drained()
    np.testing.assert_array_equal(ra.output_ids, rb.output_ids)


def test_streaming_in_sync_mode(models):
    eng = _engine(models, overlap=False)
    req = eng.submit(PROMPT, stream=True)
    eng.run_until_drained()
    chunks, finished = [], False
    while not finished:
        item = req.stream_queue.get(timeout=5)
        chunks.extend(item["token_ids"])
        finished = item["finished"]
    np.testing.assert_array_equal(
        np.asarray(chunks), req.output_ids[0, req.meta_info["prompt_tokens"]:]
    )


def test_abort_queued_request(models):
    eng = _engine(models, num_lanes=1)
    r1 = eng.submit(PROMPT, max_new_tokens=16)
    r2 = eng.submit(PROMPT + 1, max_new_tokens=16)  # waits behind r1
    assert eng.abort(r2.rid) is True
    assert r2.done_event.is_set()
    assert r2.meta_info["finish_reason"]["type"] == "abort"
    eng.run_until_drained()
    assert r1.error is None and r1.meta_info["completion_tokens"] >= 1
    assert eng.abort(r1.rid) is False  # already completed


def test_abort_active_request_mid_decode(models):
    eng = _engine(models, max_new_tokens=64)
    req = eng.submit(PROMPT, max_new_tokens=64)
    # run a couple of windows, then abort mid-flight
    for _ in range(3):
        eng.step()
    assert eng.abort(req.rid) is True
    eng.run_until_drained()
    assert req.done_event.is_set()
    assert req.meta_info["finish_reason"]["type"] == "abort"
    # partial output: strictly fewer tokens than the request asked for
    assert 0 < req.meta_info["completion_tokens"] < 64
    # committed prefix matches an uninterrupted run's prefix
    full_eng = _engine(models, max_new_tokens=64)
    full = full_eng.submit(PROMPT, max_new_tokens=64)
    full_eng.run_until_drained()
    n = req.meta_info["completion_tokens"]
    np.testing.assert_array_equal(
        req.output_ids[0, 4:4 + n], full.output_ids[0, 4:4 + n]
    )


def test_per_request_seed_reproducible(models):
    """Same explicit seed => identical sampled output regardless of rid /
    admission order; different seeds diverge (tiny vocab => retry a few
    prompts until divergence shows)."""
    eng = _engine(models, sampling_filters=True)
    a = eng.submit(PROMPT, temperature=1.3, seed=7)
    b = eng.submit(PROMPT, temperature=1.3, seed=7)
    eng.run_until_drained()
    np.testing.assert_array_equal(a.output_ids, b.output_ids)

    diverged = False
    for s in range(5):
        c = eng.submit(PROMPT, temperature=1.3, seed=7)
        d = eng.submit(PROMPT, temperature=1.3, seed=1000 + s)
        eng.run_until_drained()
        if not np.array_equal(c.output_ids, d.output_ids):
            diverged = True
            break
    assert diverged, "different seeds never diverged"


def test_bucketed_engine_stop_and_stream(models):
    """Stop strings + streaming route through BucketedEngine pools (the
    tokenizer must reach every rung)."""
    from dflash_tpu.engine.batching import BucketedEngine, BucketSpec, EngineConfig

    tcfg, dcfg, t_params, d_params = models
    tok = SyntheticTokenizer(tcfg.vocab_size)
    cfg = EngineConfig(num_lanes=2, max_new_tokens=16, block_size=4,
                       prompt_cap=32, prompt_bucket=16)
    eng = BucketedEngine(
        tcfg, dcfg, t_params, d_params, cfg,
        [BucketSpec(16, 8, 2), BucketSpec(32, 16, 2)],
        tokenizer=tok,
    )
    req = eng.submit(PROMPT, max_new_tokens=8, stream=True,
                     stop=["ABSENT-STOP"])
    eng.run_until_drained()
    assert req.error is None
    chunks, finished = [], False
    while not finished:
        item = req.stream_queue.get(timeout=5)
        chunks.extend(item["token_ids"])
        finished = item["finished"]
    np.testing.assert_array_equal(
        np.asarray(chunks), req.output_ids[0, req.meta_info["prompt_tokens"]:]
    )


# ---------------------------------------------------------------------------
# HTTP surface
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def server(models):
    tok = SyntheticTokenizer(models[0].vocab_size)
    eng = _engine(models, tokenizer=tok, num_lanes=2)
    srv = EngineHTTPServer(eng, port=0, tokenizer=tok)
    srv.start()
    yield srv
    srv.stop()


def _post(srv, body):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}/generate", json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.read()


def test_http_stop_string_trims_text(server):
    base = json.loads(_post(server, {
        "input_ids": PROMPT.tolist(),
        "sampling_params": {"max_new_tokens": 16},
    }))
    words = base["text"].split()
    assert len(words) >= 4
    stop_s = words[2]
    got = json.loads(_post(server, {
        "input_ids": PROMPT.tolist(),
        "sampling_params": {"max_new_tokens": 16, "stop": [stop_s]},
    }))
    assert got["meta_info"]["finish_reason"]["type"] == "stop"
    assert stop_s not in got["text"]
    # text is the base text cut at the FIRST occurrence of the stop string
    # (substring semantics — it may match inside an earlier word)
    assert got["text"] == base["text"][: base["text"].index(stop_s)]


def test_http_streaming_sse(server):
    raw = _post(server, {
        "input_ids": PROMPT.tolist(), "stream": True,
        "sampling_params": {"max_new_tokens": 16},
    }).decode()
    events = [l[len("data: "):] for l in raw.split("\n\n") if l.startswith("data: ")]
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert len(chunks) >= 2, "expect more than one streamed window"
    # cumulative output grows monotonically and the last equals non-streamed
    lens = [len(c["output_ids"]) for c in chunks]
    assert lens == sorted(lens)
    final = chunks[-1]
    assert final["meta_info"]["completion_tokens"] == len(final["output_ids"])
    base = json.loads(_post(server, {
        "input_ids": PROMPT.tolist(),
        "sampling_params": {"max_new_tokens": 16},
    }))
    assert final["output_ids"] == base["output_ids"]


def test_stream_interval_batches_pushes(models):
    """stream_interval > 1: streamed chunks arrive every Nth scheduling
    window (fewer, larger pushes), and the concatenation is unchanged."""
    eng1 = _engine(models, max_new_tokens=16, stream_interval=1)
    a = eng1.submit(PROMPT, stream=True)
    eng1.run_until_drained()
    chunks1 = []
    while not a.stream_queue.empty():
        chunks1.append(a.stream_queue.get_nowait())

    eng4 = _engine(models, max_new_tokens=16, stream_interval=4)
    b = eng4.submit(PROMPT, stream=True)
    eng4.run_until_drained()
    chunks4 = []
    while not b.stream_queue.empty():
        chunks4.append(b.stream_queue.get_nowait())

    flat1 = [t for c in chunks1 for t in c["token_ids"]]
    flat4 = [t for c in chunks4 for t in c["token_ids"]]
    assert flat1 == flat4, "interval must not change the streamed tokens"
    assert len(chunks4) < len(chunks1), (len(chunks4), len(chunks1))


def test_stream_interval_stop_still_exact(models):
    """A stop string is honored exactly at any scan cadence — the overshoot
    windows are trimmed before the result surfaces."""
    tcfg = models[0]
    tok = SyntheticTokenizer(tcfg.vocab_size)
    base_eng = _engine(models, tokenizer=tok, stream_interval=1)
    base = base_eng.submit(PROMPT)
    base_eng.run_until_drained()
    gen = base.output_ids[0, 4:]
    stop_text = tok.decode(gen[3:4])

    outs = []
    for interval in (1, 3, 7):
        eng = _engine(models, tokenizer=tok, stream_interval=interval)
        r = eng.submit(PROMPT, stop=[stop_text])
        eng.run_until_drained()
        assert r.meta_info["finish_reason"]["type"] == "stop"
        outs.append(r.output_ids)
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0], o)
