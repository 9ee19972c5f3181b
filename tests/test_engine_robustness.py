"""Engine robustness: recoverable kill-paths, abort races, incremental stop
scan, SSE consumer-disconnect handling, delta detokenization, and the
BucketedEngine's shared prefix cache / concurrent drain.

The reference gets all of this from SGLang for free (SURVEY §2.2); here each
failure mode is injected deterministically and the contract pinned:
**the engine itself never dies** — only individual requests fail.
"""

import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.bench.tokenizer import SyntheticTokenizer
from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.engine import batching
from dflash_tpu.engine.batching import (
    BucketedEngine,
    BucketSpec,
    ContinuousBatchingEngine,
    EngineConfig,
)
from dflash_tpu.engine.server import EngineHTTPServer, stable_prefix
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
        num_lanes=kw.pop("num_lanes", 3),
        max_new_tokens=kw.pop("max_new_tokens", 12),
        block_size=4, prompt_cap=32, prompt_bucket=16, **kw,
    )
    return ContinuousBatchingEngine(tcfg, dcfg, t_params, d_params, cfg,
                                    tokenizer=tokenizer)


PROMPT = np.asarray([9, 4, 11, 3])


# ---------------------------------------------------------------------------
# Recoverable group-admission kill path (VERDICT r2 weak #4)
# ---------------------------------------------------------------------------

def test_engine_survives_donation_failure_in_admit_many(models, monkeypatch):
    """Inject the worst-case fault: _admit_many consumes the donated engine
    state and then dies.  The in-flight requests must fail individually and
    the ENGINE must keep serving."""
    eng = _engine(models, batch_admission=True, overlap=False, num_lanes=3)

    # get one request actively decoding in a lane
    a = eng.submit(PROMPT)
    eng.step()
    assert eng._lane_req[0] is a

    real_admit_many = batching._admit_many

    def boom(state, lanes, group, *, k):
        jax.tree.map(lambda x: x.delete(), state)  # donation consumed...
        raise RuntimeError("injected device fault")  # ...then the dispatch died

    monkeypatch.setattr(batching, "_admit_many", boom)
    b = eng.submit(np.asarray([5, 6, 7]))
    c = eng.submit(np.asarray([5, 6, 8]))  # same temperature -> group of 2
    eng.step()

    for req in (a, b, c):
        assert req.done_event.is_set()
        assert req.error is not None and "engine state lost" in req.error
    assert all(r is None for r in eng._lane_req)

    # the engine keeps serving: a fresh request completes normally and
    # matches a clean engine's output token-for-token
    monkeypatch.setattr(batching, "_admit_many", real_admit_many)
    d = eng.submit(PROMPT)
    eng.run_until_drained()
    clean = _engine(models, num_lanes=3)
    ref = clean.submit(PROMPT)
    clean.run_until_drained()
    np.testing.assert_array_equal(d.output_ids, ref.output_ids)


def test_group_prefill_failure_falls_back_per_request(models, monkeypatch):
    """A fault BEFORE the donating admit (in the group prefill) must retry
    the requests one at a time — nothing fails, nothing is lost."""
    eng = _engine(models, batch_admission=True, overlap=False, num_lanes=2)

    from dflash_tpu.spec import batched as sb

    def bad_prefill(*a, **kw):
        raise RuntimeError("injected prefill fault")

    monkeypatch.setattr(sb, "jit_batched_prefill", bad_prefill)
    a = eng.submit(PROMPT)
    b = eng.submit(np.asarray([5, 6, 7]))
    eng.run_until_drained()
    assert a.error is None and b.error is None
    assert a.output_ids is not None and b.output_ids is not None


# ---------------------------------------------------------------------------
# Abort race: request popped from the queue but not yet bound to a lane
# ---------------------------------------------------------------------------

def test_abort_mid_admission_request(models):
    eng = _engine(models, num_lanes=2)
    req = eng.submit(PROMPT)
    # simulate the admit loop having popped the request but not yet bound it
    with eng._abort_lock:
        got = eng._queue.get_nowait()
        assert got is req
        eng._pending_admit.add(req.rid)
    # previously: invisible to both the queue drain and the lane scan -> False
    assert eng.abort(req.rid) is True
    # admission completes; the abort must still take effect at first harvest
    eng._admit_request(0, req)
    eng.run_until_drained()
    assert req.done_event.is_set()
    assert req.meta_info["finish_reason"]["type"] == "abort"


def test_abort_unknown_rid_still_false(models):
    eng = _engine(models, num_lanes=2)
    assert eng.abort(12345) is False


# ---------------------------------------------------------------------------
# Incremental stop-string scan
# ---------------------------------------------------------------------------

def _linear_reference_cut(tok, stop_strings, gen):
    """The pre-round-3 O(n^2) scan — ground truth for the incremental one."""
    text = tok.decode(gen, skip_special_tokens=True)
    if not any(s in text for s in stop_strings):
        return None, None
    for n in range(1, len(gen) + 1):
        t = tok.decode(gen[:n], skip_special_tokens=True)
        for s in stop_strings:
            if s in t:
                return n, s
    return len(gen), next(s for s in stop_strings if s in text)


def test_incremental_stop_cut_matches_linear_scan(models):
    tcfg = models[0]
    tok = SyntheticTokenizer(tcfg.vocab_size)
    eng = _engine(models, tokenizer=tok, max_new_tokens=24)

    base = eng.submit(PROMPT, max_new_tokens=24)
    eng.run_until_drained()
    gen = base.output_ids[0, len(PROMPT):]
    assert len(gen) >= 8

    # stop on the text of a late token; feed the generation to the scanner in
    # window-sized chunks like the harvest loop does
    for stop_at in (len(gen) - 2, len(gen) // 2):
        stop_text = tok.decode(gen[stop_at:stop_at + 1])
        req = batching.Request(rid=0, input_ids=PROMPT, max_new_tokens=24,
                               temperature=0.0, stop_strings=(stop_text,))
        got = (None, None)
        for upto in range(2, len(gen) + 1, 2):  # windows of 2 tokens
            got = eng._find_stop_cut(req, gen[:upto])
            if got[0] is not None:
                break
        want = _linear_reference_cut(tok, (stop_text,), gen)
        assert got == want, f"stop_at={stop_at}"


def test_incremental_stop_spanning_window_boundary(models):
    """A stop string spanning two scheduling windows must still match (the
    overlap re-covers the boundary)."""
    tcfg = models[0]
    tok = SyntheticTokenizer(tcfg.vocab_size)
    eng = _engine(models, tokenizer=tok, max_new_tokens=24)

    base = eng.submit(PROMPT, max_new_tokens=24)
    eng.run_until_drained()
    gen = base.output_ids[0, len(PROMPT):]
    assert len(gen) >= 6
    # two-token stop whose first token lands at an even index: with 2-token
    # windows the match spans the boundary between scans
    k = (len(gen) // 2) | 1  # odd index -> split by even-sized windows
    stop_text = tok.decode(gen[k:k + 2])
    req = batching.Request(rid=0, input_ids=PROMPT, max_new_tokens=24,
                           temperature=0.0, stop_strings=(stop_text,))
    got = (None, None)
    for upto in range(2, len(gen) + 1, 2):
        got = eng._find_stop_cut(req, gen[:upto])
        if got[0] is not None:
            break
    want = _linear_reference_cut(tok, (stop_text,), gen)
    assert got == want


def test_stop_scan_work_is_incremental(models):
    """Per-window decode work must not grow with the full generation length:
    a clean window decodes only the new tokens plus the bounded overlap."""
    tcfg = models[0]
    tok = SyntheticTokenizer(tcfg.vocab_size)
    eng = _engine(models, tokenizer=tok)

    calls = []
    real_decode = tok.decode

    def counting_decode(ids, **kw):
        calls.append(len(np.asarray(ids)))
        return real_decode(ids, **kw)

    tok.decode = counting_decode
    gen = np.arange(10, 210, dtype=np.int32)  # 200 tokens, no stop hits
    req = batching.Request(rid=0, input_ids=PROMPT, max_new_tokens=256,
                           temperature=0.0, stop_strings=("@@nope@@",))
    for upto in range(4, 201, 4):
        calls.clear()
        assert eng._find_stop_cut(req, gen[:upto]) == (None, None)
        # one tail decode per clean window, bounded by window + overlap
        assert len(calls) == 1
        assert calls[0] <= 4 + len("@@nope@@") + 4
    tok.decode = real_decode


# ---------------------------------------------------------------------------
# SSE: consumer disconnect frees the lane; deltas are detokenization-stable
# ---------------------------------------------------------------------------

class _FakeSSEHandler:
    """Stands in for the HTTP handler: accepts headers, then raises
    BrokenPipeError on the Nth body write (the client went away)."""

    def __init__(self, fail_after=1):
        self.fail_after = fail_after
        self.writes = []

        outer = self

        class W:
            def write(self, b):
                if len(outer.writes) >= outer.fail_after:
                    raise BrokenPipeError("client disconnected")
                outer.writes.append(b)

            def flush(self):
                pass

        self.wfile = W()

    def send_response(self, *a):
        pass

    def send_header(self, *a):
        pass

    def end_headers(self):
        pass


def test_sse_client_disconnect_aborts_request(models):
    tcfg = models[0]
    tok = SyntheticTokenizer(tcfg.vocab_size)
    eng = _engine(models, tokenizer=tok, max_new_tokens=64)
    server = EngineHTTPServer.__new__(EngineHTTPServer)  # no socket needed
    server.engine = eng
    server.tokenizer = tok

    done = threading.Event()

    def drive():
        # the stream loop blocks on the queue; drain the engine alongside
        while not done.is_set():
            eng.step()

    t = threading.Thread(target=drive, daemon=True)
    t.start()
    try:
        handler = _FakeSSEHandler(fail_after=1)
        server._generate_stream(
            {"input_ids": PROMPT.tolist(),
             "sampling_params": {"max_new_tokens": 64}},
            handler,
        )
    finally:
        done.set()
        t.join(timeout=10)
    # the handler died after one chunk; the request must not run to length
    eng.run_until_drained()
    (req,) = eng.completed.values()
    assert req.meta_info["finish_reason"]["type"] == "abort"


def test_stable_prefix_holds_back_replacement_char():
    assert stable_prefix("a�") == "a"
    assert stable_prefix("a��") == "a"
    assert stable_prefix("a好") == "a好"
    # a mid-text replacement char the model really produced is NOT stripped
    assert stable_prefix("a�b") == "a�b"


def test_stable_prefix_holds_back_partial_stop():
    assert stable_prefix("hello wo", stop_strings=("world",)) == "hello "
    assert stable_prefix("hello w", stop_strings=("world", "wa")) == "hello "
    assert stable_prefix("x#", stop_strings=("##",)) == "x"
    # inputs are pre-trimmed by _decode_text, so a full stop match never
    # reaches this function; unrelated text is untouched
    assert stable_prefix("xy", stop_strings=("##",)) == "xy"


def test_openai_sse_deltas_concatenate_clean(models):
    """Deltas shipped over the OpenAI SSE surface must concatenate to the
    final text even when a multibyte char spans a token boundary."""
    tcfg = models[0]
    tok = SyntheticTokenizer(tcfg.vocab_size)

    # tokenizer whose ids decode to SPLIT utf-8 bytes of '好' (simulating
    # byte-level BPE): decode(prefix ending mid-char) yields U+FFFD
    class ByteTok:
        eos_token_id = None

        def decode(self, ids, **kw):
            data = b"".join(
                "好".encode()[i % 3: i % 3 + 1] for i in np.asarray(ids) % 3
            )
            # only whole chars decode; the tail yields replacement chars
            return data.decode("utf-8", errors="replace")

        def encode(self, text):
            return list(range(len(text)))

    bt = ByteTok()
    cum_texts = []
    prev = ""
    # simulate the chunk loop over a growing id stream
    ids: list = []
    deltas = []
    for step in range(1, 10):
        ids.append((step - 1) % 3)  # byte index 0,1,2 of '好', repeated
        cum = bt.decode(ids)
        fin = step == 9
        stable = cum if fin else stable_prefix(cum)
        delta = stable[len(prev):]
        prev = stable
        deltas.append(delta)
        cum_texts.append(cum)
    assert "".join(deltas) == cum_texts[-1]
    # no intermediate delta ever shipped a replacement char
    assert all("�" not in d for d in deltas[:-1])


# ---------------------------------------------------------------------------
# BucketedEngine: shared prefix cache + concurrent drain
# ---------------------------------------------------------------------------

def test_bucketed_prefix_cache_shared_across_rungs(models):
    tcfg, dcfg, t_params, d_params = models
    cfg = EngineConfig(num_lanes=2, max_new_tokens=16, block_size=4,
                       prompt_cap=32, prompt_bucket=16, prefix_cache_mb=64)
    eng = BucketedEngine(
        tcfg, dcfg, t_params, d_params, cfg,
        [BucketSpec(32, 8, 2), BucketSpec(32, 16, 2)],
    )
    assert all(p._prefix_cache is eng._prefix_cache for p in eng.pools)

    prompt = np.arange(3, 27, dtype=np.int32)  # 24 tokens -> 16-token prefix
    a = eng.submit(prompt, max_new_tokens=16)  # routes to the BIG rung
    eng.run_until_drained()
    assert eng._prefix_cache.misses >= 1 and eng._prefix_cache.hits == 0

    b = eng.submit(prompt, max_new_tokens=8)  # SMALL rung, same prefix
    eng.run_until_drained()
    assert eng._prefix_cache.hits == 1, "cross-rung prefix hit"

    # token parity: the cached-prefix admission must match a cold engine
    cold = BucketedEngine(
        tcfg, dcfg, t_params, d_params,
        EngineConfig(num_lanes=2, max_new_tokens=16, block_size=4,
                     prompt_cap=32, prompt_bucket=16),
        [BucketSpec(32, 8, 2), BucketSpec(32, 16, 2)],
    )
    rb = cold.submit(prompt, max_new_tokens=8)
    cold.run_until_drained()
    np.testing.assert_array_equal(b.output_ids, rb.output_ids)
    assert a.output_ids is not None


def test_bucketed_drain_interleaves_pools(models):
    """run_until_drained must advance all rungs concurrently, not run pool 0
    to empty while pool 1's lanes idle."""
    tcfg, dcfg, t_params, d_params = models
    cfg = EngineConfig(num_lanes=2, max_new_tokens=16, block_size=4,
                       prompt_cap=32, prompt_bucket=16)
    eng = BucketedEngine(tcfg, dcfg, t_params, d_params, cfg,
                         [BucketSpec(32, 8, 2), BucketSpec(32, 16, 2)])
    order = []
    for i, p in enumerate(eng.pools):
        real = p.step

        def spy(real=real, i=i):
            n = real()
            order.append((i, n))
            return n

        p.step = spy
    a = eng.submit(PROMPT, max_new_tokens=8)
    b = eng.submit(PROMPT, max_new_tokens=16)
    eng.run_until_drained()
    assert a.output_ids is not None and b.output_ids is not None
    # pool 1 made progress before pool 0 finished its last step
    active0 = [k for k, (i, n) in enumerate(order) if i == 0 and n > 0]
    active1 = [k for k, (i, n) in enumerate(order) if i == 1 and n > 0]
    assert active1 and active0 and active1[0] < active0[-1]
