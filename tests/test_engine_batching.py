"""Continuous batching engine + HTTP serving surface."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.engine import ContinuousBatchingEngine, EngineConfig
from dflash_tpu.models import dflash_draft, qwen3

pytestmark = pytest.mark.smoke  # sub-2-minute CI tier (VERDICT r4 weak #5)

DTYPE = jnp.float32


@pytest.fixture(scope="module")
def models():
    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=4, num_layers=1)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, DTYPE)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, DTYPE)
    return tcfg, dcfg, t_params, d_params


def make_engine(models, **kw):
    tcfg, dcfg, t_params, d_params = models
    cfg = EngineConfig(
        num_lanes=kw.pop("num_lanes", 3),
        max_new_tokens=kw.pop("max_new_tokens", 12),
        block_size=4,
        prompt_cap=32,
        prompt_bucket=16,
        **kw,
    )
    return ContinuousBatchingEngine(tcfg, dcfg, t_params, d_params, cfg)


def test_single_request_completes(models):
    eng = make_engine(models)
    req = eng.submit(np.asarray([5, 6, 7, 8]))
    eng.run_until_drained()
    assert req.output_ids is not None
    assert req.meta_info["completion_tokens"] >= 1
    assert req.meta_info["spec_verify_ct"] >= 1
    assert 1.0 <= req.meta_info["spec_accept_length"] <= 4.0
    np.testing.assert_array_equal(req.output_ids[0, :4], [5, 6, 7, 8])


def test_identical_requests_in_different_lanes_agree(models):
    """Lane independence: the same prompt gives the same output regardless of
    which lane it runs in or what the other lanes are doing."""
    eng = make_engine(models, num_lanes=3)
    a = eng.submit(np.asarray([5, 6, 7]))
    b = eng.submit(np.asarray([9, 10, 11, 12, 13]))  # different load in lane 1
    c = eng.submit(np.asarray([5, 6, 7]))
    eng.run_until_drained()
    np.testing.assert_array_equal(a.output_ids, c.output_ids)
    assert a.output_ids.shape != b.output_ids.shape or not np.array_equal(
        a.output_ids, b.output_ids
    )


def test_more_requests_than_lanes(models):
    eng = make_engine(models, num_lanes=2)
    reqs = [eng.submit(np.asarray([3 + i, 4, 5])) for i in range(5)]
    eng.run_until_drained()
    for r in reqs:
        assert r.output_ids is not None
        assert r.meta_info["completion_tokens"] >= 1


def test_staggered_admission_does_not_corrupt_running_lane(models):
    """Admit a request mid-flight of another; the first must be unaffected."""
    eng = make_engine(models, num_lanes=2)
    solo = make_engine(models, num_lanes=2)

    a_ref = solo.submit(np.asarray([5, 6, 7]))
    solo.run_until_drained()

    a = eng.submit(np.asarray([5, 6, 7]))
    eng.step()  # a starts decoding
    b = eng.submit(np.asarray([20, 21, 22, 23]))  # lands in lane 1 next step
    eng.run_until_drained()
    np.testing.assert_array_equal(a.output_ids, a_ref.output_ids)
    assert b.output_ids is not None


def test_stop_tokens_respected(models):
    tcfg, dcfg, t_params, d_params = models
    cfg = EngineConfig(
        num_lanes=2, max_new_tokens=16, block_size=4, prompt_cap=32,
        prompt_bucket=16, stop_token_ids=tuple(range(0, 256)),
    )
    eng = ContinuousBatchingEngine(tcfg, dcfg, t_params, d_params, cfg)
    req = eng.submit(np.asarray([5, 6, 7]))
    eng.run_until_drained()
    assert req.meta_info["completion_tokens"] < 16
    assert int(req.output_ids[0, -1]) in range(0, 256)


def test_overlap_matches_sync_outputs(models):
    """The overlapped scheduler (dispatch window N, harvest N-1) must produce
    exactly the synchronous engine's outputs — retire/admit lag changes only
    wall-clock, never tokens, because lanes are independent and finished
    lanes freeze on-device."""
    prompts = [
        np.asarray([5, 6, 7]),
        np.asarray([9, 10, 11, 12]),
        np.asarray([3, 4]),
        np.asarray([8, 9, 10]),
        np.asarray([5, 6, 7]),
    ]
    outs = {}
    for ov in (False, True):
        eng = make_engine(models, num_lanes=2, overlap=ov)
        reqs = [eng.submit(p) for p in prompts]
        eng.run_until_drained()
        assert all(r.error is None for r in reqs)
        outs[ov] = [r.output_ids for r in reqs]
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(a, b)


def test_per_lane_temperature_decode(models):
    """Per-request sampling params (reference benchmark_sglang.py:107-222):
    a T=0 request decodes greedily even while a T=0.8 request shares the
    batched cycle — its output must match its solo greedy run exactly, and
    the hot lane must actually sample (differ from greedy)."""
    solo = make_engine(models, num_lanes=1, max_new_tokens=12)
    ref = solo.submit(np.asarray([5, 6, 7]), temperature=0.0)
    solo.run_until_drained()

    eng = make_engine(models, num_lanes=2, max_new_tokens=12, temperature=0.7)
    cold = eng.submit(np.asarray([5, 6, 7]), temperature=0.0)
    hot = eng.submit(np.asarray([5, 6, 7]), temperature=0.8)
    eng.run_until_drained()
    np.testing.assert_array_equal(cold.output_ids, ref.output_ids)
    assert not np.array_equal(hot.output_ids, ref.output_ids)


def test_http_server_generate_and_flush(models):
    from dflash_tpu.bench.tokenizer import SyntheticTokenizer
    from dflash_tpu.engine.server import EngineHTTPServer

    tcfg, dcfg, t_params, d_params = models
    eng = make_engine(models, num_lanes=2)
    server = EngineHTTPServer(eng, port=0, tokenizer=SyntheticTokenizer(tcfg.vocab_size))
    server.start()
    try:
        url = f"http://{server.host}:{server.port}"

        def post(path, payload):
            req = urllib.request.Request(
                url + path, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"}, method="POST",
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        with urllib.request.urlopen(url + "/health", timeout=10) as r:
            assert json.loads(r.read())["status"] == "ok"

        out = post("/generate", {
            "input_ids": [5, 6, 7, 8],
            "sampling_params": {"max_new_tokens": 8},
        })
        assert len(out["output_ids"]) >= 1
        assert out["meta_info"]["spec_verify_ct"] >= 1
        assert "text" in out

        batch = post("/generate", [
            {"input_ids": [5, 6, 7], "sampling_params": {"max_new_tokens": 4}},
            {"input_ids": [9, 10], "sampling_params": {"max_new_tokens": 4}},
        ])
        assert isinstance(batch, list) and len(batch) == 2
    finally:
        server.stop()


def test_bucketed_engine_routes_and_agrees(models):
    """The total_len bucket ladder must route each request to the smallest
    fitting pool and produce the same tokens a single big engine produces."""
    from dflash_tpu.engine.batching import BucketedEngine, BucketSpec

    tcfg, dcfg, t_params, d_params = models
    cfg = EngineConfig(
        num_lanes=2, max_new_tokens=12, block_size=4,
        prompt_cap=32, prompt_bucket=16, steps_per_sync=1,
    )
    ladder = BucketedEngine(
        tcfg, dcfg, t_params, d_params, cfg,
        [BucketSpec(16, 8, 2), BucketSpec(32, 12, 2)],
    )
    short = np.asarray([5, 6, 7, 8])
    long = np.asarray(list(range(3, 23)))
    r_short = ladder.submit(short, max_new_tokens=8)
    r_long = ladder.submit(long, max_new_tokens=12)
    # routing: short fits the small bucket, long only the big one
    assert ladder.pools[0]._lane_req[0] is not None or not ladder.pools[0]._queue.empty()
    ladder.run_until_drained()
    assert r_short.error is None and r_long.error is None
    assert r_short.rid != r_long.rid
    assert set(ladder.completed) == {r_short.rid, r_long.rid}

    big = make_engine(models, num_lanes=2)
    ref_short = big.submit(short, max_new_tokens=8)
    ref_long = big.submit(long, max_new_tokens=12)
    big.run_until_drained()
    np.testing.assert_array_equal(r_short.output_ids, ref_short.output_ids)
    np.testing.assert_array_equal(r_long.output_ids, ref_long.output_ids)


def test_bucketed_engine_rejects_oversize(models):
    from dflash_tpu.engine.batching import BucketedEngine, BucketSpec

    tcfg, dcfg, t_params, d_params = models
    cfg = EngineConfig(num_lanes=1, max_new_tokens=8, block_size=4,
                       prompt_cap=16, prompt_bucket=16)
    ladder = BucketedEngine(tcfg, dcfg, t_params, d_params, cfg,
                            [BucketSpec(16, 8, 1)])
    with pytest.raises(ValueError):
        ladder.submit(np.arange(1, 30))


def test_http_server_with_bucket_ladder(models):
    from dflash_tpu.engine.batching import BucketedEngine, BucketSpec
    from dflash_tpu.engine.server import EngineHTTPServer

    tcfg, dcfg, t_params, d_params = models
    cfg = EngineConfig(num_lanes=2, max_new_tokens=12, block_size=4,
                       prompt_cap=32, prompt_bucket=16)
    ladder = BucketedEngine(tcfg, dcfg, t_params, d_params, cfg,
                            [BucketSpec(16, 8, 1), BucketSpec(32, 12, 1)])
    server = EngineHTTPServer(ladder, port=0)
    server.start()
    try:
        url = f"http://{server.host}:{server.port}/generate"
        body = json.dumps({
            "input_ids": [5, 6, 7], "sampling_params": {"max_new_tokens": 6},
        }).encode()
        with urllib.request.urlopen(
            urllib.request.Request(url, body, {"Content-Type": "application/json"}),
            timeout=120,
        ) as resp:
            out = json.loads(resp.read())
        assert out["meta_info"]["completion_tokens"] >= 1
        assert out["meta_info"]["spec_verify_ct"] >= 1
    finally:
        server.stop()


def test_adaptive_window_shrinks_when_queued(models):
    """With a request queued and a lane near its max_length, the next
    dispatch window must shrink toward the predicted finish."""
    eng = make_engine(models, num_lanes=1, steps_per_sync=8, adaptive_window=True)
    assert sorted(eng._cycle_fns) == [1, 2, 4, 8]
    r1 = eng.submit(np.asarray([5, 6, 7]), max_new_tokens=12)
    r2 = eng.submit(np.asarray([9, 10, 11]), max_new_tokens=12)  # queued
    eng.step()  # admits r1; queue non-empty -> adaptive path exercised
    windows = []
    while not (r1.done_event.is_set() and r2.done_event.is_set()):
        before = eng.cycle_count
        if eng.step() == 0:
            break
        windows.append(eng.cycle_count - before)
    eng.run_until_drained()
    assert r1.output_ids is not None and r2.output_ids is not None
    # at least one dispatch used a sub-maximal window
    assert windows and min(windows) < 8


def test_adaptive_window_uses_max_when_idle_queue(models):
    eng = make_engine(models, num_lanes=2, steps_per_sync=8, adaptive_window=True)
    eng.submit(np.asarray([5, 6, 7]), max_new_tokens=12)
    before = eng.cycle_count
    eng.step()
    assert eng.cycle_count - before == 8  # empty queue -> full window


def test_group_admission_matches_single_admission(models):
    """A burst admitted through the vmapped group path must produce exactly
    the tokens the one-at-a-time path produces."""
    tcfg, dcfg, t_params, d_params = models
    prompts = [np.asarray([5, 6, 7, 8]), np.asarray([9, 10, 11]),
               np.asarray([3, 4]), np.asarray([12, 13, 14, 15, 16])]

    eng_g = make_engine(models, num_lanes=4, batch_admission=True)
    reqs_g = [eng_g.submit(p, max_new_tokens=10) for p in prompts]
    eng_g.step()  # admits all four as one group (same temperature)
    assert all(r is not None for r in eng_g._lane_req)
    eng_g.run_until_drained()

    eng_s = make_engine(models, num_lanes=1)  # forces singleton admissions
    reqs_s = [eng_s.submit(p, max_new_tokens=10) for p in prompts]
    eng_s.run_until_drained()

    for rg, rs in zip(reqs_g, reqs_s):
        assert rg.error is None and rs.error is None
        np.testing.assert_array_equal(rg.output_ids, rs.output_ids)


def test_prefix_cache_hit_matches_cold_prefill(models):
    """Requests resuming from a cached prompt prefix must produce exactly
    the tokens a cold prefill produces (SGLang-radix-cache equivalent)."""
    tcfg, dcfg, t_params, d_params = models
    rng = np.random.default_rng(7)
    shared_prefix = rng.integers(1, tcfg.vocab_size - 2, size=20)
    p1 = np.concatenate([shared_prefix, [5, 6, 7]])
    p2 = np.concatenate([shared_prefix, [9, 10]])

    warm = make_engine(models, num_lanes=1, prefix_cache_mb=64)
    assert warm._prefix_cache is not None
    r1w = warm.submit(p1, max_new_tokens=10)
    warm.run_until_drained()
    assert warm._prefix_cache.misses == 1 and warm._prefix_cache.hits == 0
    r2w = warm.submit(p2, max_new_tokens=10)
    warm.run_until_drained()
    assert warm._prefix_cache.hits == 1  # 16-token boundary of shared_prefix

    cold = make_engine(models, num_lanes=1)
    r1c = cold.submit(p1, max_new_tokens=10)
    r2c = cold.submit(p2, max_new_tokens=10)
    cold.run_until_drained()
    np.testing.assert_array_equal(r1w.output_ids, r1c.output_ids)
    np.testing.assert_array_equal(r2w.output_ids, r2c.output_ids)


def test_prefix_cache_lru_eviction_and_flush(models):
    from dflash_tpu.engine.prefix_cache import PrefixCache, PrefixEntry
    import jax.numpy as jnp

    from dflash_tpu.cache.kv import KVCache

    def entry(seed, n):
        k = jnp.full((2, 1, n, 2, 4), float(seed), jnp.float32)
        return PrefixEntry(kv_rows=KVCache(k=k, v=k), taps=jnp.zeros((1, n, 8), jnp.float32))

    one = entry(1, 16).nbytes
    pc = PrefixCache(capacity_bytes=2 * one + 1, granularity=16)
    ids_a = np.arange(1, 40); ids_b = np.arange(2, 41); ids_c = np.arange(3, 42)
    pc.insert(ids_a, entry(1, 16))
    pc.insert(ids_b, entry(2, 16))
    assert pc.lookup(ids_a, 38) is not None  # refresh a
    pc.insert(ids_c, entry(3, 16))  # evicts b (LRU)
    assert pc.lookup(ids_b, 39) is None
    assert pc.lookup(ids_c, 40) is not None
    pc.clear()
    assert pc.lookup(ids_a, 38) is None
    # oversize and non-boundary inserts are rejected silently
    pc.insert(ids_a, entry(4, 15))
    big = PrefixCache(capacity_bytes=one - 1, granularity=16)
    big.insert(ids_a, entry(5, 16))
    assert big.lookup(ids_a, 38) is None


def test_prefix_cache_superseded_entry_frees_bytes(models):
    """Inserting a longer prefix that repoints ALL of a shorter entry's
    boundary keys must free the now-unreachable entry's bytes immediately
    (previously dead entries occupied capacity until LRU pressure)."""
    from dflash_tpu.engine.prefix_cache import PrefixCache, PrefixEntry
    import jax.numpy as jnp

    from dflash_tpu.cache.kv import KVCache

    def entry(seed, n):
        k = jnp.full((2, 1, n, 2, 4), float(seed), jnp.float32)
        return PrefixEntry(kv_rows=KVCache(k=k, v=k), taps=jnp.zeros((1, n, 8), jnp.float32))

    ids = np.arange(1, 60)
    short, long = entry(1, 16), entry(2, 32)
    pc = PrefixCache(capacity_bytes=short.nbytes + long.nbytes, granularity=16)
    pc.insert(ids, short)
    bytes_after_short = pc._bytes
    pc.insert(ids, long)  # repoints the 16-boundary key; short is unreachable
    assert pc._bytes == pc._bytes - 0  # sanity
    assert pc._bytes <= long.nbytes, (
        f"dead short entry still counted: {pc._bytes} > {long.nbytes} "
        f"(short was {bytes_after_short})"
    )
    assert len(pc._groups) == 1
    hit = pc.lookup(ids, 58)
    assert hit is not None and hit[1].prefix_len == 32


def test_prefix_cache_sub_boundary_hits(models):
    """Radix-lite: a 32-token cached prefix must also serve prompts agreeing
    only on its first 16 tokens, sharing ONE device entry (bytes counted
    once), and the returned entry is truncated to the hit boundary."""
    from dflash_tpu.engine.prefix_cache import PrefixCache, PrefixEntry
    import jax.numpy as jnp

    from dflash_tpu.cache.kv import KVCache

    k = jnp.arange(2 * 1 * 32 * 2 * 4, dtype=jnp.float32).reshape(2, 1, 32, 2, 4)
    entry = PrefixEntry(kv_rows=KVCache(k=k, v=k), taps=jnp.zeros((1, 32, 8), jnp.float32))
    pc = PrefixCache(capacity_bytes=10 * entry.nbytes, granularity=16)
    ids_long = np.arange(1, 50)
    pc.insert(ids_long, entry)
    assert pc._bytes == entry.nbytes

    diverging = np.concatenate([ids_long[:16], [999, 998, 997]])
    hit = pc.lookup(diverging, len(diverging) - 1)
    assert hit is not None
    n, sub = hit
    assert n == 16 and sub.prefix_len == 16
    np.testing.assert_array_equal(
        np.asarray(sub.kv_rows.k), np.asarray(entry.kv_rows.k[:, :, :16])
    )
    # full-boundary hit still returns the full entry
    n2, full = pc.lookup(ids_long, 48)
    assert n2 == 32 and full.prefix_len == 32


def test_prefix_cache_with_int8_kv(models):
    """Prefix entries stored in the quantized cache's own representation:
    hits with kv_quant=True must match the cold kv_quant=True output."""
    tcfg, dcfg, t_params, d_params = models
    rng = np.random.default_rng(11)
    shared = rng.integers(1, tcfg.vocab_size - 2, size=20)
    p1 = np.concatenate([shared, [5, 6, 7]])
    p2 = np.concatenate([shared, [9]])

    warm = make_engine(models, num_lanes=1, prefix_cache_mb=64, kv_quant=True)
    r1 = warm.submit(p1, max_new_tokens=10)
    warm.run_until_drained()
    r2 = warm.submit(p2, max_new_tokens=10)
    warm.run_until_drained()
    assert warm._prefix_cache.hits == 1

    cold = make_engine(models, num_lanes=1, kv_quant=True)
    c1 = cold.submit(p1, max_new_tokens=10)
    c2 = cold.submit(p2, max_new_tokens=10)
    cold.run_until_drained()
    np.testing.assert_array_equal(r1.output_ids, c1.output_ids)
    np.testing.assert_array_equal(r2.output_ids, c2.output_ids)


# -- prefill-ahead (speculative pre-admission) ------------------------------


def test_prefill_ahead_token_parity(models):
    """With more requests than lanes and prefill_ahead on, every request's
    output must match the plain engine's (staging only moves the prefill off
    the turnaround critical path; same executables, same per-request key)."""
    prompts = [np.asarray([3 + i, 4, 5 + (i % 3)]) for i in range(7)]
    base = make_engine(models, num_lanes=2)
    base_reqs = [base.submit(p) for p in prompts]
    base.run_until_drained()

    eng = make_engine(models, num_lanes=2, prefill_ahead=3)
    reqs = [eng.submit(p) for p in prompts]
    eng.run_until_drained()
    assert not eng._staged
    for r, b in zip(reqs, base_reqs):
        assert r.error is None
        np.testing.assert_array_equal(r.output_ids, b.output_ids)


def test_prefill_ahead_stages_while_lanes_busy(models):
    """Staging must actually happen: with all lanes busy and a deep queue,
    stepping the engine fills the staged list up to the cap before any lane
    frees."""
    eng = make_engine(models, num_lanes=2, max_new_tokens=12,
                      prefill_ahead=2, overlap=False)
    for i in range(6):
        eng.submit(np.asarray([3 + i, 4, 5]))
    eng.step()  # admits 2 into lanes
    assert sum(r is not None for r in eng._lane_req) == 2
    eng.step()  # all lanes busy -> stages up to cap
    assert len(eng._staged) == 2
    eng.run_until_drained()
    assert not eng._staged
    assert all(r is None for r in eng._lane_req)


def test_prefill_ahead_abort_while_staged(models):
    """A request aborted while its prefill-ahead single is staged must
    complete with the abort finish_reason and never occupy a lane."""
    eng = make_engine(models, num_lanes=2, prefill_ahead=2, overlap=False)
    running = [eng.submit(np.asarray([3 + i, 4, 5])) for i in range(2)]
    victim = eng.submit(np.asarray([9, 9, 9]))
    eng.step()
    eng.step()  # victim now staged
    assert any(r.rid == victim.rid for r, _ in eng._staged)
    assert eng.abort(victim.rid)
    eng.run_until_drained()
    assert victim.meta_info["finish_reason"]["type"] == "abort"
    for r in running:
        assert r.error is None and r.output_ids is not None


def test_pipeline_depth2_matches_depth1(models):
    """Two windows in flight (pipeline_depth=2) must produce token-identical
    outputs to the classic one-deep overlap — the depth only moves WHEN
    retire/admit decisions happen, never what any lane computes."""
    prompts = [np.asarray([5 + i, 6, 7, 8 + (i % 3)]) for i in range(7)]
    outs = []
    for depth in (1, 2):
        eng = make_engine(models, num_lanes=3, pipeline_depth=depth)
        reqs = [eng.submit(p) for p in prompts]
        eng.run_until_drained()
        assert all(r.error is None and r.output_ids is not None for r in reqs)
        assert not eng._peek_pending
        outs.append([r.output_ids.tolist() for r in reqs])
    assert outs[0] == outs[1]


def test_pipeline_depth2_abort_and_stream(models):
    """Aborts and streaming consumers still work with a 2-deep pipeline (the
    harvest they ride arrives one window later)."""
    eng = make_engine(models, num_lanes=2, pipeline_depth=2)
    a = eng.submit(np.asarray([5, 6, 7]), stream=True)
    b = eng.submit(np.asarray([9, 10, 11]))
    eng.step()
    assert eng.abort(b.rid)
    eng.run_until_drained()
    assert a.error is None and a.output_ids is not None
    assert b.meta_info["finish_reason"]["type"] == "abort"
    chunks = []
    while True:
        item = a.stream_queue.get(timeout=5)
        chunks.append(item)
        if item.get("finished"):
            break
    got = [t for c in chunks for t in c.get("token_ids", [])]
    assert got == a.output_ids[0, 3:].tolist()


def test_set_steps_per_sync_swaps_window(models):
    """The A/B helper swaps the scheduling window on an idle engine (same
    device buffers, lazily compiled executable) and refuses on a busy one."""
    eng = make_engine(models, num_lanes=2, steps_per_sync=2)
    a = eng.submit(np.asarray([5, 6, 7]))
    eng.step()
    with pytest.raises(RuntimeError):
        eng.set_steps_per_sync(4)
    eng.run_until_drained()
    ref = a.output_ids
    eng.set_steps_per_sync(4)
    assert eng._max_window == 4 and 4 in eng._cycle_fns
    b = eng.submit(np.asarray([5, 6, 7]))
    eng.run_until_drained()
    np.testing.assert_array_equal(b.output_ids, ref)  # window size never changes tokens
