"""Host-side phase timing of the serving engine's overlapped step loop.

Serving windows at conc 16 take ~69 ms wall vs ~46 ms of pure device decode
(2 cycles x ~23 ms) — this instrument splits a step into dispatch /
peek-issue / prefill-tasks+staging / harvest(blocking readback) / admission
and reports per-phase means over a real HTTP-driven run, so the residual
serving-vs-raw gap is attributed with data, not guesses.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/measurements/step_phases.json")
    p.add_argument("--num-lanes", type=int, default=16)
    p.add_argument("--num-requests", type=int, default=96)
    p.add_argument("--conc", type=int, default=16)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--max-new-tokens", type=int, default=256)
    args = p.parse_args()

    from dflash_tpu.bench.serving import (
        _flush,
        _honor_jax_platforms_env,
        run_bench_requests,
    )

    _honor_jax_platforms_env()
    from dflash_tpu.core.jaxcache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    import numpy as np

    from dflash_tpu.bench.cli import _resolve_models
    from dflash_tpu.bench.tokenizer import SyntheticTokenizer
    from dflash_tpu.engine import ContinuousBatchingEngine, EngineConfig
    from dflash_tpu.engine.batching import _peek_impl
    from dflash_tpu.engine.server import EngineHTTPServer

    class _A:
        model_name_or_path = "qwen3-4b"
        draft_name_or_path = "auto:1"
        dtype = "bfloat16"
        quant = "int8"

    tcfg, dcfg, t_params, d_params = _resolve_models(_A())
    engine = ContinuousBatchingEngine(
        tcfg, dcfg, t_params, d_params,
        EngineConfig(
            num_lanes=args.num_lanes, max_new_tokens=args.max_new_tokens,
            block_size=dcfg.block_size, prompt_cap=256, steps_per_sync=2,
            emulate_tau=7.46,
        ),
    )

    acc = {k: 0.0 for k in
           ("admit", "dispatch", "peek", "tasks", "harvest", "step_total")}
    cnt = {"steps": 0, "windows": 0, "admissions": 0}

    orig_admit = engine._admit_pending
    orig_dispatch = engine._dispatch_window
    orig_tasks = engine._step_prefill_tasks
    orig_harvest = engine._harvest

    def timed(key, fn):
        def run(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            acc[key] += time.perf_counter() - t0
            return out
        return run

    engine._admit_pending = timed("admit", orig_admit)
    engine._dispatch_window = timed("dispatch", orig_dispatch)
    engine._step_prefill_tasks = timed("tasks", orig_tasks)
    engine._harvest = timed("harvest", orig_harvest)

    def step():
        # mirror of ContinuousBatchingEngine.step (overlap mode) with the
        # peek phase timed separately
        t_step = time.perf_counter()
        engine._drain_disagg()
        before = sum(r is not None for r in engine._lane_req)
        engine._admit_pending()
        after = sum(r is not None for r in engine._lane_req)
        cnt["admissions"] += max(0, after - before)
        n_active = after
        new_peek = None
        if n_active > 0:
            engine._dispatch_window()
            t0 = time.perf_counter()
            peek = _peek_impl(engine._state)
            for leaf in peek:
                leaf.copy_to_host_async()
            acc["peek"] += time.perf_counter() - t0
            new_peek = (peek, engine._lane_epoch.copy())
            cnt["windows"] += 1
        engine._step_prefill_tasks()
        engine._stage_pending()
        if new_peek is not None:
            engine._peek_pending.append(new_peek)
            while len(engine._peek_pending) > max(1, engine.cfg.pipeline_depth):
                engine._harvest(engine._peek_pending.popleft())
        else:
            while engine._peek_pending:
                engine._harvest(engine._peek_pending.popleft())
        cnt["steps"] += 1
        acc["step_total"] += time.perf_counter() - t_step
        return (n_active + len(engine._prefill_tasks) + engine._disagg_pending
                + len(engine._staged))

    engine.step = step

    server = EngineHTTPServer(
        engine, port=0, tokenizer=SyntheticTokenizer(tcfg.vocab_size)
    )
    server.start()
    url = f"http://{server.host}:{server.port}"
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(10, tcfg.vocab_size - 10, size=(args.prompt_len,)).tolist()
        for _ in range(args.num_requests)
    ]
    try:
        print("[phases] warmup...", file=sys.stderr, flush=True)
        run_bench_requests(url, prompts[: 2 * args.num_lanes], args.conc,
                           args.max_new_tokens)
        _flush(url)
        for k in acc:
            acc[k] = 0.0
        for k in cnt:
            cnt[k] = 0
        m = run_bench_requests(url, prompts, args.conc, args.max_new_tokens)
    finally:
        server.stop()

    w = max(1, cnt["windows"])
    report = {
        "tok_s": round(m.tokens_per_sec, 1),
        "wall_s": round(m.wall_s, 3),
        "windows": cnt["windows"],
        "steps": cnt["steps"],
        "admissions": cnt["admissions"],
        "ms_per_window": {k: round(1e3 * acc[k] / w, 2) for k in acc},
    }
    print(json.dumps(report, indent=1), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "report": report}, f, indent=1)
    print(f"[phases] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
