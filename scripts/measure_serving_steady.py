"""Serving steady-state protocol (round-5 directive 6).

The round-4 ceiling accounting left its residual as "drain/ramp at 96
requests".  This quantifies it: the closed-loop request-count sweep
(96 / 256 / 512 at conc 16 and 32) amortizes the cohort edges — the ramp
(first conc admissions serialize) and the drain (the last lanes trickle out)
are fixed costs, so tok/s vs n_req isolates their share — plus a
steady-window estimate (throughput over the middle of the run only, from
per-request completion timestamps) and an open-loop Poisson-arrival variant
at ~90% of the measured service rate (the SGLang-style arrival pattern the
closed loop can't produce).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/measurements/serving_steady.json")
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--quant", default="int8")
    p.add_argument("--num-lanes", type=int, default=16)
    p.add_argument("--max-new-tokens", type=int, default=256)
    args = p.parse_args()

    from dflash_tpu.bench.serving import (
        _flush,
        _honor_jax_platforms_env,
        _post,
    )

    _honor_jax_platforms_env()
    from dflash_tpu.core.jaxcache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    import numpy as np
    from concurrent.futures import ThreadPoolExecutor

    from dflash_tpu.bench.cli import _resolve_models
    from dflash_tpu.bench.tokenizer import SyntheticTokenizer
    from dflash_tpu.engine import ContinuousBatchingEngine, EngineConfig
    from dflash_tpu.engine.server import EngineHTTPServer

    class _A:
        model_name_or_path = args.model
        draft_name_or_path = "auto:1"
        dtype = "bfloat16"
        quant = args.quant

    tcfg, dcfg, t_params, d_params = _resolve_models(_A())
    engine = ContinuousBatchingEngine(
        tcfg, dcfg, t_params, d_params,
        EngineConfig(
            num_lanes=args.num_lanes, max_new_tokens=args.max_new_tokens,
            block_size=dcfg.block_size, prompt_cap=256, emulate_tau=7.46,
        ),
    )
    server = EngineHTTPServer(engine, port=0, tokenizer=SyntheticTokenizer(tcfg.vocab_size))
    server.start()
    url = f"http://{server.host}:{server.port}"
    rng = np.random.default_rng(0)

    def mk_prompts(n):
        return [rng.integers(10, tcfg.vocab_size - 10, size=(64,)).tolist()
                for _ in range(n)]

    def payload(ids):
        return {"input_ids": ids,
                "sampling_params": {"max_new_tokens": args.max_new_tokens,
                                    "temperature": 0.0}}

    def closed(n_req, conc):
        """Closed-loop with per-request completion timestamps; returns whole-
        run tok/s plus a mid-run steady tok/s (tokens completing in the
        middle 60% of the time span, over that span)."""
        prompts = mk_prompts(n_req)
        _flush(url)
        t0 = time.perf_counter()
        marks = []
        lock = threading.Lock()

        def one(ids):
            r = _post(url, payload(ids))
            with lock:
                marks.append((time.perf_counter() - t0,
                              r["meta_info"]["completion_tokens"]))

        with ThreadPoolExecutor(max_workers=conc) as pool:
            list(pool.map(one, prompts))
        wall = time.perf_counter() - t0
        total = sum(t for _, t in marks)
        lo, hi = 0.2 * wall, 0.8 * wall
        mid_tokens = sum(t for ts, t in marks if lo < ts <= hi)
        steady = mid_tokens / max(1e-9, hi - lo)
        return {"tok_s": round(total / wall, 1), "wall_s": round(wall, 2),
                "steady_tok_s": round(steady, 1),
                "edge_share": round(1 - (total / wall) / max(1e-9, steady), 4)}

    def open_loop(n_req, rate_tok_s):
        """Poisson arrivals at ~90% of the given service rate (in requests/s:
        rate_tok_s / max_new_tokens), unbounded client concurrency."""
        lam = 0.9 * rate_tok_s / args.max_new_tokens
        gaps = rng.exponential(1.0 / lam, size=n_req)
        prompts = mk_prompts(n_req)
        _flush(url)
        t0 = time.perf_counter()
        marks = []
        lock = threading.Lock()
        threads = []

        def one(ids, delay):
            time.sleep(max(0.0, delay - (time.perf_counter() - t0)))
            r = _post(url, payload(ids))
            with lock:
                marks.append((time.perf_counter() - t0,
                              r["meta_info"]["completion_tokens"]))

        at = 0.0
        for ids, g in zip(prompts, gaps):
            at += g
            th = threading.Thread(target=one, args=(ids, at), daemon=True)
            th.start()
            threads.append(th)
        for th in threads:
            th.join(timeout=600)
        wall = time.perf_counter() - t0
        total = sum(t for _, t in marks)
        lo, hi = 0.2 * wall, 0.8 * wall
        mid_tokens = sum(t for ts, t in marks if lo < ts <= hi)
        return {"arrival_rps": round(lam, 2), "tok_s": round(total / wall, 1),
                "steady_tok_s": round(mid_tokens / max(1e-9, hi - lo), 1),
                "wall_s": round(wall, 2), "n_done": len(marks)}

    rows = []

    def emit(label, d):
        row = {"label": label, **d}
        rows.append(row)
        print(json.dumps(row), flush=True)

    try:
        # warm both conc shapes
        closed(8, 16)
        for conc in (16, 32):
            for n_req in (96, 256, 512):
                emit(f"closed_c{conc}_n{n_req}", closed(n_req, conc))
        # open loop at ~90% of the measured conc-16 steady rate
        base = next(r for r in rows if r["label"] == "closed_c16_n256")
        emit("open_poisson_n256", open_loop(256, base["steady_tok_s"]))
    finally:
        server.stop()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=1)
    print(f"[measure] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
