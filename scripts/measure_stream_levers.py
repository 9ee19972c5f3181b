"""Measure the round-3 streaming lever on the chip: stream_interval sweep.

Replaces the stale docs/RESULTS.md streaming record (2200 vs 3512 tok/s, -37%,
measured BEFORE stream_interval existed).  One engine process serves every
sweep point: stream_interval is host-side harvest cadence (engine/batching.py
_harvest), so mutating cfg between runs costs zero recompiles and every row
shares identical executables.

Usage:  python scripts/measure_stream_levers.py [--out docs/measurements/stream_levers.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/measurements/stream_levers.json")
    p.add_argument("--num-lanes", type=int, default=16)
    p.add_argument("--num-requests", type=int, default=32)
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--quant", default="int8")
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
            num_lanes=args.num_lanes,
            max_new_tokens=args.max_new_tokens,
            block_size=dcfg.block_size,
            prompt_cap=128,
            steps_per_sync=2,
            emulate_tau=7.46,
            stream_interval=4,
        ),
    )
    server = EngineHTTPServer(engine, port=0, tokenizer=SyntheticTokenizer(tcfg.vocab_size))
    server.start()
    url = f"http://{server.host}:{server.port}"

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(10, tcfg.vocab_size - 10, size=(args.prompt_len,)).tolist()
        for _ in range(args.num_requests)
    ]

    def point(label, conc, stream, interval, rep):
        engine.cfg.stream_interval = interval
        _flush(url)
        m = run_bench_requests(url, prompts, conc, args.max_new_tokens, stream=stream)
        row = {
            "label": label, "conc": conc, "stream": stream,
            "stream_interval": interval, "rep": rep,
            "tok_s": round(m.tokens_per_sec, 1), "wall_s": round(m.wall_s, 3),
            "accept_len": round(m.mean_accept_length, 2),
        }
        print(json.dumps(row), flush=True)
        return row

    rows = []
    try:
        print("[measure] warmup (compiles)...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        run_bench_requests(url, prompts[:2], 2, args.max_new_tokens)
        run_bench_requests(url, prompts[:2], 2, args.max_new_tokens, stream=True)
        print(f"[measure] warmup done in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        for rep in range(args.reps):
            rows.append(point("nonstream", 16, False, 4, rep))
            for si in (1, 2, 4, 8):
                rows.append(point(f"stream_si{si}", 16, True, si, rep))
            rows.append(point("nonstream_end", 16, False, 4, rep))
            rows.append(point("nonstream_c32", 32, False, 4, rep))
            rows.append(point("stream_si4_c32", 32, True, 4, rep))
    finally:
        server.stop()

    import os

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=1)
    print(f"[measure] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
