"""Measure serving cost of wide top-k (round-4 directive 5).

The exact sampler's keep set is pool-independent; a request with top_k far
beyond the engine's `topk_pool` seed pays bit-space bisection rounds inside
the cycle.  This puts a number on that: 16-lane serving throughput at
temperature 0.7 for top_k in {off, 20 (in-pool), 1024, 65536} against one
engine (pool=64) — same executables, per-lane filter values.
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
    p.add_argument("--out", default="docs/measurements/wide_topk.json")
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--quant", default="int8")
    p.add_argument("--num-lanes", type=int, default=16)
    p.add_argument("--num-requests", type=int, default=32)
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--reps", type=int, default=2)
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
            num_lanes=args.num_lanes, max_new_tokens=args.max_new_tokens,
            block_size=dcfg.block_size, prompt_cap=128, steps_per_sync=2,
            emulate_tau=7.46, temperature=0.7, sampling_filters=True,
            topk_pool=64,
        ),
    )
    server = EngineHTTPServer(engine, port=0, tokenizer=SyntheticTokenizer(tcfg.vocab_size))
    server.start()
    url = f"http://{server.host}:{server.port}"
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(10, tcfg.vocab_size - 10, size=(64,)).tolist()
        for _ in range(args.num_requests)
    ]

    points = [
        ("filters_off", 0, 1.0),
        ("topk20_topp95 (in pool)", 20, 0.95),
        ("topk1024 (16x pool)", 1024, 1.0),
        ("topk65536 (1024x pool)", 65536, 1.0),
        ("topp0.95 only", 0, 0.95),
    ]
    rows = []
    try:
        print("[measure] warmup...", file=sys.stderr, flush=True)
        run_bench_requests(url, prompts[:2], 2, args.max_new_tokens,
                           temperature=0.7, top_k=20, top_p=0.95)
        for rep in range(args.reps):
            for label, k, tp in points:
                _flush(url)
                m = run_bench_requests(url, prompts, 16, args.max_new_tokens,
                                       temperature=0.7, top_k=k, top_p=tp)
                row = {"label": label, "top_k": k, "top_p": tp, "rep": rep,
                       "tok_s": round(m.tokens_per_sec, 1),
                       "wall_s": round(m.wall_s, 3)}
                rows.append(row)
                print(json.dumps(row), flush=True)
    finally:
        server.stop()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=1)
    print(f"[measure] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
