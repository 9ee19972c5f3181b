"""Decompose the serving-vs-raw-batched-ceiling gap (round-4 directive 7).

The raw 16-lane batched decode ceiling (bench.py BENCH_LANES=16) has every
lane decoding continuously with no admission, no retire lag and no drain
tail.  The HTTP serving path pays all three.  This run separates them:

  * request-count sweep (32 / 64 / 128 requests at conc 16/32): the drain
    tail and the cold ramp amortize with run length;
  * prompt-length sweep (8 vs 64 vs 256): admission prefill FLOPs scale
    with prompt length, everything else stays fixed;
  * lane-occupancy accounting: engine.step is wrapped to integrate
    active-lanes x window over the run, so the occupancy share of the gap
    is measured, not estimated.
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
    p.add_argument("--out", default="docs/measurements/serving_ceiling.json")
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--quant", default="int8")
    p.add_argument("--num-lanes", type=int, default=16)
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
            block_size=dcfg.block_size, prompt_cap=256, steps_per_sync=2,
            emulate_tau=7.46,
        ),
    )

    # occupancy accounting: integrate active lanes x dispatched windows
    stats = {"slots": 0, "busy": 0}
    orig_step = engine.step

    def counting_step():
        n_active = sum(r is not None for r in engine._lane_req)
        out = orig_step()
        if n_active > 0:  # a window was dispatched this step
            stats["slots"] += engine.cfg.num_lanes * engine.cfg.steps_per_sync
            stats["busy"] += n_active * engine.cfg.steps_per_sync
        return out

    engine.step = counting_step

    server = EngineHTTPServer(engine, port=0, tokenizer=SyntheticTokenizer(tcfg.vocab_size))
    server.start()
    url = f"http://{server.host}:{server.port}"
    rng = np.random.default_rng(0)

    def point(label, n_req, conc, plen):
        prompts = [rng.integers(10, tcfg.vocab_size - 10, size=(plen,)).tolist()
                   for _ in range(n_req)]
        _flush(url)
        stats["slots"] = stats["busy"] = 0
        m = run_bench_requests(url, prompts, conc, args.max_new_tokens)
        occ = stats["busy"] / max(1, stats["slots"])
        row = {"label": label, "n_req": n_req, "conc": conc, "prompt_len": plen,
               "tok_s": round(m.tokens_per_sec, 1), "wall_s": round(m.wall_s, 3),
               "occupancy": round(occ, 4)}
        print(json.dumps(row), flush=True)
        return row

    rows = []
    try:
        print("[measure] warmup...", file=sys.stderr, flush=True)
        warm = [rng.integers(10, tcfg.vocab_size - 10, size=(64,)).tolist()
                for _ in range(2)]
        run_bench_requests(url, warm, 2, args.max_new_tokens)
        # also warm the 256-bucket prefill
        run_bench_requests(
            url, [rng.integers(10, tcfg.vocab_size - 10, size=(256,)).tolist()],
            1, args.max_new_tokens)
        for rep in range(2):
            rows.append(point(f"base_r{rep}", 32, 16, 64))
            rows.append(point(f"longrun_r{rep}", 64, 16, 64))
            rows.append(point(f"conc32_r{rep}", 128, 32, 64))
            rows.append(point(f"shortprompt_r{rep}", 64, 16, 8))
            rows.append(point(f"longprompt_r{rep}", 64, 16, 256))
    finally:
        server.stop()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=1)
    print(f"[measure] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
