"""Settle the steps_per_sync default (round-5 directive 7).

Round 4 moved the engine default 2 -> 4 on a 4-pair interleaved A/B at
conc 16 whose median delta (+1.3%) sat inside the documented ±10% run-to-run
band (all 4 pairs agreed on the sign).  This extends it: >= 8 interleaved
pairs at BOTH conc 16 and conc 32, same engine (the window executable is
swapped with ContinuousBatchingEngine.set_steps_per_sync — no second engine,
no extra device memory), alternating A/B order within each pair to cancel
drift.  Decision rule: keep 4 if it wins the pairwise majority at both
concurrencies, else revert to the winner.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/measurements/sps_ab_r5.json")
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--quant", default="int8")
    p.add_argument("--num-lanes", type=int, default=16)
    p.add_argument("--num-requests", type=int, default=64)
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--pairs", type=int, default=8)
    p.add_argument("--arms", default="2,4")
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

    arms = [int(a) for a in args.arms.split(",")]

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
            block_size=dcfg.block_size, prompt_cap=256,
            steps_per_sync=arms[0], emulate_tau=7.46,
        ),
    )
    server = EngineHTTPServer(engine, port=0, tokenizer=SyntheticTokenizer(tcfg.vocab_size))
    server.start()
    url = f"http://{server.host}:{server.port}"
    rng = np.random.default_rng(0)
    prompts = [rng.integers(10, tcfg.vocab_size - 10, size=(64,)).tolist()
               for _ in range(args.num_requests)]

    def run(sps, conc):
        engine.set_steps_per_sync(sps)
        _flush(url)
        m = run_bench_requests(url, prompts, conc, args.max_new_tokens)
        return round(m.tokens_per_sec, 1)

    rows = []
    try:
        # warm every (sps, conc) executable before any timed pair
        for sps in arms:
            run(sps, 16)
        for conc in (16, 32):
            for pair in range(args.pairs):
                order = arms if pair % 2 == 0 else arms[::-1]
                res = {}
                for sps in order:
                    res[sps] = run(sps, conc)
                row = {"conc": conc, "pair": pair,
                       "order": order, **{f"sps{k}": v for k, v in res.items()}}
                rows.append(row)
                print(json.dumps(row), flush=True)
    finally:
        server.stop()

    # pairwise verdict
    verdict = {}
    for conc in (16, 32):
        sub = [r for r in rows if r["conc"] == conc]
        a, b = arms
        wins_b = sum(1 for r in sub if r[f"sps{b}"] > r[f"sps{a}"])
        med = lambda k: sorted(r[k] for r in sub)[len(sub) // 2]
        verdict[f"conc{conc}"] = {
            f"sps{a}_median": med(f"sps{a}"), f"sps{b}_median": med(f"sps{b}"),
            f"sps{b}_pairwise_wins": f"{wins_b}/{len(sub)}",
        }
    print(json.dumps({"verdict": verdict}), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "rows": rows, "verdict": verdict}, f, indent=1)
    print(f"[measure] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
