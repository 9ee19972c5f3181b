"""Two dispatch windows in flight — measure or reject (round-5 directive 3).

The round-4 serving-gap decomposition measured a ~5-6 ms/window dispatch
cost through the tunneled runtime and a 1-deep overlap pipeline; VERDICT
asked for a depth-2 pipeline (issue window N+1 before harvesting N-1) and an
A/B with the same rigor as prefill-ahead's rejection.  This interleaves
pipeline_depth 1 vs 2 on ONE engine (the depth is a pure host-loop knob —
same executables), alternating order per pair, with lane-occupancy
accounting so the retire-lag cost of the deeper pipeline is visible.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/measurements/serving_depth.json")
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--quant", default="int8")
    p.add_argument("--num-lanes", type=int, default=16)
    p.add_argument("--num-requests", type=int, default=96)
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--pairs", type=int, default=8)
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
            block_size=dcfg.block_size, prompt_cap=256,
            emulate_tau=7.46,
        ),
    )

    stats = {"slots": 0, "busy": 0}
    orig_step = engine.step

    def counting_step():
        n_active = sum(r is not None for r in engine._lane_req)
        out = orig_step()
        if n_active > 0:
            stats["slots"] += engine.cfg.num_lanes * engine.cfg.steps_per_sync
            stats["busy"] += n_active * engine.cfg.steps_per_sync
        return out

    engine.step = counting_step
    server = EngineHTTPServer(engine, port=0, tokenizer=SyntheticTokenizer(tcfg.vocab_size))
    server.start()
    url = f"http://{server.host}:{server.port}"
    rng = np.random.default_rng(0)
    prompts = [rng.integers(10, tcfg.vocab_size - 10, size=(64,)).tolist()
               for _ in range(args.num_requests)]

    def run(depth, conc):
        engine.cfg = dataclasses.replace(engine.cfg, pipeline_depth=depth)
        _flush(url)
        stats["slots"] = stats["busy"] = 0
        m = run_bench_requests(url, prompts, conc, args.max_new_tokens)
        occ = stats["busy"] / max(1, stats["slots"])
        return round(m.tokens_per_sec, 1), round(occ, 4)

    rows = []
    try:
        run(1, 16)  # warm
        for conc in (16, 32):
            n_pairs = args.pairs if conc == 16 else max(4, args.pairs // 2)
            for pair in range(n_pairs):
                order = (1, 2) if pair % 2 == 0 else (2, 1)
                res = {}
                for d in order:
                    tok, occ = run(d, conc)
                    res[f"d{d}"] = tok
                    res[f"d{d}_occ"] = occ
                row = {"conc": conc, "pair": pair, "order": list(order), **res}
                rows.append(row)
                print(json.dumps(row), flush=True)
    finally:
        server.stop()

    verdict = {}
    for conc in (16, 32):
        sub = [r for r in rows if r["conc"] == conc]
        if not sub:
            continue
        wins2 = sum(1 for r in sub if r["d2"] > r["d1"])
        med = lambda k: sorted(r[k] for r in sub)[len(sub) // 2]
        verdict[f"conc{conc}"] = {
            "d1_median": med("d1"), "d2_median": med("d2"),
            "d1_occ_median": med("d1_occ"), "d2_occ_median": med("d2_occ"),
            "d2_pairwise_wins": f"{wins2}/{len(sub)}",
        }
    print(json.dumps({"verdict": verdict}), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "rows": rows, "verdict": verdict}, f, indent=1)
    print(f"[measure] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
