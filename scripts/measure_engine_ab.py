"""Interleaved A/B of two serving-engine configurations.

Generalization of measure_prefill_ahead.py: each arm is a JSON dict of
EngineConfig overrides (e.g. '{"steps_per_sync": 4}'), both engines serve
the same workload through the full HTTP path, reps interleaved A/B/A/B so
tunnel drift hits both arms equally.  Medians decide; single runs through
the tunneled runtime jitter +-10% (docs/RESULTS.md "Variance").
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
    p.add_argument("--arm-a", default='{"steps_per_sync": 2}',
                   help="JSON EngineConfig overrides for arm A")
    p.add_argument("--arm-b", default='{"steps_per_sync": 4}',
                   help="JSON EngineConfig overrides for arm B")
    p.add_argument("--out", default="docs/measurements/engine_ab.json")
    p.add_argument("--num-lanes", type=int, default=16)
    p.add_argument("--num-requests", type=int, default=96)
    p.add_argument("--conc", type=int, default=16)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--reps", type=int, default=3)
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
        model_name_or_path = "qwen3-4b"
        draft_name_or_path = "auto:1"
        dtype = "bfloat16"
        quant = "int8"

    tcfg, dcfg, t_params, d_params = _resolve_models(_A())

    def build(overrides: dict):
        base = dict(
            num_lanes=args.num_lanes, max_new_tokens=args.max_new_tokens,
            block_size=dcfg.block_size, prompt_cap=256, steps_per_sync=2,
            emulate_tau=7.46,
        )
        base.update(overrides)
        engine = ContinuousBatchingEngine(
            tcfg, dcfg, t_params, d_params, EngineConfig(**base)
        )
        server = EngineHTTPServer(
            engine, port=0, tokenizer=SyntheticTokenizer(tcfg.vocab_size)
        )
        server.start()
        return server, f"http://{server.host}:{server.port}"

    arm_a = json.loads(args.arm_a)
    arm_b = json.loads(args.arm_b)
    arms = {
        "A " + json.dumps(arm_a, sort_keys=True): build(arm_a),
        "B " + json.dumps(arm_b, sort_keys=True): build(arm_b),
    }
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(10, tcfg.vocab_size - 10, size=(args.prompt_len,)).tolist()
        for _ in range(args.num_requests)
    ]

    rows = []
    try:
        for name, (server, url) in arms.items():
            print(f"[ab] warmup {name}...", file=sys.stderr, flush=True)
            run_bench_requests(url, prompts[: 2 * args.num_lanes], args.conc,
                               args.max_new_tokens)
        for rep in range(args.reps):
            for name, (server, url) in arms.items():
                _flush(url)
                m = run_bench_requests(url, prompts, args.conc,
                                       args.max_new_tokens)
                row = {"arm": name, "rep": rep,
                       "tok_s": round(m.tokens_per_sec, 1),
                       "wall_s": round(m.wall_s, 3)}
                print(json.dumps(row), flush=True)
                rows.append(row)
    finally:
        for server, url in arms.values():
            server.stop()

    def med(name):
        xs = sorted(r["tok_s"] for r in rows if r["arm"] == name)
        return xs[len(xs) // 2] if xs else None

    summary = {name: med(name) for name in arms}
    print(json.dumps({"medians": summary}), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "rows": rows, "medians": summary}, f,
                  indent=1)
    print(f"[ab] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
