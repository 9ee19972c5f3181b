"""Measure the windowed dynamic-scheduler policy on the chip (round-4
directive 1): EWMA dynamic vs fixed-16 through the SAME policy harness at
--policy-window {1, 8, 16}.

Round-3 record (docs/RESULTS.md): per-cycle-synced dynamic ran at 0.66x of
fixed-16 because every cycle paid a ~90 ms tunnel RTT.  The windowed
dispatch (spec/policy.py _window_impl) amortizes that sync over N steady
cycles; this run produces the numbers of record for it.  Reference
comparison: its dynamic ran at 0.94x of fixed (results.md:85-116).

One process; each (mode, window) pair warms its executables on a throwaway
prompt, then measures --samples distinct prompts.
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
    p.add_argument("--out", default="docs/measurements/policy_window.json")
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--quant", default="int8")
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--samples", type=int, default=4)
    p.add_argument("--tau16", type=float, default=7.48)
    p.add_argument("--candidates", default="8,12,16")
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except RuntimeError:
            pass
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    import numpy as np

    from dflash_tpu.bench.cli import _resolve_models, make_forced_acc_by_bs
    from dflash_tpu.sched import EWMAScheduler, SchedulerConfig
    from dflash_tpu.spec import SpecEngine
    from dflash_tpu.spec.policy import policy_generate

    class _A:
        model_name_or_path = args.model
        draft_name_or_path = "auto:1"
        dtype = "bfloat16"
        quant = args.quant

    tcfg, dcfg, t_params, d_params = _resolve_models(_A())
    candidates = sorted(int(x) for x in args.candidates.split(","))
    B = max(max(candidates), dcfg.block_size)
    engine = SpecEngine(
        tcfg, dcfg, t_params, d_params,
        max_new_tokens=args.max_new_tokens, block_size=B,
        prompt_cap=128, prompt_bucket=128, stop_token_ids=(),
    )
    forced_by_bs = make_forced_acc_by_bs(
        args.max_new_tokens, sorted(set(candidates) | {16}), args.tau16, 0
    )
    prompts = [
        np.random.default_rng(s).integers(1, tcfg.vocab_size - 2, size=(1, 117))
        for s in range(1 + args.samples)
    ]

    def run(mode, window):
        def one(prompt):
            sched = None
            fixed = None
            if mode == "fixed":
                fixed = 16
            else:
                sched = EWMAScheduler(SchedulerConfig(
                    candidates=tuple(candidates), mode="ewma", warmup_cycles=6,
                ))
            t0 = time.perf_counter()
            res, used, _, snap = policy_generate(
                engine, prompt, scheduler=sched, fixed_block_size=fixed,
                temperature=0.0, forced_acc_by_bs=forced_by_bs, window=window,
            )
            return res, used, snap, time.perf_counter() - t0

        one(prompts[0])  # warmup compile
        tpots, taus, switch_rates, usage = [], [], [], {}
        for i in range(args.samples):
            res, used, snap, _w = one(prompts[1 + i])
            tpots.append(res.time_per_output_token)
            taus.append(float(np.mean(res.acceptance_lengths)))
            switches = sum(1 for a, b in zip(used, used[1:]) if a != b)
            switch_rates.append(switches / max(1, len(used) - 1))
            for b in used:
                usage[b] = usage.get(b, 0) + 1
        tpots.sort()
        tot = sum(usage.values())
        row = {
            "mode": mode, "window": window,
            "tpot_ms": round(tpots[len(tpots) // 2] * 1e3, 3),
            "tok_s": round(1e3 / (tpots[len(tpots) // 2] * 1e3), 1),
            "tau": round(float(np.mean(taus)), 3),
            "switch_rate": round(float(np.mean(switch_rates)), 4),
            "usage": {str(k): round(v / tot, 3) for k, v in sorted(usage.items())},
            "spread_ms": [round(t * 1e3, 3) for t in tpots],
        }
        print(json.dumps(row), flush=True)
        return row

    rows = []
    for window in (1, 8, 16):
        rows.append(run("fixed", window))
        rows.append(run("ewma", window))

    # summary: dynamic/fixed ratio per window
    for window in (1, 8, 16):
        f = next(r for r in rows if r["mode"] == "fixed" and r["window"] == window)
        e = next(r for r in rows if r["mode"] == "ewma" and r["window"] == window)
        print(json.dumps({"summary_window": window,
                          "dynamic_vs_fixed_x": round(f["tpot_ms"] / e["tpot_ms"], 4)}),
              flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=1)
    print(f"[measure] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
