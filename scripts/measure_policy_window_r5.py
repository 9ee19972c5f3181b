"""Probe-batched windowed dynamic scheduling vs windowed fixed (round-5
directive 4).

Round 4 measured windowed dynamic at 0.72-0.76x of windowed fixed-16 and
proved the entire residual is warmup/probe cycles dispatching singly
(docs/measurements/policy_window_probes.json: probes-off -> 0.76x).  Round 5
batches them (spec/policy.py mixed-schedule windows: warmup round-robin in
one dispatch, each probe as a window prefix).  This measures, at the same
forced-tau protocol (reference block-sweep curve rescaled to tau16,
results.md:9-16):

  * fixed-16 windowed (the bar),
  * dynamic windowed, probes SINGLE (probe_windows=False — the round-4 path),
  * dynamic windowed, probes BATCHED (the new default).

Done bar: batched dynamic >= 0.9x of windowed fixed-16.

Executable warmup: mixed-window pairs (probe_bs, current_bs) compile
lazily, and `current` can move mid-run — so warmup runs one generation per
forced-current value, covering every pair before any timed rep.
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
    p.add_argument("--out", default="docs/measurements/policy_window_r5.json")
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--quant", default="int8")
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--samples", type=int, default=4)
    p.add_argument("--tau16", type=float, default=7.48)
    p.add_argument("--candidates", default="8,12,16")
    p.add_argument("--window", type=int, default=16)
    p.add_argument("--probe-interval", type=int, default=24)
    p.add_argument("--only", default=None,
                   help="substring filter: run only matching rows")
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

    def sched_cfg(**kw):
        base = dict(
            candidates=tuple(candidates), mode="ewma", warmup_cycles=6,
            probe_interval=args.probe_interval,
        )
        base.update(kw)
        return SchedulerConfig(**base)

    def one(prompt, mode, probe_windows, force_current=None, cfg_kw=None):
        sched = None
        fixed = None
        if mode == "fixed":
            fixed = 16
        else:
            sched = EWMAScheduler(sched_cfg(**(cfg_kw or {})))
            if force_current is not None:
                sched.current = force_current
        res, used, _, snap = policy_generate(
            engine, prompt, scheduler=sched, fixed_block_size=fixed,
            temperature=0.0, forced_acc_by_bs=forced_by_bs,
            window=args.window, probe_windows=probe_windows,
        )
        return res, used, snap

    def run(label, mode, probe_windows, cfg_kw=None):
        # warm every executable this mode can reach: one full generation per
        # PINNED current (switch_margin=inf disables score switches, so the
        # trajectory deterministically touches every (probe != current) mixed
        # pair via the probe rotation plus the window ladder sizes at that
        # current) — without the pin, a mid-warm switch leaves pairs
        # uncompiled and they poison measured reps (first attempt: spread
        # [3.2, 3.3, 9.8, 12.4] ms)
        if mode == "fixed":
            one(prompts[0], mode, probe_windows)
        else:
            for cur in (candidates if probe_windows else [candidates[-1]]):
                one(prompts[0], mode, probe_windows, force_current=cur,
                    cfg_kw={"switch_margin": 1e9})
        tpots, taus, switch_rates, usage = [], [], [], {}
        for i in range(args.samples):
            t0 = time.perf_counter()
            res, used, snap = one(prompts[1 + i], mode, probe_windows,
                                  cfg_kw=cfg_kw)
            del t0
            tpots.append(res.time_per_output_token)
            taus.append(float(np.mean(res.acceptance_lengths)))
            switches = sum(1 for a, b in zip(used, used[1:]) if a != b)
            switch_rates.append(switches / max(1, len(used) - 1))
            for b in used:
                usage[b] = usage.get(b, 0) + 1
        tpots.sort()
        tot = sum(usage.values())
        row = {
            "label": label, "window": args.window,
            "tpot_ms": round(tpots[len(tpots) // 2] * 1e3, 3),
            "tok_s": round(1e3 / (tpots[len(tpots) // 2] * 1e3), 1),
            "tau": round(float(np.mean(taus)), 3),
            "switch_rate": round(float(np.mean(switch_rates)), 4),
            "usage": {str(k): round(v / tot, 3) for k, v in sorted(usage.items())},
            "spread_ms": [round(t * 1e3, 3) for t in tpots],
        }
        print(json.dumps(row), flush=True)
        return row

    plan = [
        ("fixed-16 windowed", "fixed", False, None),
        ("dynamic probes-single (r4)", "ewma", False, None),
        ("dynamic probes-batched (r5)", "ewma", True, None),
        # churn-damped hysteresis: amortized window walls jitter ±10%
        # through the tunnel, and at flat per-size cycle costs the 8%
        # default margin lets noise flip scores; stronger hysteresis holds
        # the converged size without changing the probing pattern
        ("dynamic probes-batched tuned", "ewma", True,
         {"switch_margin": 0.2, "required_streak": 3, "cooldown_cycles": 12}),
        # shared cycle-cost scoring (sched/ewma.py shared_cost): per-size
        # cost EWMAs are dispatch-cadence artifacts through a high-RTT
        # runtime; one shared denominator makes score ordering follow tau
        ("dynamic probes-batched shared-cost", "ewma", True,
         {"shared_cost": True}),
    ]
    if args.only:
        keep = [p_ for p_ in plan if args.only in p_[0] or p_[1] == "fixed"]
        plan = keep
    rows = [run(lbl, mode, pw, cfg_kw=kw) for lbl, mode, pw, kw in plan]
    fixed_t = rows[0]["tpot_ms"]
    for r in rows[1:]:
        print(json.dumps({
            "summary": r["label"],
            "vs_windowed_fixed": round(fixed_t / r["tpot_ms"], 4),
            "done_bar": 0.9,
        }), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=1)
    print(f"[measure] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
