"""Put real numbers under disaggregated prefill/decode (round-5 directive 5).

Two measurements, matching what one chip + a CPU mesh can prove:

* ``--mode chip`` — the documented single-device ``--disagg`` fallback
  (engine/disagg.py PrefillWorker with prefill_device == decode_device):
  colocated vs disagg serving A/B on the admission-stall workload of
  measure_admission_chunk.py (16 short lanes decoding, 8×2040-token prompts
  injected mid-flight).  Since both roles share the chip, the delta is the
  pure HANDOFF + orchestration overhead (device_put of kv_rows/taps, worker
  thread, resume-path admission) — the number the round-4 "up to ~1.3×"
  projection must be discounted by.

* ``--mode cpumesh`` — 2 virtual CPU devices, tiny random model: the same
  workload with the prefill worker on device 1.  Wall-clock on shared host
  cores is meaningless, so the reported metric is the MECHANICAL one the
  projection rests on: the decode-side scheduling-window stall distribution
  (p95/max step wall during the admission wave) — disagg must remove the
  prefill dispatches from the decode loop's critical path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")


def run_workload(engine, tcfg, *, num_lanes, short_prompt, long_prompt,
                 n_long, seed=0):
    """measure_admission_chunk.py's workload: short lanes decoding, long
    prompts injected mid-flight; returns throughput + stall stats."""
    import numpy as np

    rng = np.random.default_rng(seed)
    mk = lambda n: rng.integers(10, tcfg.vocab_size - 10, size=(n,))
    engine.flush()
    t0 = time.perf_counter()
    shorts = [engine.submit(mk(short_prompt)) for _ in range(num_lanes)]
    step_walls = []
    longs = []
    injected = False
    steps = 0
    while True:
        ts = time.perf_counter()
        active = engine.step()
        step_walls.append((time.perf_counter() - ts, injected))
        steps += 1
        if not injected and steps >= 12:
            longs = [engine.submit(mk(long_prompt)) for _ in range(n_long)]
            injected = True
        if (
            active == 0 and injected
            and not engine._peek_pending
            and engine._queue.empty()
            and not engine._prefill_tasks
            and engine._disagg_pending == 0
            and all(r is None for r in engine._lane_req)
        ):
            break
        if steps > 20000:
            raise RuntimeError("workload did not drain")
    wall = time.perf_counter() - t0
    reqs = shorts + longs
    errs = [r.error for r in reqs if r.error]
    if errs:
        raise RuntimeError(f"request errors: {errs[:3]}")
    toks = sum(r.meta_info["completion_tokens"] for r in reqs)
    post = sorted(w for w, inj in step_walls if inj)
    q = lambda xs, f: xs[min(len(xs) - 1, int(f * len(xs)))] if xs else 0.0
    return {
        "tok_s": round(toks / wall, 1),
        "wall_s": round(wall, 2),
        "stall_p50_ms": round(q(post, 0.5) * 1e3, 1),
        "stall_p95_ms": round(q(post, 0.95) * 1e3, 1),
        "stall_max_ms": round(q(post, 1.0) * 1e3, 1),
    }


def build(tcfg, dcfg, t_params, d_params, *, disagg, num_lanes, max_new,
          prompt_cap, kv_quant=False):
    import jax

    from dflash_tpu.engine import (
        ContinuousBatchingEngine,
        EngineConfig,
        PrefillWorker,
    )

    worker = None
    if disagg:
        devs = jax.devices()
        worker = PrefillWorker(
            tcfg, dcfg, t_params,
            prefill_device=devs[1] if len(devs) > 1 else devs[0],
            decode_device=devs[0], kv_quant=kv_quant,
        )
    return ContinuousBatchingEngine(
        tcfg, dcfg, t_params, d_params,
        prefill_worker=worker,
        cfg=EngineConfig(
            num_lanes=num_lanes, max_new_tokens=max_new,
            block_size=dcfg.block_size, prompt_cap=prompt_cap,
            kv_quant=kv_quant, emulate_tau=7.46,
            # sps=2 matches the round-4-proven memory shape for 16 lanes x
            # 2048-prompt buffers (the sps=4 default OOM'd this workload)
            steps_per_sync=2,
        ),
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("chip", "cpumesh"), default="chip")
    p.add_argument("--out", default=None)
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--quant", default="int8")
    p.add_argument("--num-lanes", type=int, default=16)
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--short-prompt", type=int, default=64)
    p.add_argument("--long-prompt", type=int, default=1016)
    p.add_argument("--n-long", type=int, default=8)
    p.add_argument("--reps", type=int, default=2)
    args = p.parse_args()
    out = args.out or f"docs/measurements/disagg_{args.mode}.json"

    if args.mode == "cpumesh":
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=2"
            ).strip()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except RuntimeError:
            pass
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    import jax.numpy as jnp

    rows = []
    if args.mode == "chip":
        from dflash_tpu.bench.cli import _resolve_models

        class _A:
            model_name_or_path = args.model
            draft_name_or_path = "auto:1"
            dtype = "bfloat16"
            quant = args.quant

        tcfg, dcfg, t_params, d_params = _resolve_models(_A())
        kw = dict(num_lanes=args.num_lanes, max_new=args.max_new_tokens,
                  prompt_cap=1024)
        wkw = dict(num_lanes=args.num_lanes, short_prompt=args.short_prompt,
                   long_prompt=args.long_prompt, n_long=args.n_long)
        for disagg in (False, True):
            eng = build(tcfg, dcfg, t_params, d_params, disagg=disagg, **kw)
            run_workload(eng, tcfg, seed=99, **wkw)  # warm
            for rep in range(args.reps):
                r = run_workload(eng, tcfg, seed=rep, **wkw)
                row = {"mode": "disagg" if disagg else "colocated",
                       "rep": rep, **r}
                rows.append(row)
                print(json.dumps(row), flush=True)
            if disagg:
                eng._disagg.stop()
            del eng
    else:
        from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
        from dflash_tpu.models import dflash_draft, qwen3

        jax.config.update("jax_num_cpu_devices", 2)
        tcfg = tiny_target_config()
        dcfg = tiny_draft_config(tcfg, block_size=8, num_layers=1)
        t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
        d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32)
        kw = dict(num_lanes=4, max_new=32, prompt_cap=256)
        wkw = dict(num_lanes=4, short_prompt=8, long_prompt=250, n_long=4)
        for disagg in (False, True):
            eng = build(tcfg, dcfg, t_params, d_params, disagg=disagg, **kw)
            run_workload(eng, tcfg, seed=99, **wkw)  # warm
            for rep in range(args.reps):
                r = run_workload(eng, tcfg, seed=rep, **wkw)
                row = {"mode": "disagg" if disagg else "colocated",
                       "rep": rep, "devices": len(jax.devices()), **r}
                rows.append(row)
                print(json.dumps(row), flush=True)
            if disagg:
                eng._disagg.stop()
            del eng

    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=1)
    print(f"[measure] wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
