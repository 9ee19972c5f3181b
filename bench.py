#!/usr/bin/env python
"""Headline benchmark: DFlash speculative decoding vs autoregressive decode.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Reference baseline (BASELINE.md, A100 80GB, Qwen3-4B + DFlash-b16, AIME25):
AR TPOT 0.043140 s, spec TPOT @B=16 0.007273 s => decoding speedup 5.93x at
tau=7.46.  No trained draft checkpoints are reachable in this environment
(zero egress), so tau is *emulated*: the engine runs the full draft forward,
verify forward, acceptance arithmetic, commit and KV bookkeeping every cycle,
but the accept decision is overridden with a deterministic pattern whose mean
matches the reference tau=7.46 (see SpecEngine.generate(forced_acc=...)).
All compute and memory traffic is identical to a real reference-quality
draft; only the token *values* differ.  The reported metric is the
wall-clock decoding speedup vs our own AR baseline on the same chip —
the same definition as reference benchmark.py:571.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# honor JAX_PLATFORMS even when a sitecustomize-registered PJRT plugin
# already claimed the backend (the smoke preset is documented CPU-safe)
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except RuntimeError:
        pass


def log(msg):
    print(f"[bench] +{time.perf_counter() - T0:.1f}s {msg}", file=sys.stderr, flush=True)


T0 = time.perf_counter()

REF_TAU = 7.46
REF_SPEEDUP = 5.93  # reference results.md:363 (A100, Qwen3-4B, B=16)


def make_forced_acc(n_cycles: int, block_size: int, tau_target: float, seed: int = 0) -> np.ndarray:
    """Deterministic acc (=tau-1) pattern with mean tau ~= tau_target."""
    rng = np.random.default_rng(seed)
    lo = int(np.floor(tau_target))
    frac = tau_target - lo
    taus = np.where(rng.random(n_cycles) < frac, lo + 1, lo)
    return (np.clip(taus, 1, block_size) - 1).astype(np.int32)


def main():
    preset = os.environ.get("BENCH_PRESET", "qwen3-4b")
    from dflash_tpu.core.config import (
        LLAMA31_8B, QWEN3_4B, QWEN3_8B, dflash_draft_config, tiny_target_config,
        tiny_draft_config,
    )
    from dflash_tpu.models import dflash_draft, qwen3
    from dflash_tpu.spec import SpecEngine

    if preset == "smoke":
        tcfg = tiny_target_config(num_key_value_heads=2)
        dcfg = tiny_draft_config(tcfg, block_size=16, num_layers=1)
        max_new, prompt_cap = 128, 128
    elif preset == "llama31-8b":
        # Llama-3.1-8B target family (no qk-norm, llama3 rope scaling);
        # int8-only like the 8B Qwen (bf16 would not fit 16GB HBM).
        tcfg = LLAMA31_8B
        dcfg = dflash_draft_config(LLAMA31_8B, num_draft_layers=1, block_size=16)
        max_new, prompt_cap = 512, 128
    elif preset == "qwen3-8b":
        # North-star config: Qwen3-8B on one v5e chip (int8-only; the bf16
        # form would not fit 16GB HBM).
        tcfg = QWEN3_8B
        dcfg = dflash_draft_config(QWEN3_8B, num_draft_layers=1, block_size=16)
        max_new, prompt_cap = 512, 128
    elif preset.startswith("qwen3-30b-a3b"):
        # MoE target (reference README.md:60-68).  Even int8, 48 layers of
        # experts are ~29GB (>16GB HBM), so single-chip presets are
        # layer-scaled ("qwen3-30b-a3b-l12"): identical per-layer geometry,
        # per-cycle cost linear in L (docs/RESULTS.md MoE section).
        import dataclasses
        import re

        from dflash_tpu.core.config import QWEN3_CODER_30B_A3B

        m = re.fullmatch(r"qwen3-30b-a3b-l(\d+)", preset)
        tcfg = QWEN3_CODER_30B_A3B if m is None else dataclasses.replace(
            QWEN3_CODER_30B_A3B, num_hidden_layers=int(m.group(1))
        )
        dcfg = dflash_draft_config(tcfg, num_draft_layers=1, block_size=16)
        max_new, prompt_cap = 256, 128
    else:
        tcfg = QWEN3_4B
        dcfg = dflash_draft_config(QWEN3_4B, num_draft_layers=1, block_size=16)
        max_new, prompt_cap = 512, 128

    block_size = dcfg.block_size
    log(f"preset={preset} target L={tcfg.num_hidden_layers} H={tcfg.hidden_size} "
        f"draft L={dcfg.model.num_hidden_layers} B={block_size} devices={jax.devices()}")

    quant = os.environ.get("BENCH_QUANT", "int8" if preset != "smoke" else "")
    if preset in ("qwen3-8b", "llama31-8b") or preset.startswith("qwen3-30b-a3b"):
        # Generate directly in int8 — the bf16 intermediate would OOM.
        from dflash_tpu.quant import quantize_draft_params
        from dflash_tpu.quant.quantize import init_params_quantized

        quant = "int8"
        t_params = init_params_quantized(jax.random.PRNGKey(0), tcfg)
        d_params = quantize_draft_params(
            dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.bfloat16), dcfg
        )
        jax.block_until_ready((t_params, d_params))
        log("params initialized directly as int8")
    else:
        t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.bfloat16)
        d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.bfloat16)
        jax.block_until_ready((t_params, d_params))
        log("params initialized")
        if quant == "int8":
            from dflash_tpu.quant import quantize_draft_params, quantize_target_params

            t_params = quantize_target_params(t_params, tcfg)
            d_params = quantize_draft_params(d_params, dcfg)
            jax.block_until_ready((t_params, d_params))
            log("params quantized to int8 (weight-only)")

    engine = SpecEngine(
        tcfg, dcfg, t_params, d_params,
        max_new_tokens=max_new, block_size=block_size,
        prompt_cap=prompt_cap, prompt_bucket=prompt_cap, stop_token_ids=(),
    )
    # Distinct prompt per steady-state rep (same shape, one executable): the
    # tunneled runtime dedupes a repeated dispatch with identical inputs, and
    # distinct data also keeps each rep an honest independent sample.
    prompts = [
        np.random.default_rng(s).integers(1, tcfg.vocab_size - 2, size=(1, 117))
        for s in range(8)
    ]
    prompt = prompts[0]
    n_cycles = int(np.ceil(max_new / (REF_TAU - 1)))
    forced = make_forced_acc(max_new, block_size, REF_TAU)

    # Steady-state numbers are the MEDIAN of several single-run reps: one
    # tunnel-jitter window (observed ±10% on sub-second runs, BENCH_r01 vs
    # r02: spec tpot 1.063 vs 1.172 ms on identical code) must not move the
    # number of record.  Reps are cheap next to the compile warm-up.
    reps = int(os.environ.get("BENCH_REPS", "3" if preset != "smoke" else "1"))

    # --- AR baseline (reference block_size=1 path) -------------------------
    ar_warm = engine.ar_generate(prompt, temperature=0.0)
    log(f"AR warm done (compile+run, tpot={ar_warm.time_per_output_token*1e3:.2f} ms)")
    ar_runs = [engine.ar_generate(prompts[1 + i], temperature=0.0) for i in range(reps)]
    ar_tpots = sorted(r.time_per_output_token for r in ar_runs)
    ar_tpot = ar_tpots[len(ar_tpots) // 2]
    ar = ar_runs[0]
    log(f"AR steady: {ar.num_output_tokens} tok/rep x {reps}, "
        f"tpot median={ar_tpot*1e3:.3f} ms "
        f"(min {ar_tpots[0]*1e3:.3f} / max {ar_tpots[-1]*1e3:.3f}), "
        f"{1.0/ar_tpot:.1f} tok/s")

    # --- speculative with emulated reference-tau acceptance ----------------
    spec_warm = engine.generate(prompt, temperature=0.0, forced_acc=forced)
    log(f"spec warm done (compile+run, tpot={spec_warm.time_per_output_token*1e3:.2f} ms)")
    spec_runs = [
        engine.generate(prompts[1 + i], temperature=0.0, forced_acc=forced)
        for i in range(reps)
    ]
    spec_tpots = sorted(r.time_per_output_token for r in spec_runs)
    spec_tpot = spec_tpots[len(spec_tpots) // 2]
    spec = spec_runs[0]
    tau = float(np.mean(spec.acceptance_lengths)) if spec.acceptance_lengths else 0.0
    log(f"spec steady: {spec.num_output_tokens} tok/rep x {reps} in "
        f"{len(spec.acceptance_lengths)} cycles, tau={tau:.2f}, "
        f"tpot median={spec_tpot*1e3:.3f} ms "
        f"(min {spec_tpots[0]*1e3:.3f} / max {spec_tpots[-1]*1e3:.3f}), "
        f"{1.0/spec_tpot:.1f} tok/s")

    # --- batched serving throughput (optional, BENCH_LANES=R) --------------
    batched_detail = {}
    # 24 lanes is the measured single-chip peak for the 4B geometry since the
    # round-4 two-part verify cut per-cycle overhead and moved the knee past
    # 16 (scripts/measure_lane_sweep.py: 16 -> 5305, 24 -> 5551, 32 -> 5209
    # tok/s/chip; round-3 structure saturated at 16) — report the chip at
    # peak.  The bigger presets keep 16: their weight sets leave less HBM
    # for 24 lanes of KV/features, and their knees were not re-measured.
    default_lanes = "24" if preset == "qwen3-4b" else "16"
    lanes = int(os.environ.get("BENCH_LANES", default_lanes if preset != "smoke" else "0"))
    if lanes > 1:
        from dflash_tpu.spec.batched import jit_batched_decode, jit_batched_prefill

        rng = np.random.default_rng(1)
        P = prompt_cap
        input_ids = jnp.asarray(
            rng.integers(1, tcfg.vocab_size - 2, size=(lanes, 1, P)), jnp.int32
        )
        prompt_lens = jnp.asarray([117] * lanes, jnp.int32)
        keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(lanes, dtype=jnp.uint32))
        kwargs = dict(tcfg=tcfg, dcfg=dcfg, total_len=engine.total_len,
                      max_cycles=max_new,
                      kv_quant=os.environ.get("BENCH_KV_QUANT", "") == "1")
        st = jit_batched_prefill(
            t_params, d_params, input_ids, prompt_lens, jnp.float32(0), keys, **kwargs
        )
        fa = jnp.asarray(np.broadcast_to(forced, (lanes, max_new)))
        dec = lambda st: jit_batched_decode(
            t_params, d_params, st, prompt_lens + max_new, jnp.float32(0),
            tcfg=tcfg, dcfg=dcfg, block_size=block_size, stop_token_ids=(),
            max_cycles=max_new, forced_acc=fa,
        )
        warm = dec(st)
        np.asarray(warm.start)  # force execution
        log(f"batched warm done (lanes={lanes})")
        batched_tpss = []
        for _ in range(reps):
            t2 = time.perf_counter()
            out = dec(st)
            total_tokens = int(np.asarray(out.start - prompt_lens).sum())
            batched_tpss.append(total_tokens / (time.perf_counter() - t2))
        batched_tpss.sort()
        batched_tps = batched_tpss[len(batched_tpss) // 2]
        log(f"batched steady: {lanes} lanes, {total_tokens} tok/rep x {reps} "
            f"-> median {batched_tps:.1f} tok/s/chip "
            f"(min {batched_tpss[0]:.1f} / max {batched_tpss[-1]:.1f})")
        batched_detail = {
            "batched_lanes": lanes,
            "batched_tokens_per_sec_per_chip": round(batched_tps, 2),
            "batched_speedup_vs_single": round(batched_tps * spec_tpot, 3),
        }

    speedup = ar_tpot / spec_tpot
    result = {
        "metric": f"decoding_speedup_vs_ar ({preset}-shape, B={block_size}, tau={tau:.2f} emulated)",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / REF_SPEEDUP, 3),
        "detail": {
            "ar_tpot_ms": round(ar_tpot * 1e3, 4),
            "spec_tpot_ms": round(spec_tpot * 1e3, 4),
            "ar_tokens_per_sec": round(1.0 / ar_tpot, 2),
            "spec_tokens_per_sec": round(1.0 / spec_tpot, 2),
            "reps": reps,
            "ar_tpot_ms_spread": [round(t * 1e3, 4) for t in ar_tpots],
            "spec_tpot_ms_spread": [round(t * 1e3, 4) for t in spec_tpots],
            "tau": round(tau, 3),
            "ref_ar_tpot_ms": 43.140,
            "ref_spec_tpot_ms": 7.273,
            "device": str(jax.devices()[0]),
            **batched_detail,
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
