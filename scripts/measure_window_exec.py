"""Microbenchmark the serving engine's window executable against the raw
batched decode loop on identical 16-lane state.

The phase-timed serving run showed ~34 ms/cycle end-to-end where the raw
while_loop runs 22.5 ms/cycle, and a bigger window (sps 3) made it WORSE —
so the gap is not a fixed per-dispatch cost.  This times:

  (a) the raw  jit_batched_decode (one dispatch, all cycles)
  (b) back-to-back batched_cycles window dispatches (the serving unit,
      donated carry, no HTTP, no admission, no peek)
  (c) (b) + the peek + host readback each window (the harvest payload)

on the same prefilled state, so each layer of the serving stack's cost is
measured in isolation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import numpy as np  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/measurements/window_exec.json")
    p.add_argument("--lanes", type=int, default=16)
    p.add_argument("--sps", type=int, default=2)
    p.add_argument("--n-windows", type=int, default=34)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from functools import partial

    from dflash_tpu.core.config import QWEN3_4B, dflash_draft_config
    from dflash_tpu.engine.batching import _peek_impl
    from dflash_tpu.models import dflash_draft, qwen3
    from dflash_tpu.quant import quantize_draft_params, quantize_target_params
    from dflash_tpu.spec.batched import (
        batched_cycles,
        jit_batched_decode,
        jit_batched_prefill,
    )

    tcfg = QWEN3_4B
    dcfg = dflash_draft_config(tcfg, num_draft_layers=1, block_size=16)
    B = dcfg.block_size
    t_params = quantize_target_params(
        qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.bfloat16), tcfg)
    d_params = quantize_draft_params(
        dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.bfloat16), dcfg)
    jax.block_until_ready((t_params, d_params))
    print("[win] params ready", file=sys.stderr, flush=True)

    lanes, sps = args.lanes, args.sps
    prompt_len = 64
    max_new = 256
    # serving-engine geometry: prompt_cap 256
    total_len = 256 + max_new + B + 1
    max_cycles = max_new
    tau = 7.46

    rng = np.random.default_rng(7)
    ids = rng.integers(1, tcfg.vocab_size - 2, size=(lanes, 1, prompt_len))
    plens = jnp.full((lanes,), prompt_len, jnp.int32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(lanes, dtype=jnp.uint32))
    st0 = jit_batched_prefill(
        t_params, d_params, jnp.asarray(ids), plens, jnp.float32(0.0), keys,
        tcfg=tcfg, dcfg=dcfg, total_len=total_len, max_cycles=max_cycles,
    )
    jax.block_until_ready(st0)
    max_lengths = jnp.full((lanes,), prompt_len + max_new, jnp.int32)

    lo = int(np.floor(tau))
    taus = np.where(rng.random(max_cycles) < tau - lo, lo + 1, lo)
    forced_shared = jnp.asarray(np.clip(taus, 1, B).astype(np.int32) - 1)
    forced_lane = jnp.broadcast_to(forced_shared, (lanes, max_cycles))

    results = {}

    # (a) raw while_loop decode — distinct forced pattern per rep, or the
    # tunnel dedupes the identical dispatch (measured: 3 "reps" in 20 µs)
    def raw(fa):
        return jit_batched_decode(
            t_params, d_params, st0, max_lengths, jnp.float32(0.0),
            tcfg=tcfg, dcfg=dcfg, block_size=B, stop_token_ids=(),
            max_cycles=max_cycles, forced_acc=fa,
        )

    def mk_forced_lane(seed):
        r = np.random.default_rng(seed)
        t = np.where(r.random((lanes, max_cycles)) < tau - lo, lo + 1, lo)
        return jnp.asarray(np.clip(t, 1, B) - 1, jnp.int32)

    out = raw(forced_lane)
    jax.block_until_ready(out)
    ts = []
    for rep in range(args.reps):
        fa = mk_forced_lane(100 + rep)
        jax.block_until_ready(fa)
        t0 = time.perf_counter()
        out = raw(fa)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    toks = int(jnp.sum(out.start - prompt_len))
    n_cycles_raw = int(jnp.max(out.cycle_idx))
    ts.sort()
    results["raw_while_loop"] = {
        "ms_per_cycle": round(1e3 * ts[len(ts) // 2] / n_cycles_raw, 2),
        "tok_s": round(toks / ts[len(ts) // 2], 1),
        "cycles": n_cycles_raw,
    }
    print(json.dumps(results["raw_while_loop"]), flush=True)

    # the serving engine's window executable (same jit config)
    window = jax.jit(
        partial(
            batched_cycles,
            tcfg=tcfg, dcfg=dcfg, block_size=B, stop_token_ids=(),
            n_steps=sps, forced_acc=forced_shared, topk_pool=64,
        ),
        donate_argnums=(0,),
    )
    temps = jnp.zeros((lanes,), jnp.float32)

    def run_windows(with_peek: bool):
        # fresh buffers: the window executable donates its carry, and st0
        # must survive for the next rep (jnp.copy preserves dtype, incl. bool)
        st = jax.tree.map(jnp.copy, st0)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        pending = None
        for _ in range(args.n_windows):
            st = window(st, t_params, d_params, temps, max_lengths,
                        filters=None)
            if with_peek:
                peek = _peek_impl(st)
                for leaf in peek:
                    leaf.copy_to_host_async()
                if pending is not None:  # harvest previous window's peek
                    _ = [np.asarray(x) for x in pending[:3]]
                pending = peek
        jax.block_until_ready(st)
        return time.perf_counter() - t0, st

    for name, with_peek in (("window_dispatches", False),
                            ("window_plus_peek_harvest", True)):
        dt, st = run_windows(with_peek)  # warm
        ts = []
        for _ in range(args.reps):
            dt, st = run_windows(with_peek)
            ts.append(dt)
        ts.sort()
        dt = ts[len(ts) // 2]
        n_cycles = args.n_windows * sps
        results[name] = {
            "ms_per_cycle": round(1e3 * dt / n_cycles, 2),
            "ms_per_window": round(1e3 * dt / args.n_windows, 2),
            "windows": args.n_windows, "sps": sps,
        }
        print(json.dumps({name: results[name]}), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "results": results}, f, indent=1)
    print(f"[win] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
