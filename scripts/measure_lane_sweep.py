"""Lane-scaling sweep of the raw batched decode path.

Round-3 recorded saturation at 16 lanes (4627 tok/s/chip; 24 lanes 4657 —
flat).  The round-4 two-part read-only-ctx verify removed ~4.4 ms/cycle of
non-matmul overhead, which can move the knee: if per-cycle overhead shrank
while matmul time still grows sub-linearly below saturation, more lanes may
now pay.  This sweeps BENCH-identical batched decode at a list of lane
counts and reports tok/s/chip (median of reps).
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
    p.add_argument("--lanes", default="16,24,32")
    p.add_argument("--preset", default="qwen3-4b")
    p.add_argument("--max-new", type=int, default=512)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", default="docs/measurements/lane_sweep.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dflash_tpu.core.config import QWEN3_4B, QWEN3_8B, dflash_draft_config
    from dflash_tpu.models import dflash_draft, qwen3
    from dflash_tpu.quant import quantize_draft_params, quantize_target_params
    from dflash_tpu.spec.batched import jit_batched_decode, jit_batched_prefill

    tcfg = QWEN3_8B if args.preset == "qwen3-8b" else QWEN3_4B
    dcfg = dflash_draft_config(tcfg, num_draft_layers=1, block_size=16)
    B = dcfg.block_size
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.bfloat16)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.bfloat16)
    t_params = quantize_target_params(t_params, tcfg)
    d_params = quantize_draft_params(d_params, dcfg)
    jax.block_until_ready((t_params, d_params))
    print(f"[lanes] params ready ({args.preset})", file=sys.stderr, flush=True)

    prompt_len, max_new = 117, args.max_new
    total_len = 128 + max_new + B + 1
    tau = 7.46
    n_cycles = int(np.ceil(max_new / (tau - 1))) + 2

    def forced(lanes, seed):
        rng = np.random.default_rng(seed)
        lo = int(np.floor(tau))
        frac = tau - lo
        taus = np.where(rng.random((lanes, n_cycles + 8)) < frac, lo + 1, lo)
        return jnp.asarray(np.clip(taus, 1, B) - 1, jnp.int32)

    rows = []
    for lanes in [int(x) for x in args.lanes.split(",")]:
        rng = np.random.default_rng(7)
        ids = rng.integers(1, tcfg.vocab_size - 2, size=(lanes, 1, prompt_len))
        plens = jnp.full((lanes,), prompt_len, jnp.int32)
        keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(lanes, dtype=jnp.uint32))
        st = jit_batched_prefill(
            t_params, d_params, jnp.asarray(ids), plens, jnp.float32(0.0), keys,
            tcfg=tcfg, dcfg=dcfg, total_len=total_len, max_cycles=n_cycles + 8,
        )
        jax.block_until_ready(st)
        max_lengths = jnp.full((lanes,), prompt_len + max_new, jnp.int32)

        def dec(state, fa):
            return jit_batched_decode(
                t_params, d_params, state, max_lengths, jnp.float32(0.0),
                tcfg=tcfg, dcfg=dcfg, block_size=B, stop_token_ids=(),
                max_cycles=n_cycles + 8, forced_acc=fa,
            )

        out = dec(st, forced(lanes, 0))
        jax.block_until_ready(out)  # warm compile
        tpss = []
        for rep in range(args.reps):
            # one forced array per rep, device-resident before timing; a
            # second identical build inside the timed call risks the
            # tunnel's identical-dispatch dedupe (bench.py comment)
            fa = forced(lanes, 1 + rep)
            jax.block_until_ready(fa)
            t0 = time.perf_counter()
            out = dec(st, fa)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            toks = int(jnp.sum(out.start - prompt_len))
            tpss.append(toks / dt)
        tpss.sort()
        row = {"lanes": lanes, "tok_s_median": round(tpss[len(tpss) // 2], 1),
               "tok_s_min": round(tpss[0], 1), "tok_s_max": round(tpss[-1], 1),
               "tokens_per_rep": toks}
        print(json.dumps(row), flush=True)
        rows.append(row)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"preset": args.preset, "max_new": max_new, "rows": rows}, f,
                  indent=1)
    print(f"[lanes] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
