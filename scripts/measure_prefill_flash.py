"""Flash-prefill kernel A/B (round 5).

The TTFT table (docs/RESULTS.md) shows the O(P²) prefill turning
quadratic-bound past ~4k (8k: full 2592 ms / chunked 1915 ms vs a
~0.6-0.9 s compute floor) — the [nh, S, S] score transients.  Unlike the
decode-shape kernels (measured and rejected this round), prefill has
MXU-shaped tiles and thousands of query rows per dispatch: exactly where a
hand flash kernel should win.  Times one full jitted forward_prefill
(Qwen3-4B int8 weights) per impl and prompt length, plus an on-chip
numerics check.
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
    p.add_argument("--out", default="docs/measurements/prefill_flash.json")
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--quant", default="int8")
    p.add_argument("--lens", default="512,1024,2048,4096,8192")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except RuntimeError:
            pass
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    import jax.numpy as jnp
    import numpy as np

    from dflash_tpu.bench.cli import _resolve_models
    from dflash_tpu.models import qwen3

    class _A:
        model_name_or_path = args.model
        draft_name_or_path = "auto:1"
        dtype = "bfloat16"
        quant = args.quant

    tcfg, dcfg, t_params, d_params = _resolve_models(_A())
    lens = [int(x) for x in args.lens.split(",")]
    tap = dcfg.target_layer_ids

    def run_impl(impl, S, prompt):
        fn = jax.jit(
            lambda pr, emb, pos: qwen3.forward_prefill(
                pr, tcfg, emb, pos, tap_ids=tap, attn_impl=impl
            )
        )
        pos = jnp.arange(S, dtype=jnp.int32)[None, :]
        embeds = qwen3.embed(t_params, prompt)
        res = fn(t_params, embeds, pos)  # warm/compile
        jax.block_until_ready(res.hidden)
        walls = []
        for r in range(args.reps):
            pr2 = jnp.asarray(
                np.random.default_rng(r).integers(1, tcfg.vocab_size - 2, (1, S))
            )
            emb2 = qwen3.embed(t_params, pr2)
            jax.block_until_ready(emb2)
            t0 = time.perf_counter()
            out = fn(t_params, emb2, pos)
            np.asarray(out.hidden[0, -1, :8])  # force completion (readback)
            walls.append(time.perf_counter() - t0)
        walls.sort()
        return walls[len(walls) // 2], walls, res

    rows = []
    for S in lens:
        prompt = jnp.asarray(
            np.random.default_rng(99).integers(1, tcfg.vocab_size - 2, (1, S))
        )
        med_f, sp_f, res_f = run_impl("flash", S, prompt)
        row = {"S": S, "flash_ms": round(med_f * 1e3, 1),
               "flash_spread": [round(w * 1e3, 1) for w in sp_f]}
        try:
            med_x, sp_x, res_x = run_impl("xla", S, prompt)
            dh = float(jnp.max(jnp.abs(
                res_x.hidden.astype(jnp.float32)
                - res_f.hidden.astype(jnp.float32)
            )))
            row.update({
                "xla_ms": round(med_x * 1e3, 1),
                "speedup_x": round(med_x / med_f, 3),
                "max_hidden_diff": round(dh, 4),
                "xla_spread": [round(w * 1e3, 1) for w in sp_x],
            })
        except Exception as e:  # noqa: BLE001 — the XLA arm OOMs at 8k
            row["xla_error"] = f"{type(e).__name__}"
        rows.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=1)
    print(f"[measure] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
