"""Fused verify kernel at long context (round 5).

At bench-scale caches (T≈657) the fused two-part flash kernel loses to
XLA's fusion pipeline by a flat ~6.5% (docs/measurements/candidates_r5.json)
— but its frontier-bounded ctx streaming reads O(start+B) rows where the
XLA path reads all T every layer every cycle, so the crossover, if any, is
at long context.  The round-3 bounded-read designs lost even at prompt 7937
(XLA 2.25 vs Pallas 3.02 ms/tok) — measured on the OLD kernel that upcast
to fp32 and transposed chunks in VMEM; this kernel fixed both.  A/B at the
same long-context point, bf16 and int8 KV.
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
    p.add_argument("--out", default="docs/measurements/fused_longctx.json")
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--quant", default="int8")
    p.add_argument("--prompt-len", type=int, default=7937)
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--kv-quant", action="store_true", default=True)
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except RuntimeError:
            pass
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    import numpy as np

    from dflash_tpu.bench.cli import _resolve_models, make_forced_acc
    from dflash_tpu.spec import SpecEngine

    class _A:
        model_name_or_path = args.model
        draft_name_or_path = "auto:1"
        dtype = "bfloat16"
        quant = args.quant

    tcfg, dcfg, t_params, d_params = _resolve_models(_A())
    B = dcfg.block_size
    P = args.prompt_len
    cap = ((P + 127) // 128) * 128
    forced = make_forced_acc(args.max_new_tokens, B, 7.46)
    prompts = [
        np.random.default_rng(s).integers(1, tcfg.vocab_size - 2, size=(1, P))
        for s in range(1 + args.reps)
    ]

    rows = []
    for impl in ("xla", "fused"):
        engine = SpecEngine(
            tcfg, dcfg, t_params, d_params,
            max_new_tokens=args.max_new_tokens, block_size=B,
            prompt_cap=cap, prompt_bucket=128, stop_token_ids=(),
            attn_impl=impl, kv_quant=args.kv_quant, prefill_chunk="auto",
        )
        engine.generate(prompts[0], temperature=0.0, forced_acc=forced)  # warm
        tpots = sorted(
            engine.generate(prompts[1 + i], temperature=0.0, forced_acc=forced)
            .time_per_output_token
            for i in range(args.reps)
        )
        row = {
            "impl": impl, "total_len": engine.total_len,
            "tpot_ms": round(tpots[len(tpots) // 2] * 1e3, 4),
            "spread": [round(t * 1e3, 4) for t in tpots],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        del engine

    print(json.dumps({
        "summary": "fused vs xla at long ctx",
        "speedup_x": round(rows[0]["tpot_ms"] / rows[1]["tpot_ms"], 4),
    }), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=1)
    print(f"[measure] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
