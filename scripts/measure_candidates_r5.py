"""Round-5 candidate break-even measurement: fused verify kernel A/B.

Round 4 measured the flattened candidate verify's row cost LINEAR at
3.2 µs/(row·tok) and attributed it to attention-score transients
(docs/measurements/candidates_r4.json); the fused two-part flash kernel
(kernels/verify_fused.py) is the identified lever.  This run A/Bs the kernel
against the XLA two-part path on the exact round-4 protocol
(reference results.md:480-515: candidates emulated at the reference's
τ=7.86, vanilla at τ=7.46; plus matched-τ pure-cycle-cost rows at 7.48):

  * vanilla B=16, xla vs fused        — does the kernel pay at R=16 too?
  * cand p2k4c4 FLAT, xla vs fused    — the headline break-even target:
    fused premium ≤ the reference's 1.054× τ-uplift makes C=4 a net win.

Protocol: one process, warmup per executable, median of --reps distinct
same-shape prompts (docs/RESULTS.md measurement caveat).
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
    p.add_argument("--out", default="docs/measurements/candidates_r5.json")
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--quant", default="int8")
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--impls", default="xla,fused",
                   help="comma list of verify attention impls to A/B")
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
    from dflash_tpu.spec.candidates import CandidateConfig, candidate_generate

    class _A:
        model_name_or_path = args.model
        draft_name_or_path = "auto:1"
        dtype = "bfloat16"
        quant = args.quant

    tcfg, dcfg, t_params, d_params = _resolve_models(_A())
    B = dcfg.block_size
    impls = tuple(args.impls.split(","))
    engines = {
        impl: SpecEngine(
            tcfg, dcfg, t_params, d_params,
            max_new_tokens=args.max_new_tokens, block_size=B,
            prompt_cap=128, prompt_bucket=128, stop_token_ids=(),
            attn_impl=impl,
        )
        for impl in impls
    }
    prompts = [
        np.random.default_rng(s).integers(1, tcfg.vocab_size - 2, size=(1, 117))
        for s in range(1 + args.reps)
    ]
    TAU_VAN, TAU_CAND, TAU_MATCH = 7.46, 7.86, 7.48
    fa = lambda tau: make_forced_acc(args.max_new_tokens, B, tau)

    def med(run):
        run(prompts[0])  # warm (compile lands here, never in a timed rep)
        tpots = sorted(run(prompts[1 + i]).time_per_output_token
                       for i in range(args.reps))
        return tpots[len(tpots) // 2] * 1e3, [round(t * 1e3, 4) for t in tpots]

    rows = []

    def emit(label, tpot_ms, spread, tau):
        row = {"label": label, "tau": tau, "tpot_ms": round(tpot_ms, 4),
               "spread": spread, "tok_s": round(1e3 / tpot_ms, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    cc_base = dict(mode="fixed_prefix_rank", rank_top_k=4, fixed_prefix_len=2,
                   shared_prefix=True)

    for impl in impls:
        eng = engines[impl]
        forced = fa(TAU_VAN)
        ms, sp = med(lambda pr, e=eng, f=forced: e.generate(
            pr, temperature=0.0, forced_acc=f))
        emit(f"vanilla B=16 [{impl}]", ms, sp, TAU_VAN)

        cc = CandidateConfig(max_candidates=4, attn_impl=impl, **cc_base)
        forced_c = fa(TAU_CAND)
        ms, sp = med(lambda pr, e=eng, c=cc, f=forced_c: candidate_generate(
            e, pr, c, temperature=0.0, forced_acc=f))
        emit(f"cand p2k4c4 FLAT [{impl}]", ms, sp, TAU_CAND)

    # matched-tau pure cycle cost (both arms tau=7.48)
    for impl in impls:
        eng = engines[impl]
        forced = fa(TAU_MATCH)
        ms, sp = med(lambda pr, e=eng, f=forced: e.generate(
            pr, temperature=0.0, forced_acc=f))
        emit(f"vanilla B=16 (matched) [{impl}]", ms, sp, TAU_MATCH)
        for C in (2, 4):
            cc = CandidateConfig(max_candidates=C, attn_impl=impl, **cc_base)
            ms, sp = med(lambda pr, e=eng, c=cc, f=forced: candidate_generate(
                e, pr, c, temperature=0.0, forced_acc=f))
            emit(f"cand C={C} FLAT (matched) [{impl}]", ms, sp, TAU_MATCH)

    # premium summary at the operative taus, per impl, vs the BEST vanilla
    # (the round-4 bar: premium <= the reference's 1.054x tau-uplift)
    best_van = min(
        (r for r in rows if r["label"].startswith("vanilla B=16 [")),
        key=lambda r: r["tpot_ms"],
    )
    for impl in impls:
        c = next(r for r in rows if r["label"] == f"cand p2k4c4 FLAT [{impl}]")
        prem = (c["tpot_ms"] * c["tau"]) / (best_van["tpot_ms"] * best_van["tau"])
        vs = best_van["tpot_ms"] / c["tpot_ms"]
        print(json.dumps({
            "summary": f"p2k4c4 [{impl}] vs best vanilla ({best_van['label']})",
            "cycle_premium_x": round(prem, 4),
            "throughput_vs_vanilla_x": round(vs, 4),
            "break_even_needs": 1.054,
        }), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=1)
    print(f"[measure] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
