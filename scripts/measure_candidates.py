"""Candidate-mode break-even measurement (round-4 directive 2).

Measures, on the chip, the fixed_prefix_rank p2k4c4 cycle premium vs vanilla
at the operative taus (reference results.md:480-515 protocol: candidates
emulated at the reference's measured tau=7.86, vanilla at tau=7.46), for:

  * round-3 shipped verify   (shared_prefix=False; includes the lax.top_k
    candidate builder) — reproduces the 1.10x premium of record;
  * sort-free builders only  (shared_prefix=False + topk_desc — already the
    shipped builder; isolates the top_k share via the r3 number);
  * shared-prefix flattened verify (shared_prefix=True, the new default).

Also the matched-tau pure-cycle-cost rows (both arms forced tau=7.48) that
docs/RESULTS.md's candidate table carries.

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
    p.add_argument("--out", default="docs/measurements/candidates_r4.json")
    p.add_argument("--model", default="qwen3-4b")
    p.add_argument("--quant", default="int8")
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--reps", type=int, default=3)
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
    engine = SpecEngine(
        tcfg, dcfg, t_params, d_params,
        max_new_tokens=args.max_new_tokens, block_size=B,
        prompt_cap=128, prompt_bucket=128, stop_token_ids=(),
    )
    prompts = [
        np.random.default_rng(s).integers(1, tcfg.vocab_size - 2, size=(1, 117))
        for s in range(1 + args.reps)
    ]
    TAU_VAN, TAU_CAND, TAU_MATCH = 7.46, 7.86, 7.48
    fa = lambda tau: make_forced_acc(args.max_new_tokens, B, tau)

    def run_vanilla(tau):
        forced = fa(tau)
        engine.generate(prompts[0], temperature=0.0, forced_acc=forced)  # warm
        tpots = []
        for i in range(args.reps):
            r = engine.generate(prompts[1 + i], temperature=0.0, forced_acc=forced)
            tpots.append(r.time_per_output_token)
        tpots.sort()
        return tpots[len(tpots) // 2] * 1e3, [round(t * 1e3, 4) for t in tpots]

    def run_cand(tau, cc):
        forced = fa(tau)
        candidate_generate(engine, prompts[0], cc, temperature=0.0, forced_acc=forced)
        tpots = []
        for i in range(args.reps):
            r = candidate_generate(engine, prompts[1 + i], cc,
                                   temperature=0.0, forced_acc=forced)
            tpots.append(r.time_per_output_token)
        tpots.sort()
        return tpots[len(tpots) // 2] * 1e3, [round(t * 1e3, 4) for t in tpots]

    cc_base = dict(mode="fixed_prefix_rank", rank_top_k=4, fixed_prefix_len=2)
    rows = []

    def emit(label, tpot_ms, spread, tau):
        row = {"label": label, "tau": tau, "tpot_ms": round(tpot_ms, 4),
               "spread": spread, "tok_s": round(1e3 / tpot_ms, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    van_ms, van_sp = run_vanilla(TAU_VAN)
    emit("vanilla B=16", van_ms, van_sp, TAU_VAN)

    for label, cc, tau in [
        ("cand p2k4c4 unflat", CandidateConfig(max_candidates=4, shared_prefix=False, **cc_base), TAU_CAND),
        ("cand p2k4c4 FLAT", CandidateConfig(max_candidates=4, shared_prefix=True, **cc_base), TAU_CAND),
    ]:
        ms, sp = run_cand(tau, cc)
        emit(label, ms, sp, tau)

    # matched-tau pure cycle cost (both arms tau=7.48)
    vm_ms, vm_sp = run_vanilla(TAU_MATCH)
    emit("vanilla B=16 (matched)", vm_ms, vm_sp, TAU_MATCH)
    for C in (2, 4):
        ms, sp = run_cand(
            TAU_MATCH, CandidateConfig(max_candidates=C, shared_prefix=True, **cc_base)
        )
        emit(f"cand C={C} FLAT (matched)", ms, sp, TAU_MATCH)

    # premium summary: cycle_cand/cycle_van at operative taus
    van = next(r for r in rows if r["label"] == "vanilla B=16")
    for lbl in ("cand p2k4c4 unflat", "cand p2k4c4 FLAT"):
        c = next(r for r in rows if r["label"] == lbl)
        prem = (c["tpot_ms"] * c["tau"]) / (van["tpot_ms"] * van["tau"])
        vs = van["tpot_ms"] / c["tpot_ms"]
        print(json.dumps({"summary": lbl, "cycle_premium_x": round(prem, 4),
                          "throughput_vs_vanilla_x": round(vs, 4)}), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=1)
    print(f"[measure] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
