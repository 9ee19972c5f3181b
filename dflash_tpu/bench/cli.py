"""Benchmark CLI — the reference benchmark.py / benchmark_dynamic_schedule.py /
benchmark_candidate_solutions.py harnesses unified behind one entry point.

Prints the reference's canonical metric lines (benchmark.py:553-604) so sweep
scripts can grep them, plus per-sample JSONL and per-cycle trace JSONL with
the reference schemas.  Prompts are rank-strided across processes
(reference benchmark.py:445) via parallel.dist.

Model resolution: a local HF checkpoint directory (config.json +
*.safetensors) or a named preset with random weights for offline perf runs
(``tiny``, ``qwen3-4b``, ``qwen3-8b``, ``qwen3-30b-a3b``, ``llama31-8b``).

Run ``python -m dflash_tpu.bench.cli --help``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DFlash-TPU benchmark")
    p.add_argument("--model-name-or-path", type=str, default="tiny")
    p.add_argument("--draft-name-or-path", type=str, default="auto:1")
    p.add_argument("--block-size", type=int, default=None)
    p.add_argument("--dataset", type=str, default="math500")
    p.add_argument("--synthetic-data", action="store_true",
                   help="Force the offline synthetic dataset rows.")
    p.add_argument("--max-samples", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--prompt-cap", type=int, default=1024)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--skip-baseline", action="store_true")
    p.add_argument("--draft-steps", type=int, default=1)
    p.add_argument("--dtype", type=str, default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--quant", type=str, default="", choices=["", "int8"],
                   help="INT8 weight-only quantization of target + draft")
    p.add_argument("--num-lanes", type=int, default=1,
                   help=">1: decode prompts through the continuous-batching "
                        "engine (N concurrent lanes).  The reference's "
                        "benchmark_batched.py groups prompts but still decodes "
                        "them sequentially (benchmark_batched.py:214); this "
                        "actually batches the forward pass.  First turn of "
                        "each sample only; implies --skip-baseline.")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mode", type=str, default="vanilla",
                   choices=["vanilla", "candidates", "dynamic"])
    p.add_argument("--collect-profile", action="store_true")
    p.add_argument("--save-outputs-path", type=str, default=None)
    p.add_argument("--save-cycle-trace-path", type=str, default=None)
    p.add_argument("--forced-tau", type=float, default=None,
                   help="Emulate a given mean acceptance length (benchmark-only; "
                        "for random-weight perf runs without trained drafts). "
                        "Reaches every mode: vanilla/profiled/batched use it "
                        "directly; candidates force the winner's accept; "
                        "dynamic scales it per block size along the reference "
                        "block-sweep tau curve (value = tau at B=16).")
    p.add_argument("--warmup", action="store_true",
                   help="run one unmeasured generation per executable before "
                        "the measured loop (TPU compiles are minutes through "
                        "a tunneled runtime; the reference's eager PyTorch "
                        "has no equivalent cost, so single-sample runs would "
                        "otherwise charge compilation to TPOT)")
    p.add_argument("--debug-nans", action="store_true",
                   help="jax_debug_nans: fail loudly on the first NaN (the "
                        "TPU-side sanitizer; the reference's determinism flags "
                        "benchmark.py:377-378 have no NaN story).")
    # candidate mode flags (reference benchmark_candidate_solutions.py:744-824)
    p.add_argument("--candidate-mode", type=str, default="fixed_prefix_rank",
                   choices=["fixed_prefix_rank", "uncertainty_sparse_rank", "branch_beam"])
    p.add_argument("--max-candidates", type=int, default=4)
    p.add_argument("--branch-top-k", type=int, default=4)
    p.add_argument("--fixed-prefix-len", type=int, default=2)
    p.add_argument("--sparse-max-positions", type=int, default=4)
    p.add_argument("--branch-depth", type=int, default=2)
    p.add_argument("--margin-threshold", type=float, default=-1.0)
    p.add_argument("--adaptive-candidates", action="store_true")
    # dynamic scheduler flags (reference benchmark_dynamic_schedule.py)
    p.add_argument("--dynamic-block-sizes", type=str, default="8,12,16")
    p.add_argument("--scheduler-mode", type=str, default="ewma",
                   choices=["ewma", "adl_ewma", "fixed"],
                   help="'fixed' drives the SAME per-cycle-synced policy "
                        "harness at a constant --block-size — the fair "
                        "comparator for the dynamic scheduler (isolates "
                        "scheduler value from the host-sync cost that both "
                        "pay, reference results.md:85-116 methodology)")
    p.add_argument("--warmup-cycles", type=int, default=6)
    p.add_argument("--ewma-alpha", type=float, default=0.35)
    p.add_argument("--switch-margin", type=float, default=0.08)
    p.add_argument("--probe-interval", type=int, default=24)
    p.add_argument("--policy-window", type=int, default=8,
                   help="steady-state cycles per jitted policy dispatch: the "
                        "host sync that made dynamic 0.66x of fixed amortizes "
                        "over the window (warmup/probe cycles still dispatch "
                        "singly); 1 = reference-faithful per-cycle sync")
    return p


PRESETS = {}


def _resolve_models(args):
    import jax
    import jax.numpy as jnp

    from dflash_tpu.core.config import (
        LLAMA31_8B, QWEN3_4B, QWEN3_8B, QWEN3_CODER_30B_A3B,
        dflash_draft_config, draft_config_from_hf, model_config_from_hf,
        tiny_draft_config, tiny_target_config,
    )
    from dflash_tpu.models import dflash_draft, qwen3
    from dflash_tpu.models.loader import load_draft_params, load_target_params

    import dataclasses as _dc

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    presets = {
        "tiny": tiny_target_config(num_key_value_heads=2),
        "qwen3-4b": QWEN3_4B,
        "qwen3-8b": QWEN3_8B,
        "qwen3-30b-a3b": QWEN3_CODER_30B_A3B,
        "llama31-8b": LLAMA31_8B,
    }
    # Layer-scaled 30B-A3B ("qwen3-30b-a3b-lN"): the full 48-layer expert
    # stack is ~29GB even int8 (>16GB v5e HBM); N layers keep the exact
    # per-layer geometry — per-cycle costs scale linearly in L, so the
    # full-model number is (48/N)x the measured per-layer cost.
    import re as _re

    m30 = _re.fullmatch(r"qwen3-30b-a3b-l(\d+)", args.model_name_or_path)
    if m30:
        presets[args.model_name_or_path] = _dc.replace(
            QWEN3_CODER_30B_A3B, num_hidden_layers=int(m30.group(1))
        )
    # Presets whose bf16 random init would not fit a 16GB chip: generate
    # weights DIRECTLY in int8 when --quant int8 is given.
    direct_int8 = ("qwen3-8b", "llama31-8b", "qwen3-30b-a3b") + ((args.model_name_or_path,) if m30 else ())

    quant = getattr(args, "quant", "") == "int8"
    mp = Path(args.model_name_or_path)
    if mp.joinpath("config.json").exists():
        tcfg = model_config_from_hf(mp)
        t_params = load_target_params(mp, tcfg, dtype)
    elif args.model_name_or_path in presets:
        tcfg = presets[args.model_name_or_path]
        if quant and args.model_name_or_path in direct_int8:
            from dflash_tpu.quant.quantize import init_params_quantized

            t_params = init_params_quantized(jax.random.PRNGKey(0), tcfg)
        else:
            t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, dtype)
    else:
        raise SystemExit(f"unknown model {args.model_name_or_path!r}; "
                         f"presets: {sorted(presets)} or a checkpoint dir")

    dp_ = Path(args.draft_name_or_path)
    if dp_.joinpath("config.json").exists():
        dcfg = draft_config_from_hf(dp_)
        d_params = load_draft_params(dp_, dcfg, dtype)
    elif args.draft_name_or_path.startswith("auto:"):
        n_layers = int(args.draft_name_or_path.split(":", 1)[1])
        if args.model_name_or_path == "tiny":
            dcfg = tiny_draft_config(tcfg, block_size=16, num_layers=n_layers)
        else:
            dcfg = dflash_draft_config(tcfg, num_draft_layers=n_layers, block_size=16)
        d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, dtype)
    else:
        raise SystemExit(f"unknown draft {args.draft_name_or_path!r}; "
                         "use a checkpoint dir or auto:<num_layers>")
    if quant:
        from dflash_tpu.ops.linear import QTensor
        from dflash_tpu.quant import quantize_draft_params, quantize_target_params

        already_int8 = any(
            isinstance(x, QTensor) for x in jax.tree.leaves(
                t_params, is_leaf=lambda x: isinstance(x, QTensor))
        )
        if not already_int8:
            t_params = quantize_target_params(t_params, tcfg)
        d_params = quantize_draft_params(d_params, dcfg)
    return tcfg, dcfg, t_params, d_params


def make_forced_acc(n: int, block_size: int, tau_target: float, seed: int = 0):
    rng = np.random.default_rng(seed)
    lo = int(np.floor(tau_target))
    frac = tau_target - lo
    taus = np.where(rng.random(n) < frac, lo + 1, lo)
    return (np.clip(taus, 1, block_size) - 1).astype(np.int32)


# Reference block-sweep tau curve (reference results.md:9-16, AIME25): the
# emulated tau for the dynamic-scheduler study must depend on block size or
# the scheduler degenerates to "smallest block always wins".
_REF_TAU_CURVE = {4: 3.46, 8: 5.46, 12: 6.80, 16: 7.67, 20: 6.40, 24: 5.04}


def tau_for_block(block_size: int, tau16: float) -> float:
    """Mean tau to emulate at ``block_size``: the reference block-sweep curve
    linearly interpolated and rescaled so curve(16) == ``tau16``."""
    xs = sorted(_REF_TAU_CURVE)
    base = float(np.interp(block_size, xs, [_REF_TAU_CURVE[x] for x in xs]))
    return float(np.clip(base * (tau16 / _REF_TAU_CURVE[16]), 1.0, block_size))


def make_forced_acc_by_bs(n: int, candidates, tau16: float, seed: int = 0) -> dict:
    """Per-block-size acceptance overrides for the dynamic-scheduler path."""
    return {
        int(bs): make_forced_acc(n, int(bs), tau_for_block(int(bs), tau16), seed)
        for bs in candidates
    }


def setup_jax_runtime(args) -> None:
    """Shared CLI preamble: honor JAX_PLATFORMS even when a sitecustomize-
    registered PJRT plugin already overrode jax.config programmatically,
    enable the persistent compile cache, arm --debug-nans."""
    import os

    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass
    from dflash_tpu.core.jaxcache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)


def _run_batched(args, tcfg, dcfg, t_params, d_params, tokenizer, rows,
                 block_size, log) -> None:
    """Batched-harness mode: all prompts through the continuous-batching
    engine's vmapped lanes (reference benchmark_batched.py parity — except
    the forward pass here is actually batched)."""
    import jax
    import time as _time

    from dflash_tpu.engine.batching import ContinuousBatchingEngine, EngineConfig

    eng = ContinuousBatchingEngine(
        tcfg, dcfg, t_params, d_params,
        EngineConfig(
            num_lanes=args.num_lanes,
            max_new_tokens=args.max_new_tokens,
            block_size=block_size,
            prompt_cap=args.prompt_cap,
            temperature=args.temperature,
            seed=args.seed,
            stop_token_ids=(tokenizer.eos_token_id,)
            if tokenizer.eos_token_id is not None else (),
            emulate_tau=args.forced_tau,
        ),
    )
    prompts = []
    for idx, instance in enumerate(rows):
        if len(instance["turns"]) > 1:
            log(f"row {idx}: batched mode uses the first turn only")
        text = tokenizer.apply_chat_template(
            [{"role": "user", "content": instance["turns"][0]}],
            tokenize=False, add_generation_prompt=True,
        )
        prompts.append((idx, np.asarray(tokenizer.encode(text))[: args.prompt_cap]))
    if args.warmup and prompts:
        # Compile the engine executables (prefill buckets, cycle window,
        # admit, peek) outside the measured wall: fill every lane once and
        # decode a full-length request per lane.
        for _, ids in (prompts * args.num_lanes)[: args.num_lanes]:
            eng.submit(ids)
        eng.run_until_drained()
        eng.completed.clear()
        log("warmup drain done (compiles excluded from metrics)")
    reqs = []
    for idx, ids in prompts:
        reqs.append((idx, eng.submit(ids)))
    t0 = _time.perf_counter()
    eng.run_until_drained()
    wall = _time.perf_counter() - t0
    log(f"drained {len(reqs)} requests in {wall:.2f}s")

    records = []
    total_tokens = 0
    acc_lists = []
    for lane_idx, (idx, req) in enumerate(reqs):
        m = req.meta_info or {}
        total_tokens += m.get("completion_tokens", 0)
        acc_lists.append([m.get("spec_accept_length", 0.0)] if m else [])
        records.append({
            "dataset_row_idx": idx,
            "local_batch_idx": lane_idx % args.num_lanes,
            "prompt_batch_size": args.num_lanes,
            "block_size": int(block_size),
            "error": req.error,
            **m,
        })

    from dflash_tpu.bench.metrics import mean_tau

    print(f"Batched lanes: {args.num_lanes}")
    print(f"Speculative total_wall_s: {wall:.6f}")
    print(f"Speculative tokens_per_sec: {total_tokens / max(wall, 1e-9):.6f}")
    print(f"Average Acceptance length: {mean_tau(acc_lists):.2f}")
    print("Decoding speedup: N/A (baseline skipped)")
    print(f"Hardware Device: {jax.devices()[0].device_kind}")
    if args.save_outputs_path:
        out_path = Path(args.save_outputs_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        with out_path.open("w", encoding="utf-8") as f:
            for row in records:
                f.write(json.dumps(row, ensure_ascii=False) + "\n")
        print(f"Saved per-sample outputs to: {out_path}")


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    t_setup = time.perf_counter()
    setup_jax_runtime(args)

    from dflash_tpu.bench.metrics import mean_tau, summarize_mode, summarize_profile, tau_histogram
    from dflash_tpu.bench.tokenizer import resolve_tokenizer
    from dflash_tpu.data import load_and_process_dataset
    from dflash_tpu.parallel import dist
    from dflash_tpu.spec.engine import SpecEngine

    dist.init()

    def log(msg):
        if dist.is_main():
            print(f"[setup][rank{dist.rank()}] +{time.perf_counter() - t_setup:.2f}s {msg}",
                  file=sys.stderr, flush=True)

    import jax
    log(f"devices={jax.devices()} world={dist.size()}")

    tcfg, dcfg, t_params, d_params = _resolve_models(args)
    block_size = args.block_size if args.block_size is not None else dcfg.block_size
    if args.mode == "dynamic":
        candidates = sorted({int(x) for x in args.dynamic_block_sizes.split(",")})
        block_size = max(max(candidates), block_size)
    log(f"models ready; block_size={block_size}")

    tokenizer = resolve_tokenizer(
        args.model_name_or_path if Path(args.model_name_or_path).exists() else None,
        tcfg.vocab_size,
    )
    rows = load_and_process_dataset(args.dataset, synthetic=args.synthetic_data)
    if args.max_samples is not None:
        rows = rows[: args.max_samples]
    log(f"dataset {args.dataset}: {len(rows)} rows")

    if args.num_lanes > 1:
        if args.mode != "vanilla":
            raise SystemExit("--num-lanes > 1 supports --mode vanilla only")
        _run_batched(args, tcfg, dcfg, t_params, d_params, tokenizer, rows, block_size, log)
        return

    engine = SpecEngine(
        tcfg, dcfg, t_params, d_params,
        max_new_tokens=args.max_new_tokens, block_size=block_size,
        prompt_cap=args.prompt_cap, prompt_bucket=128,
        stop_token_ids=(tokenizer.eos_token_id,) if tokenizer.eos_token_id is not None else (),
    )

    forced = None
    if args.forced_tau is not None:
        forced = make_forced_acc(args.max_new_tokens, block_size, args.forced_tau, args.seed)

    responses = []
    output_records = []
    cycle_trace_records = []
    indices = list(range(dist.rank(), len(rows), dist.size()))
    if args.warmup and indices:
        w_text = tokenizer.apply_chat_template(
            [{"role": "user", "content": rows[indices[0]]["turns"][0]}],
            tokenize=False, add_generation_prompt=True,
        )
        w_ids = np.asarray(tokenizer.encode(w_text))[None, : args.prompt_cap]
        if not args.skip_baseline:
            engine.ar_generate(w_ids, temperature=args.temperature, seed=args.seed)
        if args.mode == "candidates":
            from dflash_tpu.spec.candidates import CandidateConfig, candidate_generate

            wcc = CandidateConfig(
                mode=args.candidate_mode, max_candidates=args.max_candidates,
                rank_top_k=args.branch_top_k, fixed_prefix_len=args.fixed_prefix_len,
                sparse_max_positions=args.sparse_max_positions,
                branch_depth=args.branch_depth, margin_threshold=args.margin_threshold,
                adaptive=args.adaptive_candidates,
            )
            candidate_generate(engine, w_ids, wcc, temperature=args.temperature,
                               forced_acc=forced)
        elif args.mode == "dynamic":
            # Compile every candidate block size's cycle executable: one
            # warmup generation whose scheduler round-robins all candidates.
            # The forced-acc override must match the measured runs too — its
            # presence changes the traced cycle jaxpr, so a warmup without it
            # compiles the WRONG executables and the measured loop recompiles.
            from dflash_tpu.sched import EWMAScheduler, SchedulerConfig
            from dflash_tpu.spec.policy import policy_generate

            w_forced_by_bs = None
            if args.forced_tau is not None:
                all_bs = sorted(set(candidates) | {block_size})
                w_forced_by_bs = make_forced_acc_by_bs(
                    args.max_new_tokens, all_bs, args.forced_tau, args.seed
                )
            if args.scheduler_mode == "fixed":
                policy_generate(engine, w_ids, fixed_block_size=block_size,
                                temperature=args.temperature,
                                forced_acc_by_bs=w_forced_by_bs,
                                window=args.policy_window)
            else:
                wsched = EWMAScheduler(SchedulerConfig(
                    candidates=tuple(candidates), mode=args.scheduler_mode,
                    warmup_cycles=args.warmup_cycles,
                ))
                policy_generate(engine, w_ids, scheduler=wsched,
                                temperature=args.temperature,
                                forced_acc_by_bs=w_forced_by_bs,
                                window=args.policy_window)
        elif args.collect_profile:
            from dflash_tpu.spec.profiled import profiled_generate

            profiled_generate(engine, w_ids, temperature=args.temperature,
                              draft_steps=args.draft_steps, forced_acc=forced)
        else:
            engine.generate(w_ids, temperature=args.temperature, seed=args.seed,
                            forced_acc=forced, draft_steps=args.draft_steps)
        log("warmup generation done (compiles excluded from metrics)")
    for idx in indices:
        instance = rows[idx]
        messages = []
        for turn_index, user_content in enumerate(instance["turns"]):
            messages.append({"role": "user", "content": user_content})
            input_text = tokenizer.apply_chat_template(
                messages, tokenize=False, add_generation_prompt=True
            )
            input_ids = np.asarray(tokenizer.encode(input_text))[None, :]
            input_ids = input_ids[:, : args.prompt_cap]

            response = {}
            t0 = time.perf_counter()
            if not args.skip_baseline:
                base = engine.ar_generate(input_ids, temperature=args.temperature, seed=args.seed)
                base = SimpleNamespace(**base._asdict())
                base.wall_time_s = time.perf_counter() - t0
                base.profile_summary = None
                response[1] = base

            t1 = time.perf_counter()
            aliased_bs1 = block_size == 1 and not args.skip_baseline
            if aliased_bs1:
                # reference dedups its bs candidates (dict.fromkeys([1,
                # block_size]), benchmark.py:456-457): bs=1 means ONE
                # degenerate AR run serving as both baseline and "spec".
                # Without this the spec run would overwrite response[1] and
                # the baseline metrics would be computed from the wrong run.
                base.cycle_trace = []
                spec = base
            elif args.mode == "candidates":
                from dflash_tpu.spec.candidates import CandidateConfig, candidate_generate

                cc = CandidateConfig(
                    mode=args.candidate_mode,
                    max_candidates=args.max_candidates,
                    rank_top_k=args.branch_top_k,
                    fixed_prefix_len=args.fixed_prefix_len,
                    sparse_max_positions=args.sparse_max_positions,
                    branch_depth=args.branch_depth,
                    margin_threshold=args.margin_threshold,
                    adaptive=args.adaptive_candidates,
                )
                spec = candidate_generate(engine, input_ids, cc,
                                          temperature=args.temperature,
                                          forced_acc=forced)
                spec = SimpleNamespace(**spec._asdict(), profile_summary=None, cycle_trace=[])
            elif args.mode == "dynamic":
                from dflash_tpu.sched import EWMAScheduler, SchedulerConfig
                from dflash_tpu.spec.policy import policy_generate

                fixed_bs = block_size if args.scheduler_mode == "fixed" else None
                sched = None if fixed_bs else EWMAScheduler(SchedulerConfig(
                    candidates=tuple(candidates),
                    mode=args.scheduler_mode,
                    warmup_cycles=args.warmup_cycles,
                    ewma_alpha=args.ewma_alpha,
                    switch_margin=args.switch_margin,
                    probe_interval=args.probe_interval,
                ))
                forced_by_bs = None
                if args.forced_tau is not None:
                    all_bs = sorted(set(candidates) | {block_size})
                    forced_by_bs = make_forced_acc_by_bs(
                        args.max_new_tokens, all_bs, args.forced_tau, args.seed
                    )
                spec_r, used, trace, snap = policy_generate(
                    engine, input_ids,
                    scheduler=None if fixed_bs else sched,
                    fixed_block_size=fixed_bs,
                    temperature=args.temperature, collect_trace=True,
                    forced_acc_by_bs=forced_by_bs,
                    window=args.policy_window,
                )
                spec = SimpleNamespace(**spec_r._asdict(), profile_summary=None,
                                       cycle_trace=trace, used_block_sizes=used,
                                       scheduler_snapshot=snap)
            elif args.collect_profile:
                from dflash_tpu.spec.profiled import profiled_generate

                spec_r, trace, prof = profiled_generate(
                    engine, input_ids, temperature=args.temperature,
                    draft_steps=args.draft_steps, forced_acc=forced,
                )
                spec = SimpleNamespace(**spec_r._asdict(), profile_summary=prof,
                                       cycle_trace=trace)
            else:
                spec_r = engine.generate(
                    input_ids, temperature=args.temperature, seed=args.seed,
                    forced_acc=forced, draft_steps=args.draft_steps,
                )
                spec = SimpleNamespace(**spec_r._asdict(), profile_summary=None, cycle_trace=[])
            if not aliased_bs1:
                spec.wall_time_s = time.perf_counter() - t1
            response[block_size] = spec
            responses.append(response)

            gen_ids = spec.output_ids[0, spec.num_input_tokens:]
            output_text = tokenizer.decode(gen_ids, skip_special_tokens=True)
            messages.append({"role": "assistant", "content": output_text})

            if args.save_cycle_trace_path:
                for row in getattr(spec, "cycle_trace", []):
                    cycle_trace_records.append({
                        "rank": dist.rank(), "dataset": args.dataset,
                        "dataset_row_idx": idx, "turn_index": turn_index,
                        "mode": args.mode, "block_size": int(block_size), **row,
                    })
            output_records.append({
                "rank": dist.rank(), "dataset_row_idx": idx, "turn_index": turn_index,
                "dataset": args.dataset, "prompt_text": user_content,
                "block_size": int(block_size), "draft_steps": args.draft_steps,
                "baseline": None if args.skip_baseline else {
                    "num_input_tokens": response[1].num_input_tokens,
                    "num_output_tokens": response[1].num_output_tokens,
                    "wall_time_s": response[1].wall_time_s,
                    "ttft_s": response[1].time_to_first_token,
                    "tpot_s": response[1].time_per_output_token,
                },
                "speculative": {
                    "output_text": output_text,
                    "num_input_tokens": spec.num_input_tokens,
                    "num_output_tokens": spec.num_output_tokens,
                    "wall_time_s": spec.wall_time_s,
                    "ttft_s": spec.time_to_first_token,
                    "tpot_s": spec.time_per_output_token,
                    "acceptance_lengths": spec.acceptance_lengths,
                    "profile_summary": spec.profile_summary,
                },
            })

    if dist.size() > 1:
        responses = [r for part in dist.all_gather_object(responses) for r in part]
        output_records = [r for part in dist.all_gather_object(output_records) for r in part]
        if args.save_cycle_trace_path:
            cycle_trace_records = [
                r for part in dist.all_gather_object(cycle_trace_records) for r in part
            ]
        if not dist.is_main():
            return

    spec_samples = [r[block_size] for r in responses]
    spec_metrics = summarize_mode(spec_samples)
    if not args.skip_baseline:
        baseline_metrics = summarize_mode([r[1] for r in responses])
        print(f"Baseline total_wall_s: {baseline_metrics['total_wall_s']:.6f}")
        print(f"Baseline avg_wall_s: {baseline_metrics['avg_wall_s']:.6f}")
        print(f"Baseline TTFT: {baseline_metrics['avg_ttft_s']:.6f}")
        print(f"Baseline TPOT: {baseline_metrics['avg_tpot_s']:.6f}")
        print(f"Baseline tokens_per_sec: {baseline_metrics['tokens_per_sec']:.6f}")

    print(f"Speculative total_wall_s: {spec_metrics['total_wall_s']:.6f}")
    print(f"Speculative avg_wall_s: {spec_metrics['avg_wall_s']:.6f}")
    print(f"Speculative TTFT: {spec_metrics['avg_ttft_s']:.6f}")
    print(f"Speculative TPOT: {spec_metrics['avg_tpot_s']:.6f}")
    print(f"Speculative tokens_per_sec: {spec_metrics['tokens_per_sec']:.6f}")
    if not args.skip_baseline:
        print(f"Decoding speedup: {baseline_metrics['avg_tpot_s'] / spec_metrics['avg_tpot_s']:.2f}")
    else:
        print("Decoding speedup: N/A (baseline skipped)")

    if args.collect_profile:
        prof = summarize_profile([s.profile_summary for s in spec_samples])
        if prof is not None:
            print(f"Speculative profile avg_target_prefill_s: {prof['avg_target_prefill_s']:.6f}")
            print(f"Speculative profile avg_target_decode_s: {prof['avg_target_decode_s']:.6f}")
            print(f"Speculative profile avg_draft_decode_s: {prof['avg_draft_decode_s']:.6f}")
            print(f"Speculative profile target_share_decode: {prof['target_share_decode']:.4f}")
            print(f"Speculative profile draft_share_decode: {prof['draft_share_decode']:.4f}")
            print(f"Speculative profile total_profiled_cycles: {int(prof['total_profiled_cycles'])}")

    acc_lists = [s.acceptance_lengths for s in spec_samples]
    print(f"Average Acceptance length: {mean_tau(acc_lists):.2f}")
    hist = tau_histogram(acc_lists, block_size)
    print(f"Acceptance length histogram: {[f'{x * 100:.1f}%' for x in hist]}")
    print(f"Draft steps per cycle: {args.draft_steps}")
    print(f"Hardware Device: {jax.devices()[0].device_kind}")
    print(f"Hardware JAX: {jax.__version__}")
    print(f"Hardware World Size: {dist.size()}")

    if args.save_outputs_path:
        out_path = Path(args.save_outputs_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        with out_path.open("w", encoding="utf-8") as f:
            for row in output_records:
                f.write(json.dumps(row, ensure_ascii=False) + "\n")
        print(f"Saved per-sample outputs to: {out_path}")

    if args.save_cycle_trace_path:
        trace_path = Path(args.save_cycle_trace_path)
        trace_path.parent.mkdir(parents=True, exist_ok=True)
        with trace_path.open("w", encoding="utf-8") as f:
            for row in cycle_trace_records:
                f.write(json.dumps(row, ensure_ascii=False) + "\n")
        print(f"Saved per-cycle trace to: {trace_path}")


if __name__ == "__main__":
    main()
