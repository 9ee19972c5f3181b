"""Multi-block-size benchmark: several speculative block sizes in ONE process
with a shared model load and a shared bs=1 baseline.

TPU-native counterpart of the reference's ``benchmark_multi_block.py``
(reference benchmark_multi_block.py:66-423): the reference re-runs
``dflash_generate`` per block size against the same loaded models; here each
block size gets its own jitted decode executable (static shapes) over the
SAME parameter arrays — the engines share every weight byte, so the marginal
cost per extra block size is one compile, as intended.

Prints the reference's ``[bs=N]`` metric lines and writes the same summary
CSV column set (reference benchmark_multi_block.py:305-416).

Run ``python -m dflash_tpu.bench.multi_block --help``.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np

from dflash_tpu.bench.cli import (
    build_parser,
    make_forced_acc,
    setup_jax_runtime,
    _resolve_models,
)


def parse_block_sizes(raw: str) -> list[int]:
    """Comma list -> unique positive ints, order-preserving (reference
    benchmark_multi_block.py:45-57)."""
    values = []
    for token in raw.replace(" ", "").split(","):
        if not token:
            continue
        val = int(token)
        if val < 1:
            raise ValueError(f"Invalid block size: {val}")
        values.append(val)
    values = list(dict.fromkeys(values))
    if not values:
        raise ValueError("No block sizes provided.")
    return values


def _fmt(v) -> str:
    return "NA" if v is None else f"{v:.6f}"


def build_multi_parser():
    p = build_parser()
    p.description = "DFlash-TPU multi-block benchmark (shared model load)"
    p.add_argument("--block-sizes", type=str, default="8,12,16",
                   help="Comma-separated speculative block sizes, e.g. 8,12,16")
    p.add_argument("--save-summary-path", type=str, default=None,
                   help="Optional CSV path for per-block aggregate metrics.")
    return p


def main(argv=None) -> None:
    args = build_multi_parser().parse_args(argv)
    t_setup = time.perf_counter()
    setup_jax_runtime(args)

    from dflash_tpu.bench.metrics import mean_tau, summarize_mode, tau_histogram
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

    block_sizes = parse_block_sizes(args.block_sizes)
    baseline_enabled = not args.skip_baseline
    if baseline_enabled and 1 in block_sizes:
        # the shared baseline already covers bs=1 (reference :107-109)
        block_sizes = [b for b in block_sizes if b != 1]
    if not block_sizes:
        raise SystemExit("After filtering, no speculative block sizes remain.")

    tcfg, dcfg, t_params, d_params = _resolve_models(args)
    log(f"models ready; block_sizes={block_sizes}")

    tokenizer = resolve_tokenizer(
        args.model_name_or_path if Path(args.model_name_or_path).exists() else None,
        tcfg.vocab_size,
    )
    rows = load_and_process_dataset(args.dataset, synthetic=args.synthetic_data)
    if args.max_samples is not None:
        rows = rows[: args.max_samples]
    log(f"dataset {args.dataset}: {len(rows)} rows")

    stop_ids = (tokenizer.eos_token_id,) if tokenizer.eos_token_id is not None else ()
    # One engine per block size; all engines alias the same param pytrees.
    engines = {
        bs: SpecEngine(
            tcfg, dcfg, t_params, d_params,
            max_new_tokens=args.max_new_tokens, block_size=bs,
            prompt_cap=args.prompt_cap, prompt_bucket=128,
            stop_token_ids=stop_ids,
        )
        for bs in block_sizes
    }
    base_engine = engines[block_sizes[0]]

    forced = {
        bs: (make_forced_acc(args.max_new_tokens, bs, args.forced_tau, args.seed)
             if args.forced_tau is not None else None)
        for bs in block_sizes
    }

    per_block_samples: dict[int, list] = {bs: [] for bs in block_sizes}
    baseline_samples: list = []
    output_records: list[dict] = []

    indices = list(range(dist.rank(), len(rows), dist.size()))
    if args.warmup and indices:
        # one unmeasured generation per executable (per block size + the AR
        # baseline), exactly what the inherited --warmup flag promises
        w_text = tokenizer.apply_chat_template(
            [{"role": "user", "content": rows[indices[0]]["turns"][0]}],
            tokenize=False, add_generation_prompt=True,
        )
        w_ids = np.asarray(tokenizer.encode(w_text))[None, : args.prompt_cap]
        if baseline_enabled:
            base_engine.ar_generate(w_ids, temperature=args.temperature, seed=args.seed)
        for bs in block_sizes:
            engines[bs].generate(
                w_ids, temperature=args.temperature, seed=args.seed,
                forced_acc=forced[bs], draft_steps=args.draft_steps,
            )
        log("warmup generations done (compiles excluded from metrics)")
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

            record = {
                "rank": dist.rank(), "dataset_row_idx": idx, "turn_index": turn_index,
                "dataset": args.dataset, "prompt_text": user_content,
                "baseline": None, "speculative": {},
            }

            if baseline_enabled:
                t0 = time.perf_counter()
                base = base_engine.ar_generate(
                    input_ids, temperature=args.temperature, seed=args.seed
                )
                wall = time.perf_counter() - t0
                baseline_samples.append(SimpleNamespace(**base._asdict(), wall_time_s=wall))
                record["baseline"] = {
                    "num_input_tokens": base.num_input_tokens,
                    "num_output_tokens": base.num_output_tokens,
                    "wall_time_s": wall,
                    "ttft_s": base.time_to_first_token,
                    "tpot_s": base.time_per_output_token,
                    "acceptance_lengths": base.acceptance_lengths,
                }

            for bs in block_sizes:
                t0 = time.perf_counter()
                spec = engines[bs].generate(
                    input_ids, temperature=args.temperature, seed=args.seed,
                    forced_acc=forced[bs], draft_steps=args.draft_steps,
                )
                wall = time.perf_counter() - t0
                gen_ids = spec.output_ids[0, spec.num_input_tokens:]
                per_block_samples[bs].append(
                    SimpleNamespace(**spec._asdict(), wall_time_s=wall)
                )
                record["speculative"][str(bs)] = {
                    "output_text": tokenizer.decode(gen_ids, skip_special_tokens=True),
                    "num_input_tokens": spec.num_input_tokens,
                    "num_output_tokens": spec.num_output_tokens,
                    "wall_time_s": wall,
                    "ttft_s": spec.time_to_first_token,
                    "tpot_s": spec.time_per_output_token,
                    "acceptance_lengths": spec.acceptance_lengths,
                }

            # keep the largest block size's reply for multi-turn datasets
            # (reference benchmark_multi_block.py:283-289)
            messages.append({
                "role": "assistant",
                "content": record["speculative"][str(max(block_sizes))]["output_text"],
            })
            output_records.append(record)

    if dist.size() > 1:
        gathered = {}
        for bs in block_sizes:
            parts = dist.all_gather_object(per_block_samples[bs])
            gathered[bs] = [s for part in parts for s in part]
        baseline_samples = [
            s for part in dist.all_gather_object(baseline_samples) for s in part
        ]
        output_records = [
            r for part in dist.all_gather_object(output_records) for r in part
        ]
        if not dist.is_main():
            return
        per_block_samples = gathered

    baseline_metrics = None
    if baseline_enabled:
        baseline_metrics = summarize_mode(baseline_samples)
        print(f"Baseline total_wall_s: {baseline_metrics['total_wall_s']:.6f}")
        print(f"Baseline avg_wall_s: {baseline_metrics['avg_wall_s']:.6f}")
        print(f"Baseline TTFT: {baseline_metrics['avg_ttft_s']:.6f}")
        print(f"Baseline TPOT: {baseline_metrics['avg_tpot_s']:.6f}")
        print(f"Baseline tokens_per_sec: {baseline_metrics['tokens_per_sec']:.6f}")

    summary_rows = []
    for bs in block_sizes:
        samples = per_block_samples[bs]
        metrics = summarize_mode(samples)
        acc_lists = [s.acceptance_lengths for s in samples]
        tau = mean_tau(acc_lists)
        hist_str = [f"{x * 100:.1f}%" for x in tau_histogram(acc_lists, bs)]

        print(f"[bs={bs}] Speculative total_wall_s: {metrics['total_wall_s']:.6f}")
        print(f"[bs={bs}] Speculative avg_wall_s: {metrics['avg_wall_s']:.6f}")
        print(f"[bs={bs}] Speculative TTFT: {metrics['avg_ttft_s']:.6f}")
        print(f"[bs={bs}] Speculative TPOT: {metrics['avg_tpot_s']:.6f}")
        print(f"[bs={bs}] Speculative tokens_per_sec: {metrics['tokens_per_sec']:.6f}")
        if baseline_metrics is not None:
            speedup = baseline_metrics["avg_tpot_s"] / metrics["avg_tpot_s"]
            print(f"[bs={bs}] Decoding speedup: {speedup:.2f}")
        else:
            speedup = None
            print(f"[bs={bs}] Decoding speedup: N/A (baseline skipped)")
        print(f"[bs={bs}] Average Acceptance length: {tau:.2f}")
        print(f"[bs={bs}] Acceptance length histogram: {hist_str}")

        summary_rows.append({
            "dataset": args.dataset,
            "max_samples": len(rows),
            "block_size": bs,
            "speedup": speedup,
            "tau": tau,
            "device": jax.devices()[0].device_kind,
            "jax_version": jax.__version__,
            "baseline_total_wall_s": None if baseline_metrics is None else baseline_metrics["total_wall_s"],
            "speculative_total_wall_s": metrics["total_wall_s"],
            "baseline_tokens_per_sec": None if baseline_metrics is None else baseline_metrics["tokens_per_sec"],
            "speculative_tokens_per_sec": metrics["tokens_per_sec"],
            "baseline_tpot": None if baseline_metrics is None else baseline_metrics["avg_tpot_s"],
            "speculative_tpot": metrics["avg_tpot_s"],
            "baseline_ttft": None if baseline_metrics is None else baseline_metrics["avg_ttft_s"],
            "speculative_ttft": metrics["avg_ttft_s"],
            "acceptance_histogram": hist_str,
            "world_size": dist.size(),
        })

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

    if args.save_summary_path:
        summary_path = Path(args.save_summary_path)
        summary_path.parent.mkdir(parents=True, exist_ok=True)
        header = (
            "dataset,max_samples,block_size,speedup,tau,device,jax_version,"
            "baseline_total_wall_s,speculative_total_wall_s,"
            "baseline_tokens_per_sec,speculative_tokens_per_sec,"
            "baseline_tpot,speculative_tpot,baseline_ttft,speculative_ttft,"
            "acceptance_histogram,world_size"
        )
        with summary_path.open("w", encoding="utf-8") as f:
            f.write(header + "\n")
            for row in summary_rows:
                f.write(",".join([
                    str(row["dataset"]), str(row["max_samples"]), str(row["block_size"]),
                    _fmt(row["speedup"]), _fmt(row["tau"]),
                    str(row["device"]), str(row["jax_version"]),
                    _fmt(row["baseline_total_wall_s"]), _fmt(row["speculative_total_wall_s"]),
                    _fmt(row["baseline_tokens_per_sec"]), _fmt(row["speculative_tokens_per_sec"]),
                    _fmt(row["baseline_tpot"]), _fmt(row["speculative_tpot"]),
                    _fmt(row["baseline_ttft"]), _fmt(row["speculative_ttft"]),
                    json.dumps(row["acceptance_histogram"]).replace(",", ";"),
                    str(row["world_size"]),
                ]) + "\n")
        print(f"Saved summary CSV to: {summary_path}")


if __name__ == "__main__":
    main()
