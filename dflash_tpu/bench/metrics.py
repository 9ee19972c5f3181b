"""Benchmark metric aggregation — the reference's exact metric vocabulary
(benchmark.py:254-298, 553-604): TTFT, TPOT, tokens/s, total/avg wall, tau
mean + histogram, decoding speedup = baseline TPOT / spec TPOT, and the
profile shares.  Names and formulas are kept identical so numbers are
directly comparable with results.md."""

from __future__ import annotations

from itertools import chain
from typing import Iterable, List, Optional

import numpy as np


def summarize_mode(samples: Iterable) -> dict:
    samples = list(samples)
    total_wall_s = float(np.sum([s.wall_time_s for s in samples]))
    total_tokens = int(np.sum([s.num_output_tokens for s in samples]))
    return {
        "total_wall_s": total_wall_s,
        "avg_wall_s": float(np.mean([s.wall_time_s for s in samples])),
        "avg_ttft_s": float(np.mean([s.time_to_first_token for s in samples])),
        "avg_tpot_s": float(np.mean([s.time_per_output_token for s in samples])),
        "tokens_per_sec": float(total_tokens / max(total_wall_s, 1e-8)),
        "total_tokens": float(total_tokens),
    }


def summarize_profile(profiles: Iterable[Optional[dict]]) -> Optional[dict]:
    profiles = [p for p in profiles if p is not None]
    if not profiles:
        return None
    tot = lambda k: float(np.sum([p[k] for p in profiles]))
    total_target_prefill_s = tot("target_prefill_s")
    total_target_decode_s = tot("target_decode_s")
    total_draft_decode_s = tot("draft_decode_s")
    denom = max(1e-12, total_draft_decode_s + total_target_decode_s)
    n = len(profiles)
    return {
        "total_target_prefill_s": total_target_prefill_s,
        "total_target_decode_s": total_target_decode_s,
        "total_draft_decode_s": total_draft_decode_s,
        "total_cycle_decode_s": tot("cycle_decode_s_sum"),
        "total_decode_wall_s": tot("decode_wall_s"),
        "total_profiled_cycles": float(np.sum([p["profiled_cycles"] for p in profiles])),
        "draft_share_decode": total_draft_decode_s / denom,
        "target_share_decode": total_target_decode_s / denom,
        "avg_target_prefill_s": total_target_prefill_s / n,
        "avg_target_decode_s": total_target_decode_s / n,
        "avg_draft_decode_s": total_draft_decode_s / n,
        "avg_decode_wall_s": tot("decode_wall_s") / n,
    }


def tau_histogram(acceptance_lengths_per_sample: List[list], block_size: int) -> List[float]:
    """Fraction of cycles at each tau in [0, block_size]
    (reference benchmark.py:597-599)."""
    all_taus = list(chain(*acceptance_lengths_per_sample))
    if not all_taus:
        return [0.0] * (block_size + 1)
    return [all_taus.count(b) / len(all_taus) for b in range(block_size + 1)]


def mean_tau(acceptance_lengths_per_sample: List[list]) -> float:
    per_sample = [np.mean(a) for a in acceptance_lengths_per_sample if a]
    return float(np.mean(per_sample)) if per_sample else 0.0
