"""Dynamic block-size scheduling: EWMA performance scheduler + ADL mode.

Host-side policy state machine with the same semantics as the reference
``EWMAPerformanceScheduler`` (benchmark_dynamic_schedule.py:54-257):

* per-candidate EWMA estimates of tau and cycle seconds; score = tau^ / c^
* warmup: round-robin probe of every candidate block size
* periodic probing of non-current candidates to keep estimates fresh
* hysteresis: a switch requires a relative score improvement above
  ``switch_margin``, sustained for ``required_streak`` updates, and is
  followed by a cooldown
* low-acceptance fallback: persistently poor acceptance ratio at the current
  size drops to the lower neighbor immediately
* ``adl`` mode (DiffuSpec-style adaptive draft length): EWMA of the
  EOS-aware generated length picks a target k; candidate pool restricted to a
  neighborhood of the nearest candidate.

The scheduler is deliberately host-side (it consumes wall-clock cycle times);
the jitted cycle functions are compiled once per candidate block size and the
host merely picks which executable to launch — see spec/policy.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence


@dataclass
class SchedulerConfig:
    candidates: Sequence[int] = (8, 12, 16)
    mode: str = "ewma"  # "ewma" | "adl_ewma"
    warmup_cycles: int = 6
    ewma_alpha: float = 0.35
    switch_margin: float = 0.08
    required_streak: int = 2
    cooldown_cycles: int = 6
    probe_interval: int = 24
    low_accept_threshold: float = 0.25
    low_accept_streak: int = 2
    # Shared cycle-cost estimate: ONE global EWMA of cycle seconds feeds
    # every candidate's score instead of per-size EWMAs.  Rationale
    # (round 5, docs/measurements/policy_window_r5*.json): through a
    # high-RTT runtime the per-cycle wall is dominated by dispatch
    # amortization, so per-size cost estimates measure HOW a size happened
    # to be dispatched (probe prefix vs steady window vs single), not what
    # it costs — noise flips scores and the scheduler churns.  On hardware
    # where cycle cost is flat across block sizes (measured flat over bs
    # 12-19 on both the reference's A100, results.md:371-373, and v5e),
    # sharing the cost term removes the artifact while probes keep doing
    # their real job: refreshing per-size tau estimates.  Off by default
    # (reference-faithful per-size costs).
    shared_cost: bool = False
    # ADL parameters
    adl_rho: float = 0.35
    adl_delta: float = 2.0
    adl_k_min: int = 2
    adl_k_max: int = 32
    adl_neighborhood: int = 4

    def __post_init__(self):
        self.candidates = sorted({int(b) for b in self.candidates})
        if any(b < 2 for b in self.candidates):
            raise ValueError("candidate block sizes must be >= 2")
        if self.mode not in ("ewma", "adl_ewma"):
            raise ValueError("mode must be 'ewma' or 'adl_ewma'")
        if not (0.0 < self.ewma_alpha <= 1.0):
            raise ValueError("ewma_alpha must be in (0, 1]")
        if not (0.0 < self.adl_rho <= 1.0):
            raise ValueError("adl_rho must be in (0, 1]")
        if self.adl_k_min > self.adl_k_max:
            raise ValueError("adl_k_min must be <= adl_k_max")


def _ewma(old: Optional[float], new: float, alpha: float) -> float:
    if old is None:
        return float(new)
    return (1.0 - alpha) * old + alpha * new


class EWMAScheduler:
    def __init__(self, cfg: SchedulerConfig):
        self.cfg = cfg
        self.candidates: List[int] = list(cfg.candidates)
        self.current: int = self.candidates[-1]

        self.tau_hat: Dict[int, Optional[float]] = {b: None for b in self.candidates}
        self.cycle_hat: Dict[int, Optional[float]] = {b: None for b in self.candidates}
        self.score_hat: Dict[int, Optional[float]] = {b: None for b in self.candidates}
        self.obs_count: Dict[int, int] = {b: 0 for b in self.candidates}

        self.cooldown_left = 0
        self.pending_target = self.current
        self.pending_streak = 0
        self.low_accept_count = 0
        self.probe_cursor = 0
        self.switch_count = 0
        self.shared_cycle_hat: Optional[float] = None

        self.adl_lgen_hat: Optional[float] = None
        self.adl_lacc_hat: Optional[float] = None
        self.adl_target_k: int = int(
            min(max(self.current, cfg.adl_k_min), cfg.adl_k_max)
        )
        self.adl_target_bs: int = self._nearest_candidate(self.adl_target_k)

    # -- helpers ------------------------------------------------------------

    def _nearest_candidate(self, k: int) -> int:
        return min(self.candidates, key=lambda b: (abs(b - k), -b))

    def _lower_neighbor(self, b: int) -> int:
        i = self.candidates.index(b)
        return self.candidates[max(0, i - 1)]

    def _next_probe(self) -> int:
        for _ in range(len(self.candidates)):
            b = self.candidates[self.probe_cursor % len(self.candidates)]
            self.probe_cursor += 1
            if b != self.current:
                return b
        return self.current

    # -- policy -------------------------------------------------------------

    def select(self, cycle_idx: int) -> int:
        cfg = self.cfg
        if cycle_idx < cfg.warmup_cycles:
            return self.candidates[cycle_idx % len(self.candidates)]
        if cfg.probe_interval > 0:
            since = cycle_idx - cfg.warmup_cycles
            if since >= 0 and since % cfg.probe_interval == 0:
                return self._next_probe()
        return self.current

    def update(
        self,
        *,
        tau: float,
        cycle_s: float,
        effective_bs: int,
        cycle_idx: int,
        l_gen: Optional[float] = None,
    ) -> None:
        cfg = self.cfg
        effective_bs = int(effective_bs)
        if effective_bs not in self.tau_hat:
            # Ignore off-candidate tail cycles so they can't skew estimates.
            return

        a = cfg.ewma_alpha
        self.tau_hat[effective_bs] = _ewma(self.tau_hat[effective_bs], tau, a)
        self.cycle_hat[effective_bs] = _ewma(self.cycle_hat[effective_bs], cycle_s, a)
        if cfg.shared_cost:
            self.shared_cycle_hat = _ewma(self.shared_cycle_hat, cycle_s, a)
            c = max(1e-12, self.shared_cycle_hat)
            # every size's score re-derives from the shared cost so stale
            # per-size denominators can't linger
            for b, t in self.tau_hat.items():
                if t is not None:
                    self.score_hat[b] = t / c
        else:
            self.score_hat[effective_bs] = self.tau_hat[effective_bs] / max(
                1e-12, self.cycle_hat[effective_bs]
            )
        self.obs_count[effective_bs] += 1

        if cfg.mode == "adl_ewma" and l_gen is not None:
            self.adl_lgen_hat = _ewma(self.adl_lgen_hat, float(l_gen), cfg.adl_rho)
            self.adl_lacc_hat = _ewma(self.adl_lacc_hat, float(tau), cfg.adl_rho)
            growth = cfg.adl_delta if self.adl_lacc_hat >= self.adl_lgen_hat else 0.0
            k_next = int(
                min(max(math.ceil(self.adl_lgen_hat + growth), cfg.adl_k_min), cfg.adl_k_max)
            )
            self.adl_target_k = k_next
            self.adl_target_bs = self._nearest_candidate(k_next)

        # Low-acceptance fallback to the lower neighbor.  Note: any cycle not
        # run at `current` (a probe) resets the streak — so interleaved
        # probes can defer the fallback.  Reference-faithful: the reference
        # scheduler has the identical else-reset
        # (benchmark_dynamic_schedule.py:201-205).
        acceptance_ratio = tau / max(1.0, float(effective_bs))
        if acceptance_ratio < cfg.low_accept_threshold and effective_bs == self.current:
            self.low_accept_count += 1
        else:
            self.low_accept_count = 0
        if self.low_accept_count >= cfg.low_accept_streak:
            lower = self._lower_neighbor(self.current)
            if lower != self.current:
                self.current = lower
                self.pending_target = self.current
                self.pending_streak = 0
                self.cooldown_left = cfg.cooldown_cycles
                self.switch_count += 1
            self.low_accept_count = 0

        if cycle_idx < cfg.warmup_cycles:
            return
        if self.cooldown_left > 0:
            self.cooldown_left -= 1
            return

        scored = [(b, s) for b, s in self.score_hat.items() if s is not None]
        if not scored:
            return
        if cfg.mode == "adl_ewma":
            pool = {
                b for b in self.candidates
                if abs(b - self.adl_target_bs) <= cfg.adl_neighborhood
            }
            local = [(b, s) for b, s in scored if b in pool]
            if local:
                scored = local

        best_b, best_score = max(scored, key=lambda x: x[1])
        current_score = self.score_hat.get(self.current)
        if current_score is None:
            current_score = -float("inf")

        rel_improvement = (best_score - current_score) / max(1e-12, abs(current_score))
        if best_b == self.current or rel_improvement <= cfg.switch_margin:
            self.pending_target = self.current
            self.pending_streak = 0
            return

        if best_b == self.pending_target:
            self.pending_streak += 1
        else:
            self.pending_target = best_b
            self.pending_streak = 1

        if self.pending_streak >= cfg.required_streak:
            self.current = best_b
            self.pending_streak = 0
            self.cooldown_left = cfg.cooldown_cycles
            self.switch_count += 1

    def snapshot(self) -> dict:
        return {
            "current": self.current,
            "tau_hat": dict(self.tau_hat),
            "cycle_hat": dict(self.cycle_hat),
            "score_hat": dict(self.score_hat),
            "adl_target_k": self.adl_target_k,
            "adl_target_bs": self.adl_target_bs,
            "switch_count": self.switch_count,
        }
