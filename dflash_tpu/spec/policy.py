"""Dynamic block-size speculative decoding (host-in-the-loop policy path).

TPU-native equivalent of reference ``dflash_generate_policy``
(benchmark_dynamic_schedule.py:260-434): one jitted cycle executable is
compiled per candidate block size (static shapes — no recompiles at run
time), and the host scheduler picks which executable to launch each cycle,
feeding back (tau, wall-clock cycle seconds, EOS-aware l_gen).  This is the
one decode path that intentionally syncs per cycle — the scheduler consumes
wall-clock time, so it is inherently host-side (SURVEY §7 hard part 7); the
fixed-block path in engine.py stays fully on-device.

The draft-context KV window is ``max(candidates)`` rows so a cycle after a
large-block commit re-projects every newly committed feature row even when
the next block is small.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dflash_tpu.sched.ewma import EWMAScheduler
from dflash_tpu.spec.engine import GenerationResult, SpecEngine, _cycle, _prefill


class PolicyResult(GenerationResult):
    pass


# Module-level executable memos: policy_generate used to build fresh
# jax.jit wrappers per call, so every generation recompiled every candidate
# block size's cycle — which (a) multiplied CI wall-clock and (b) poisoned
# the scheduler's first wall-clock observation of each size with compile
# time (a ~1000x cycle_hat outlier the EWMA never recovers from).  Keys are
# the same static args the jit would specialize on.
from functools import lru_cache


@lru_cache(maxsize=256)
def _jit_cycle_fn(tcfg, dcfg, bs, stop_token_ids, ctx_window):
    return jax.jit(
        partial(
            _cycle,
            tcfg=tcfg, dcfg=dcfg, block_size=bs,
            stop_token_ids=stop_token_ids, ctx_window=ctx_window,
            with_aux=True,
        )
    )


@lru_cache(maxsize=256)
def _jit_window_fn(tcfg, dcfg, bs, stop_token_ids, ctx_window, n_steps,
                   max_cycles, la_threshold, la_streak):
    return jax.jit(
        partial(
            _window_impl,
            tcfg=tcfg, dcfg=dcfg, block_size=bs,
            stop_token_ids=stop_token_ids, ctx_window=ctx_window,
            n_steps=n_steps, max_cycles=max_cycles,
            low_accept_threshold=la_threshold, low_accept_streak=la_streak,
        )
    )


@lru_cache(maxsize=256)
def _jit_schedule_window_fn(tcfg, dcfg, schedule, rest_bs, stop_token_ids,
                            ctx_window, n_rest, max_cycles, la_threshold,
                            la_streak):
    return jax.jit(
        partial(
            _schedule_window_impl,
            tcfg=tcfg, dcfg=dcfg, schedule=schedule, rest_bs=rest_bs,
            stop_token_ids=stop_token_ids, ctx_window=ctx_window,
            n_rest=n_rest, max_cycles=max_cycles,
            low_accept_threshold=la_threshold, low_accept_streak=la_streak,
        )
    )


def _window_impl(
    state,
    t_params,
    d_params,
    temperature,
    max_length,
    forced_acc,
    lac0,  # [] int32 — the scheduler's low_accept_count entering the window
    *,
    tcfg,
    dcfg,
    block_size: int,
    stop_token_ids,
    ctx_window: int,
    n_steps: int,
    max_cycles: int,
    low_accept_threshold: float = 0.0,
    low_accept_streak: int = 0,
):
    """Up to ``n_steps`` policy cycles at ONE block size in ONE dispatch,
    returning the per-cycle (tau, l_gen) traces the host scheduler consumes.

    The round-2 policy path synced host<->device every cycle (~90 ms tunnel
    RTT vs ~10 ms cycle -> dynamic ran at 0.66x of fixed); windowing
    amortizes that sync over n_steps cycles while the EWMA state machine
    stays host-side and unchanged — it is fed the window's per-cycle tau
    trace, with the wall clock amortized across the window's cycles.

    The scheduler's LOW-ACCEPTANCE FALLBACK (reference
    benchmark_dynamic_schedule.py:201-215) is its one wall-clock-free switch
    trigger, so it is mirrored ON-DEVICE: the window carries the entering
    ``low_accept_count`` and stops at exactly the cycle where the host
    scheduler's fallback fires (acceptance ratio < threshold for ``streak``
    consecutive current-size cycles) — window mode and per-cycle mode
    produce IDENTICAL (block size, tau) traces for fallback switches.
    Score-based (EWMA margin+streak) switches consume wall-clock times and
    stay window-granular by design (tests pin both behaviors).  Pass
    ``low_accept_streak=0`` (or a hugely negative ``lac0``) to disable."""
    taus0 = jnp.zeros((n_steps,), jnp.int32)
    lgens0 = jnp.zeros((n_steps,), jnp.float32)

    def cond(c):
        st, taus, lgens, i, lac = c
        go = (
            (i < n_steps)
            & (~st.done)
            & (st.start < max_length)
            & (st.cycle_idx < max_cycles)
        )
        if low_accept_streak > 0:
            go = go & (lac < low_accept_streak)
        return go

    def body(c):
        st, taus, lgens, i, lac = c
        st2, aux = _cycle(
            st, t_params, d_params, temperature,
            tcfg=tcfg, dcfg=dcfg, block_size=block_size,
            stop_token_ids=stop_token_ids, ctx_window=ctx_window,
            draft_temperature=temperature, with_aux=True,
            forced_acc=forced_acc,
        )
        ratio = aux.tau.astype(jnp.float32) / jnp.float32(max(1, block_size))
        lac = jnp.where(ratio < low_accept_threshold, lac + 1, jnp.int32(0))
        return st2, taus.at[i].set(aux.tau), lgens.at[i].set(aux.l_gen), i + 1, lac

    st, taus, lgens, n_ran, _lac = jax.lax.while_loop(
        cond, body, (state, taus0, lgens0, jnp.int32(0), lac0)
    )
    return st, taus, lgens, n_ran


def _schedule_window_impl(
    state,
    t_params,
    d_params,
    temperature,
    max_length,
    fa_sched,  # tuple of per-cycle forced-acc arrays (or Nones), len(schedule)
    fa_rest,  # forced-acc array (or None) for the tail cycles
    *,
    tcfg,
    dcfg,
    schedule,  # static tuple of per-cycle block sizes (unrolled prefix)
    rest_bs: int,  # block size of the while-loop tail (0 = no tail)
    stop_token_ids,
    ctx_window: int,
    n_rest: int,
    max_cycles: int,
    low_accept_threshold: float = 0.0,
    low_accept_streak: int = 0,
):
    """A MIXED-SCHEDULE window: ``schedule``'s cycles unrolled (each at its
    own static block size), then ``n_rest`` cycles at ``rest_bs`` in the
    usual while-loop — all in ONE dispatch.

    This is what lets the scheduler's warmup round-robin (reference
    benchmark_dynamic_schedule.py:149-151) and its periodic probes (:154-159)
    ride inside windows instead of dispatching singly — the measured entirety
    of the windowed-dynamic vs windowed-fixed residual
    (docs/measurements/policy_window_probes.json: probes-off -> 0.76x).

    Prefix cycles that run after the generation finishes are PREDICATED: the
    small per-request leaves (output_ids, frontier, trace, key) freeze via
    select, while the KV caches / feature buffer advance harmlessly — their
    garbage writes land at or beyond the frozen frontier, which nothing ever
    reads (the same freeze discipline as spec/batched.py, where it is
    load-bearing for finished lanes).

    The prefix carries no low-acceptance cut: callers only use mixed windows
    where the host fallback provably cannot fire inside the prefix (a probe
    cycle is never at the scheduler's current size, so it RESETS the host
    streak — mirrored here by entering the tail with lac=0; warmup windows
    are gated on round-robin never producing ``low_accept_streak``
    consecutive current-size cycles).  The tail reuses the standard
    on-device fallback cut.
    """
    from dflash_tpu.spec.engine import LoopState

    n_pre = len(schedule)
    N = n_pre + n_rest
    taus = jnp.zeros((N,), jnp.int32)
    lgens = jnp.zeros((N,), jnp.float32)
    active = (
        (~state.done)
        & (state.start < max_length)
        & (state.cycle_idx < max_cycles)
    )
    st = state
    n_ran = jnp.int32(0)
    prefix_ran = jnp.zeros((), bool)
    for i, bs in enumerate(schedule):
        st2, aux = _cycle(
            st, t_params, d_params, temperature,
            tcfg=tcfg, dcfg=dcfg, block_size=int(bs),
            stop_token_ids=stop_token_ids, ctx_window=ctx_window,
            draft_temperature=temperature, with_aux=True,
            forced_acc=fa_sched[i],
        )
        st = LoopState(
            output_ids=jnp.where(active, st2.output_ids, st.output_ids),
            start=jnp.where(active, st2.start, st.start),
            done=jnp.where(active, st2.done, st.done),
            cycle_idx=jnp.where(active, st2.cycle_idx, st.cycle_idx),
            acc_trace=jnp.where(active, st2.acc_trace, st.acc_trace),
            key=jnp.where(active, st2.key, st.key),
            t_kv=st2.t_kv,
            d_kv=st2.d_kv,
            features=st2.features,
        )
        taus = taus.at[i].set(jnp.where(active, aux.tau, 0))
        lgens = lgens.at[i].set(jnp.where(active, aux.l_gen, 0.0))
        n_ran = n_ran + active.astype(jnp.int32)
        prefix_ran = prefix_ran | active
        active = (
            active
            & (~st.done)
            & (st.start < max_length)
            & (st.cycle_idx < max_cycles)
        )
    if n_rest == 0:
        return st, taus, lgens, n_ran

    # tail at rest_bs: a ran prefix (probe at bs != current) resets the host
    # low-accept streak, so the tail's on-device cut enters with lac = 0; if
    # the prefix did not run, the tail's cond fails on the same conditions
    # and lac is moot
    del prefix_ran
    lac_tail = jnp.int32(0)

    def cond(c):
        st, taus, lgens, i, lac = c
        go = (
            (i < N)
            & (~st.done)
            & (st.start < max_length)
            & (st.cycle_idx < max_cycles)
        )
        if low_accept_streak > 0:
            go = go & (lac < low_accept_streak)
        return go

    def body(c):
        st, taus, lgens, i, lac = c
        st2, aux = _cycle(
            st, t_params, d_params, temperature,
            tcfg=tcfg, dcfg=dcfg, block_size=rest_bs,
            stop_token_ids=stop_token_ids, ctx_window=ctx_window,
            draft_temperature=temperature, with_aux=True,
            forced_acc=fa_rest,
        )
        ratio = aux.tau.astype(jnp.float32) / jnp.float32(max(1, rest_bs))
        lac = jnp.where(ratio < low_accept_threshold, lac + 1, jnp.int32(0))
        return st2, taus.at[i].set(aux.tau), lgens.at[i].set(aux.l_gen), i + 1, lac

    st, taus, lgens, n_ran, _lac = jax.lax.while_loop(
        cond, body, (st, taus, lgens, n_ran, lac_tail)
    )
    return st, taus, lgens, n_ran


def policy_generate(
    engine: SpecEngine,
    input_ids: np.ndarray,
    *,
    scheduler: Optional[EWMAScheduler] = None,
    fixed_block_size: Optional[int] = None,
    temperature: float = 0.0,
    seed: int = 0,
    collect_trace: bool = False,
    forced_acc_by_bs: Optional[dict] = None,
    window: int = 1,
    probe_windows: bool = True,
):
    """Generate with a per-cycle block-size policy.

    ``engine`` must have been built with ``block_size >= max(candidates)``
    (its buffers are sized from it).  Returns (GenerationResult,
    used_block_sizes, cycle_trace, scheduler_snapshot).

    ``forced_acc_by_bs`` (benchmark-only): {block_size: [max_cycles] int32}
    acceptance overrides, one array per candidate block size — the emulated
    tau must DEPEND on the block size (reference block-sweep tau curve,
    results.md:9-16), otherwise the scheduler would trivially pick the
    smallest block (same tau, cheaper cycle) and the study measures nothing.

    ``window`` > 1 runs steady-state cycles in jitted multi-cycle windows
    (one dispatch per window at the current block size) and feeds the
    scheduler the window's per-cycle tau/l_gen trace with the wall clock
    amortized across its cycles.  Warmup and probe cycles ride in
    MIXED-SCHEDULE windows (round 5): the whole warmup round-robin is one
    dispatch, and each periodic probe is the first cycle of a current-size
    window — the probing PATTERN (which sizes run at which cycle indices)
    is preserved exactly; only the sync cadence changes.  Cycles where the
    mixed-window gates don't hold (1 candidate, probe_interval < window,
    near-end clamps) fall back to single dispatches.  window=1 is the
    reference-faithful per-cycle sync.
    """
    if scheduler is None and fixed_block_size is None:
        raise ValueError("either scheduler or fixed_block_size is required")
    candidates = (
        sorted(scheduler.candidates) if scheduler is not None else [int(fixed_block_size)]
    )
    max_block = max(candidates)
    if engine.block_size < max_block:
        raise ValueError(
            f"engine.block_size={engine.block_size} < max candidate {max_block}"
        )

    cycle_fns = {
        bs: _jit_cycle_fn(
            engine.tcfg, engine.dcfg, bs, engine.stop_token_ids, max_block
        )
        for bs in candidates
    }
    window = max(1, int(window))
    window_fns = {
        bs: _jit_window_fn(
            engine.tcfg, engine.dcfg, bs, engine.stop_token_ids, max_block,
            window, engine.max_new_tokens,
            scheduler.cfg.low_accept_threshold if scheduler is not None else 0.0,
            scheduler.cfg.low_accept_streak if scheduler is not None else 0,
        )
        for bs in candidates
    } if window > 1 else None
    _LAC_OFF = jnp.int32(-(10 ** 9))  # never reaches the streak inside a window

    # Mixed-schedule windows (probe batching): warmup round-robin as ONE
    # dispatch, and each periodic probe as the first cycle of a
    # current-size window.  Gates preserve exact per-cycle-mode (bs, tau)
    # traces: the warmup window requires that the low-accept fallback cannot
    # fire inside it (round-robin over >= 2 candidates never yields
    # low_accept_streak consecutive current-size cycles when streak >= 2);
    # a probe prefix always resets the host streak, so its tail starts at 0.
    probe_windows = probe_windows and window > 1 and scheduler is not None
    warmup_sched = None
    if (
        probe_windows
        and scheduler.cfg.warmup_cycles > 0
        and len(candidates) >= 2
        and (
            scheduler.cfg.low_accept_streak >= 2
            or scheduler.cfg.low_accept_threshold <= 0
        )
    ):
        warmup_sched = tuple(
            candidates[i % len(candidates)]
            for i in range(scheduler.cfg.warmup_cycles)
        )

    def _sched_fn(schedule, rest_bs, n_rest):
        return _jit_schedule_window_fn(
            engine.tcfg, engine.dcfg, schedule, rest_bs,
            engine.stop_token_ids, max_block, n_rest, engine.max_new_tokens,
            scheduler.cfg.low_accept_threshold if scheduler is not None else 0.0,
            scheduler.cfg.low_accept_streak if scheduler is not None else 0,
        )

    forced_jnp = None
    if forced_acc_by_bs is not None:
        forced_jnp = {}
        for bs in candidates:
            fa = np.full((engine.max_new_tokens,), -1, np.int32)
            arr = np.asarray(forced_acc_by_bs[bs], np.int32)[: engine.max_new_tokens]
            fa[: len(arr)] = arr
            forced_jnp[bs] = jnp.asarray(fa)

    ids, prompt_len, _ = engine._pad_prompt(input_ids)
    key = jax.random.PRNGKey(seed)
    temp = jnp.float32(temperature)
    plen = jnp.int32(prompt_len)
    max_length = prompt_len + engine.max_new_tokens

    t0 = time.perf_counter()
    state = _prefill(
        engine.t_params, engine.d_params, ids, plen, temp, key,
        tcfg=engine.tcfg, dcfg=engine.dcfg, total_len=engine.total_len,
        max_cycles=engine.max_new_tokens, kv_quant=engine.kv_quant,
    )
    state.output_ids.block_until_ready()
    ttft = time.perf_counter() - t0

    acceptance_lengths: list[int] = []
    used_block_sizes: list[int] = []
    cycle_trace: list[dict] = []
    cycle_idx = 0
    start = prompt_len
    done = False
    decode_t0 = time.perf_counter()

    def steady_span(idx: int) -> int:
        """Cycles from ``idx`` until the next warmup/probe boundary — a
        window is dispatched only when it fits entirely inside steady state,
        so the reference probing pattern is preserved exactly."""
        if scheduler is None:
            return 10 ** 9
        cfg = scheduler.cfg
        if idx < cfg.warmup_cycles:
            return 0
        if cfg.probe_interval > 0:
            r = (idx - cfg.warmup_cycles) % cfg.probe_interval
            return cfg.probe_interval - r if r else 0
        return 10 ** 9

    while start < max_length and not done and cycle_idx < engine.max_new_tokens:
        bs = (
            fixed_block_size
            if scheduler is None
            else scheduler.select(cycle_idx)
        )
        # Effective-block clamp near max_length (reference benchmark.py:
        # 104-105): with the budget nearly spent, drop to the largest
        # candidate that fits so the last cycle doesn't draft/verify tokens
        # the trim will discard.  Free here — every candidate's executable
        # already exists; the fused core loop deliberately overshoots+trims
        # instead (a bucketed last cycle costs extra dispatches, docs/
        # PARITY.md).
        clamped = False
        if scheduler is not None:
            remaining = max_length - start
            fit = [b for b in candidates if b <= remaining]
            if fit and bs > fit[-1]:
                bs = fit[-1]
                clamped = True
        fa = forced_jnp[bs] if forced_jnp is not None else None
        span = steady_span(cycle_idx)
        # Partial spans dispatch as the largest pow2 window that fits (the
        # ladder reuses _jit_window_fn per size, bounded compiles).  Without
        # this, the cycles between a probe window's end and the next probe
        # boundary dispatched SINGLY — and since the scheduler is wall-clock
        # fed, the current size's cycle_hat absorbed expensive single-
        # dispatch walls while probed sizes only ever saw cheap amortized
        # window walls, so score_hat[current] sank and the scheduler
        # thrashed (measured: tau 7.31 -> 6.48, usage uniform across sizes,
        # docs/measurements/policy_window_r5.json first attempt).  Uniform
        # window amortization keeps per-size cost estimates comparable.
        eff_w = 0
        if window_fns is not None and span > 0:
            eff_w = min(window, span)
            if scheduler is not None:
                # never let a window cross the near-end effective-block
                # clamp boundary (remaining < bs per-cycle would shrink bs):
                # bound by the worst-case cycles until remaining < bs, so
                # every cycle inside the window is provably unclamped and
                # the tail falls back to exact per-cycle dispatch
                eff_w = min(eff_w, (max_length - start) // bs)
            if eff_w > 0:
                eff_w = 1 << (eff_w.bit_length() - 1)
        use_window = eff_w > 1
        # warmup window only when no cycle inside it could hit the near-end
        # clamp (per-cycle mode would shrink those; remaining >> this at a
        # generation's start, the only place warmup runs)
        use_warmup = (
            warmup_sched is not None
            and cycle_idx == 0
            and not clamped
            and (max_length - start) >= sum(warmup_sched)
        )
        use_probe = (
            probe_windows
            and not use_window
            and not use_warmup
            and not clamped
            and cycle_idx >= scheduler.cfg.warmup_cycles
            and span == 0
            and bs != scheduler.current
            and window <= max(1, scheduler.cfg.probe_interval)
            # no cycle in the mixed window may hit the near-end clamp
            and (max_length - start) >= window * max(bs, scheduler.current)
        )
        c0 = time.perf_counter()
        # draft_temperature=temp is reference-faithful for THIS harness: the
        # dynamic-schedule path samples the draft at temperature (reference
        # benchmark_dynamic_schedule.py:342) whereas the core loop drafts
        # greedily (benchmark.py:140).  At T>0 this path therefore diverges
        # from engine.generate by design — compare policy runs only against
        # other policy runs (e.g. --scheduler-mode fixed).
        if use_window:
            # the on-device fallback cut mirrors host state only when this
            # window runs at the scheduler's current size (a clamped/probe
            # bs resets the host streak per cycle — disable the cut)
            lac0 = (
                jnp.int32(scheduler.low_accept_count)
                if scheduler is not None and bs == scheduler.current
                else _LAC_OFF
            )
            win_fn = window_fns[bs] if eff_w == window else _jit_window_fn(
                engine.tcfg, engine.dcfg, bs, engine.stop_token_ids,
                max_block, eff_w, engine.max_new_tokens,
                scheduler.cfg.low_accept_threshold if scheduler is not None else 0.0,
                scheduler.cfg.low_accept_streak if scheduler is not None else 0,
            )
            state, taus_d, lgens_d, n_ran_d = win_fn(
                state, engine.t_params, engine.d_params, temp,
                jnp.int32(max_length), fa, lac0,
            )
            n_ran = int(n_ran_d)
            wall = time.perf_counter() - c0
            taus = np.asarray(taus_d)[:n_ran]
            lgens = np.asarray(lgens_d)[:n_ran]
            obs = [(int(t), float(g), bs) for t, g in zip(taus, lgens)]
            per_cycle_s = wall / max(1, n_ran)
        elif use_warmup or use_probe:
            schedule = warmup_sched if use_warmup else (bs,)
            rest_bs = 0 if use_warmup else scheduler.current
            n_rest = 0 if use_warmup else window - 1
            if forced_jnp is not None:
                fa_sched = tuple(forced_jnp[b] for b in schedule)
                fa_rest = forced_jnp[rest_bs] if n_rest else None
            else:
                fa_sched = tuple(None for _ in schedule)
                fa_rest = None
            state, taus_d, lgens_d, n_ran_d = _sched_fn(
                schedule, rest_bs, n_rest
            )(
                state, engine.t_params, engine.d_params, temp,
                jnp.int32(max_length), fa_sched, fa_rest,
            )
            n_ran = int(n_ran_d)
            wall = time.perf_counter() - c0
            taus = np.asarray(taus_d)[:n_ran]
            lgens = np.asarray(lgens_d)[:n_ran]
            bs_seq = (list(schedule) + [rest_bs] * n_rest)[:n_ran]
            obs = [
                (int(t), float(g), b) for t, g, b in zip(taus, lgens, bs_seq)
            ]
            per_cycle_s = wall / max(1, n_ran)
        else:
            state, aux = cycle_fns[bs](
                state, engine.t_params, engine.d_params, temp,
                draft_temperature=temp, forced_acc=fa,
            )
            tau = int(aux.tau)  # device sync — intentional (time-fed policy)
            per_cycle_s = time.perf_counter() - c0
            obs = [(tau, float(aux.l_gen), bs)]
            n_ran = 1
        done = bool(state.done)

        for tau, l_gen, bs_i in obs:
            start = start + tau
            if scheduler is not None:
                scheduler.update(
                    tau=tau, cycle_s=per_cycle_s, effective_bs=bs_i,
                    cycle_idx=cycle_idx, l_gen=l_gen,
                )
            acceptance_lengths.append(tau)
            used_block_sizes.append(bs_i)
            if collect_trace:
                snap = scheduler.snapshot() if scheduler is not None else {}
                cycle_trace.append(
                    {
                        "cycle_idx": cycle_idx,
                        "start_idx": int(start - tau),
                        "block_size": int(bs_i),
                        "tau": tau,
                        "l_gen": l_gen,
                        "acceptance_ratio": tau / max(1, bs),
                        "cycle_s": per_cycle_s,
                        "current_block_size": snap.get("current"),
                        "score_hat": (snap.get("score_hat") or {}).get(bs),
                    }
                )
            cycle_idx += 1
            # a mid-window switch decision applies from the NEXT dispatch;
            # stop attributing cycles to this window once the scheduler
            # would no longer have chosen bs (equivalence is at window
            # granularity — documented)

    decode_wall = time.perf_counter() - decode_t0
    out = np.asarray(state.output_ids)
    seq = engine._trim(out, prompt_len)
    num_out = int(seq.shape[1] - prompt_len)
    result = GenerationResult(
        output_ids=seq,
        num_input_tokens=prompt_len,
        num_output_tokens=num_out,
        time_to_first_token=ttft,
        time_per_output_token=decode_wall / max(num_out, 1),
        acceptance_lengths=acceptance_lengths,
        decode_wall_s=decode_wall,
    )
    snapshot = scheduler.snapshot() if scheduler is not None else None
    return result, used_block_sizes, cycle_trace, snapshot
