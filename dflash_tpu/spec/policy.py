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
        bs: jax.jit(
            partial(
                _cycle,
                tcfg=engine.tcfg,
                dcfg=engine.dcfg,
                block_size=bs,
                stop_token_ids=engine.stop_token_ids,
                ctx_window=max_block,
                with_aux=True,
            )
        )
        for bs in candidates
    }

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

    while start < max_length and not done and cycle_idx < engine.max_new_tokens:
        bs = (
            fixed_block_size
            if scheduler is None
            else scheduler.select(cycle_idx)
        )
        c0 = time.perf_counter()
        # draft_temperature=temp is reference-faithful for THIS harness: the
        # dynamic-schedule path samples the draft at temperature (reference
        # benchmark_dynamic_schedule.py:342) whereas the core loop drafts
        # greedily (benchmark.py:140).  At T>0 this path therefore diverges
        # from engine.generate by design — compare policy runs only against
        # other policy runs (e.g. --scheduler-mode fixed).
        if forced_jnp is not None:
            state, aux = cycle_fns[bs](
                state, engine.t_params, engine.d_params, temp,
                draft_temperature=temp, forced_acc=forced_jnp[bs],
            )
        else:
            state, aux = cycle_fns[bs](
                state, engine.t_params, engine.d_params, temp,
                draft_temperature=temp,
            )
        tau = int(aux.tau)  # device sync — intentional (time-fed policy)
        cycle_s = time.perf_counter() - c0
        l_gen = float(aux.l_gen)
        start = start + tau
        done = bool(state.done)

        if scheduler is not None:
            scheduler.update(
                tau=tau, cycle_s=cycle_s, effective_bs=bs,
                cycle_idx=cycle_idx, l_gen=l_gen,
            )
        acceptance_lengths.append(tau)
        used_block_sizes.append(bs)
        if collect_trace:
            snap = scheduler.snapshot() if scheduler is not None else {}
            cycle_trace.append(
                {
                    "cycle_idx": cycle_idx,
                    "start_idx": int(start - tau),
                    "block_size": int(bs),
                    "tau": tau,
                    "l_gen": l_gen,
                    "acceptance_ratio": tau / max(1, bs),
                    "cycle_s": cycle_s,
                    "current_block_size": snap.get("current"),
                    "score_hat": (snap.get("score_hat") or {}).get(bs),
                }
            )
        cycle_idx += 1

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
