"""Profiled decode: per-cycle draft/verify phase timings.

TPU-native replacement for the reference's CUDA-event pairs
(benchmark.py:99-102, 149-160, 170-185): the draft and verify stages run as
separate jitted executables with a ``block_until_ready`` between them, giving
host wall-clock per phase.  This costs two host syncs per cycle, exactly like
the reference's per-phase event records + the per-cycle ``.item()`` sync —
use the fused loop (engine.generate) when not profiling.

Emits cycle-trace rows with the reference's schema (benchmark.py:172-185):
cycle_idx, generated_tokens_before, effective_block_size, tau,
acceptance_ratio, draft_s, target_s, cycle_s — so results.md-style analyses
run unchanged.

TPOT semantics (reference benchmark.py:88, 145-147, 204-206): the reference
resets its decode clock after the FIRST cycle's draft stage (the "draft
prefill" — it includes the one-time draft context projection) while keeping
ALL output tokens in the denominator, so TPOT = (decode wall - first cycle's
draft_s) / num_output_tokens.  This path reproduces that exactly; the fused
loop (engine.generate) cannot observe per-phase boundaries and therefore
includes the first draft stage in TPOT — a small conservative bias, same
direction for baseline and spec, so speedup ratios are unaffected.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dflash_tpu.spec.engine import GenerationResult, SpecEngine, _draft_stage, _prefill, _verify_stage


def profiled_generate(
    engine: SpecEngine,
    input_ids: np.ndarray,
    temperature: float = 0.0,
    seed: int = 0,
    draft_steps: int = 1,
    forced_acc: Optional[np.ndarray] = None,
):
    """Returns (GenerationResult, cycle_trace rows, profile_summary dict)."""
    B = engine.block_size
    draft_fn = jax.jit(
        partial(
            _draft_stage,
            tcfg=engine.tcfg, dcfg=engine.dcfg, block_size=B,
            draft_steps=draft_steps,
        )
    )
    verify_fn = jax.jit(
        partial(
            _verify_stage,
            tcfg=engine.tcfg, dcfg=engine.dcfg, block_size=B,
            stop_token_ids=engine.stop_token_ids, with_aux=True,
        )
    )

    ids, prompt_len, _ = engine._pad_prompt(input_ids)
    key = jax.random.PRNGKey(seed)
    temp = jnp.float32(temperature)
    max_length = prompt_len + engine.max_new_tokens
    if forced_acc is not None:
        fa = np.full((engine.max_new_tokens,), -1, np.int32)
        fa[: len(forced_acc)] = np.asarray(forced_acc, np.int32)[: engine.max_new_tokens]
        forced_acc = jnp.asarray(fa)

    t0 = time.perf_counter()
    state = _prefill(
        engine.t_params, engine.d_params, ids, jnp.int32(prompt_len), temp, key,
        tcfg=engine.tcfg, dcfg=engine.dcfg, total_len=engine.total_len,
        max_cycles=engine.max_new_tokens, kv_quant=engine.kv_quant,
    )
    state.output_ids.block_until_ready()
    ttft = time.perf_counter() - t0

    cycle_trace = []
    acceptance_lengths = []
    start, done, cycle_idx = prompt_len, False, 0
    decode_t0 = time.perf_counter()
    total_draft_s = total_verify_s = 0.0

    while start < max_length and not done and cycle_idx < engine.max_new_tokens:
        c0 = time.perf_counter()
        d_kv, block = draft_fn(state, engine.t_params, engine.d_params)
        block.block_until_ready()
        draft_s = time.perf_counter() - c0

        v0 = time.perf_counter()
        if forced_acc is not None:
            state, aux = verify_fn(
                state, d_kv, block, engine.t_params, temp, forced_acc=forced_acc
            )
        else:
            state, aux = verify_fn(state, d_kv, block, engine.t_params, temp)
        tau = int(aux.tau)  # sync
        verify_s = time.perf_counter() - v0
        cycle_s = time.perf_counter() - c0

        acceptance_lengths.append(tau)
        cycle_trace.append(
            {
                "cycle_idx": cycle_idx,
                "generated_tokens_before": start - prompt_len,
                "effective_block_size": B,
                "tau": tau,
                "acceptance_ratio": tau / max(1, B),
                "draft_s": draft_s,
                "target_s": verify_s,
                "cycle_s": cycle_s,
            }
        )
        total_draft_s += draft_s
        total_verify_s += verify_s
        start += tau
        done = bool(state.done)
        cycle_idx += 1

    decode_wall = time.perf_counter() - decode_t0
    # Reference TPOT clock: exclude the first cycle's draft stage (the draft
    # context "prefill", reference benchmark.py:145-147) but count ALL output
    # tokens (benchmark.py:204-206).
    first_draft_s = cycle_trace[0]["draft_s"] if cycle_trace else 0.0
    tpot_wall = max(decode_wall - first_draft_s, 0.0)
    out = np.asarray(state.output_ids)
    seq = engine._trim(out, prompt_len)
    num_out = int(seq.shape[1] - prompt_len)
    denom = max(1e-12, total_draft_s + total_verify_s)
    profile_summary = {
        "target_prefill_s": ttft,
        "target_decode_s": total_verify_s,
        "draft_decode_s": total_draft_s,
        "cycle_decode_s_sum": sum(r["cycle_s"] for r in cycle_trace),
        "decode_wall_s": decode_wall,
        "profiled_cycles": len(cycle_trace),
        "draft_share_decode": total_draft_s / denom,
        "target_share_decode": total_verify_s / denom,
    }
    result = GenerationResult(
        output_ids=seq,
        num_input_tokens=prompt_len,
        num_output_tokens=num_out,
        time_to_first_token=ttft,
        time_per_output_token=tpot_wall / max(num_out, 1),
        acceptance_lengths=acceptance_lengths,
        decode_wall_s=decode_wall,
    )
    return result, cycle_trace, profile_summary
