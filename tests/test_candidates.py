"""Candidate-solutions engine: builders (pure), budget logic, and decode parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.models import dflash_draft, qwen3
from dflash_tpu.spec.candidates import (
    CandidateConfig,
    build_branch_beam,
    build_fixed_prefix_rank,
    build_uncertainty_sparse_rank,
    candidate_generate,
    resolve_cycle_budget,
)
from dflash_tpu.spec.engine import SpecEngine

DTYPE = jnp.float32


def _logits(B, V, rows):
    """draft_logits [1, B-1, V] with given per-row descending preferences."""
    lg = np.full((1, B - 1, V), -10.0, np.float32)
    for r, prefs in enumerate(rows):
        for rank, (tok, val) in enumerate(prefs):
            lg[0, r, tok] = val
    return jnp.asarray(lg)


def test_fixed_prefix_rank_builder():
    B, V = 4, 64
    block = jnp.asarray([[7, 1, 2, 3]], jnp.int32)
    # rows correspond to block positions 1..3; top tokens per row:
    lg = _logits(B, V, [
        [(1, 5.0), (11, 4.0), (12, 3.0)],
        [(2, 5.0), (21, 4.0), (22, 3.0)],
        [(3, 5.0), (31, 4.0), (32, 3.0)],
    ])
    cc = CandidateConfig(mode="fixed_prefix_rank", max_candidates=3, rank_top_k=3, fixed_prefix_len=2)
    cand, scores = build_fixed_prefix_rank(block, lg, cc)
    cand = np.asarray(cand)
    # Candidate 0: greedy base; suffix starts at position 2.
    np.testing.assert_array_equal(cand[0], [7, 1, 2, 3])
    # Candidate 1: rank-2 at positions 2,3.
    np.testing.assert_array_equal(cand[1], [7, 1, 21, 31])
    np.testing.assert_array_equal(cand[2], [7, 1, 22, 32])
    s = np.asarray(scores)
    assert s[0] == pytest.approx(10.0)  # 5 + 5
    assert s[1] == pytest.approx(8.0)
    assert s[2] == pytest.approx(6.0)


def test_uncertainty_sparse_rank_builder_targets_uncertain_positions():
    B, V = 4, 64
    block = jnp.asarray([[7, 1, 2, 3]], jnp.int32)
    # Position 2 (row 1) is very uncertain (margin 0.1); others confident.
    lg = _logits(B, V, [
        [(1, 9.0), (11, 1.0)],
        [(2, 5.0), (21, 4.9)],
        [(3, 9.0), (31, 1.0)],
    ])
    cc = CandidateConfig(
        mode="uncertainty_sparse_rank", max_candidates=2, rank_top_k=2,
        fixed_prefix_len=1, sparse_max_positions=1,
    )
    cand, scores = build_uncertainty_sparse_rank(block, lg, cc)
    cand = np.asarray(cand)
    np.testing.assert_array_equal(cand[0], [7, 1, 2, 3])
    # The single alternate flips only position 2 to its rank-2 token (21).
    np.testing.assert_array_equal(cand[1], [7, 1, 21, 3])


def test_branch_beam_builder_enumerates_best_combos():
    B, V = 4, 64
    block = jnp.asarray([[7, 1, 2, 3]], jnp.int32)
    lg = _logits(B, V, [
        [(1, 3.0), (11, 2.9)],
        [(2, 3.0), (21, 1.0)],
        [(3, 3.0), (31, 1.0)],
    ])
    cc = CandidateConfig(mode="branch_beam", max_candidates=3, branch_depth=2, rank_top_k=2)
    cand, scores = build_branch_beam(block, lg, cc)
    cand = np.asarray(cand)
    np.testing.assert_array_equal(cand[0], [7, 1, 2, 3])
    # Best non-greedy combo flips position 1 (margin .1 cost) not position 2.
    np.testing.assert_array_equal(cand[1], [7, 11, 2, 3])


def test_resolve_cycle_budget_semantics():
    cc = CandidateConfig(
        adaptive=True, max_candidates=4, adaptive_budgets=(1, 2, 4),
        adaptive_accept_thresholds=(0.75, 0.45), adaptive_warmup_cycles=2,
        adaptive_probe_interval=10,
    )
    g = lambda cyc, ratio: int(resolve_cycle_budget(cc, jnp.int32(cyc), jnp.float32(ratio)))
    assert g(0, -1.0) == 4  # warmup -> high
    assert g(5, 0.9) == 1   # high acceptance -> low budget
    assert g(5, 0.6) == 2   # mid
    assert g(5, 0.2) == 4   # low acceptance -> high
    assert g(10, 0.9) == 4  # probe cycle -> high
    # non-adaptive: always max
    cc2 = CandidateConfig(adaptive=False, max_candidates=3)
    assert int(resolve_cycle_budget(cc2, jnp.int32(5), jnp.float32(0.9))) == 3


@pytest.mark.parametrize("mode", ["fixed_prefix_rank", "uncertainty_sparse_rank", "branch_beam"])
def test_candidate_decode_matches_ar_greedy(mode):
    """Whatever the candidate set, committed tokens at T=0 must be exactly the
    AR greedy sequence (every accepted token equals the target's argmax)."""
    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=6, num_layers=2)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, DTYPE)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, DTYPE)
    engine = SpecEngine(
        tcfg, dcfg, t_params, d_params, max_new_tokens=18,
        block_size=6, prompt_cap=32, prompt_bucket=16,
    )
    prompt = np.random.default_rng(5).integers(0, tcfg.vocab_size - 2, size=(1, 7))
    cc = CandidateConfig(mode=mode, max_candidates=3, rank_top_k=3,
                         fixed_prefix_len=2, sparse_max_positions=2, branch_depth=2)
    res = candidate_generate(engine, prompt, cc, temperature=0.0)
    ar = engine.ar_generate(prompt, temperature=0.0)
    np.testing.assert_array_equal(res.output_ids, ar.output_ids)
    assert all(1 <= t <= 6 for t in res.acceptance_lengths)


def test_candidate_forced_acc_overrides_tau():
    """--forced-tau must reach the candidate path (reference cost studies run
    at operative tau~7.9, reference results.md:480-515): the per-cycle tau
    trace must follow the forced pattern exactly."""
    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=6, num_layers=1)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, DTYPE)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, DTYPE)
    engine = SpecEngine(
        tcfg, dcfg, t_params, d_params, max_new_tokens=18,
        block_size=6, prompt_cap=32, prompt_bucket=16,
    )
    prompt = np.asarray([[3, 4, 5, 6]])
    cc = CandidateConfig(mode="fixed_prefix_rank", max_candidates=3, rank_top_k=3)
    forced = np.asarray([4, 2, 4, 2, 4, 2, 4, 2], np.int32)  # acc values
    res = candidate_generate(engine, prompt, cc, temperature=0.0, forced_acc=forced)
    expect = (forced + 1).tolist()[: len(res.acceptance_lengths)]
    assert res.acceptance_lengths == expect


def test_candidate_decode_adaptive_budget_runs():
    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=6, num_layers=2)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, DTYPE)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, DTYPE)
    engine = SpecEngine(
        tcfg, dcfg, t_params, d_params, max_new_tokens=12,
        block_size=6, prompt_cap=32, prompt_bucket=16,
    )
    prompt = np.asarray([[3, 4, 5, 6]])
    cc = CandidateConfig(mode="fixed_prefix_rank", max_candidates=4, rank_top_k=4,
                         adaptive=True, adaptive_budgets=(1, 2, 4))
    res = candidate_generate(engine, prompt, cc, temperature=0.0)
    ar = engine.ar_generate(prompt, temperature=0.0)
    np.testing.assert_array_equal(res.output_ids, ar.output_ids)


def test_topk_desc_matches_lax_top_k():
    """topk_desc must be bit-identical to lax.top_k, including tie order."""
    from dflash_tpu.ops.sampling import topk_desc

    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 97)).astype(np.float32)
    x[0, 10] = x[0, 20] = x[0, 30] = 3.5  # ties
    x[2] = 0.0  # all-tied row
    for n in (1, 3, 8):
        v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), n)
        v, i = topk_desc(jnp.asarray(x), n)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


@pytest.mark.parametrize("mode", ["fixed_prefix_rank", "uncertainty_sparse_rank", "branch_beam"])
def test_shared_prefix_verify_matches_unflattened(mode):
    """The flattened shared-prefix verify (one [1, p + C*(B-p)] row set) must
    commit exactly the tokens of the per-candidate [C, B] verify at T=0 —
    the two layouts compute the same attention sets row-for-row."""
    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=6, num_layers=2)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, DTYPE)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, DTYPE)
    engine = SpecEngine(
        tcfg, dcfg, t_params, d_params, max_new_tokens=18,
        block_size=6, prompt_cap=32, prompt_bucket=16,
    )
    prompt = np.random.default_rng(9).integers(0, tcfg.vocab_size - 2, size=(1, 7))
    base = dict(mode=mode, max_candidates=3, rank_top_k=3,
                fixed_prefix_len=2, sparse_max_positions=2, branch_depth=2)
    flat = candidate_generate(
        engine, prompt, CandidateConfig(shared_prefix=True, **base), temperature=0.0
    )
    unflat = candidate_generate(
        engine, prompt, CandidateConfig(shared_prefix=False, **base), temperature=0.0
    )
    np.testing.assert_array_equal(flat.output_ids, unflat.output_ids)
    assert flat.acceptance_lengths == unflat.acceptance_lengths
