"""Suffix-seed and multi-round exact sampling modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.models import dflash_draft, qwen3
from dflash_tpu.spec.engine import SpecEngine
from dflash_tpu.spec.multiround import multiround_generate
from dflash_tpu.spec.suffix_seed import seed_positions_mask, suffix_seed_generate

DTYPE = jnp.float32


def _engine(**kw):
    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=6, num_layers=2)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, DTYPE)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, DTYPE)
    base = dict(max_new_tokens=16, block_size=6, prompt_cap=32, prompt_bucket=16)
    base.update(kw)
    return SpecEngine(tcfg, dcfg, t_params, d_params, **base)


def test_seed_positions_mask_matches_reference():
    """reference pick_seed_positions (benchmark_suffix_seed.py:28-36)."""
    np.testing.assert_array_equal(seed_positions_mask(6, "none"), [0] * 6)
    np.testing.assert_array_equal(seed_positions_mask(6, "dense"), [0, 1, 1, 1, 1, 1])
    np.testing.assert_array_equal(seed_positions_mask(6, "sparse"), [0, 0, 1, 0, 1, 0])
    np.testing.assert_array_equal(seed_positions_mask(1, "dense"), [0])


@pytest.mark.parametrize("mode", ["none", "dense", "sparse"])
def test_suffix_seed_matches_ar_greedy(mode):
    """Seeding changes only the denoising init — greedy output must still be
    exactly the AR sequence."""
    engine = _engine()
    prompt = np.random.default_rng(9).integers(0, engine.tcfg.vocab_size - 2, size=(1, 5))
    res = suffix_seed_generate(engine, prompt, mode=mode, temperature=0.0)
    ar = engine.ar_generate(prompt, temperature=0.0)
    np.testing.assert_array_equal(res.output_ids, ar.output_ids)


def test_suffix_seed_max_tokens_cap():
    engine = _engine()
    prompt = np.asarray([[4, 5, 6]])
    res = suffix_seed_generate(engine, prompt, mode="dense", max_seed_tokens=1, temperature=0.0)
    ar = engine.ar_generate(prompt, temperature=0.0)
    np.testing.assert_array_equal(res.output_ids, ar.output_ids)


def test_multiround_commits_one_token_per_step():
    engine = _engine(max_new_tokens=8)
    prompt = np.asarray([[3, 4, 5]])
    res, accepted_rounds, trace = multiround_generate(
        engine, prompt, round_block_sizes=(4, 2), temperature=0.7,
        collect_trace=True, seed=11,
    )
    assert res.num_output_tokens == 8
    assert len(accepted_rounds) == 7  # first token committed at prefill
    # rounds are in {1, 2, 3}: accepted at round 1/2 or residual fallback (3)
    assert set(accepted_rounds) <= {1, 2, 3}
    assert all(r["accept_prob"] <= 1.0 for r in trace)
    gen = res.output_ids[0, res.num_input_tokens:]
    assert gen.min() >= 0 and gen.max() < engine.tcfg.vocab_size


def test_multiround_exactness_statistics():
    """With a single round of bs=1, the proposal equals the target
    distribution, so every round-1 acceptance test passes (p/q = 1)."""
    engine = _engine(max_new_tokens=6)
    prompt = np.asarray([[7, 8]])
    res, accepted_rounds, _ = multiround_generate(
        engine, prompt, round_block_sizes=(1,), temperature=0.9, seed=3,
    )
    assert all(r == 1 for r in accepted_rounds)
