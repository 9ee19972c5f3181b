"""Fused two-part verify kernel (kernels/verify_fused.py) vs the XLA
reference path (ops/attention.py::gqa_attention_quant_ctx_plus_block).

The kernel must be numerically equivalent on every shape the verify uses —
vanilla block verify (C=1, causal mask), flattened shared-prefix candidate
rows (R = p + C*(B-p), routing mask), unflattened C>1 (candidate isolation),
int8 and bf16/f32 ctx caches, empty/partial/full frontiers — and the whole
spec decode must stay token-identical to AR when it runs through the kernel
(reference oracle: benchmark.py:456-471 baseline-vs-spec comparison).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.kernels.verify_fused import fused_ctx_block_attention
from dflash_tpu.ops.attention import gqa_attention_quant_ctx_plus_block


def _mk(rng, C, B, nh, nkv, d, T, quant):
    q = jnp.asarray(rng.standard_normal((C, B, nh, d)), jnp.float32)
    blk_k = jnp.asarray(rng.standard_normal((C, B, nkv, d)), jnp.float32)
    blk_v = jnp.asarray(rng.standard_normal((C, B, nkv, d)), jnp.float32)
    if quant:
        ck = jnp.asarray(rng.integers(-127, 127, (1, T, nkv, d)), jnp.int8)
        cv = jnp.asarray(rng.integers(-127, 127, (1, T, nkv, d)), jnp.int8)
        ks = jnp.asarray(rng.random((1, T, nkv)) * 0.02 + 0.001, jnp.float32)
        vs = jnp.asarray(rng.random((1, T, nkv)) * 0.02 + 0.001, jnp.float32)
    else:
        ck = jnp.asarray(rng.standard_normal((1, T, nkv, d)), jnp.float32)
        cv = jnp.asarray(rng.standard_normal((1, T, nkv, d)), jnp.float32)
        ks = vs = None
    return q, ck, ks, cv, vs, blk_k, blk_v


def _compare(q, ck, ks, cv, vs, blk_k, blk_v, ctx_len, blk_mask, atol=2e-5):
    T = ck.shape[1]
    scale = q.shape[-1] ** -0.5
    ctx_mask = jnp.arange(T) < ctx_len
    ref = gqa_attention_quant_ctx_plus_block(
        q, ck, ks, cv, vs, blk_k, blk_v, ctx_mask, blk_mask, scale
    )
    out = fused_ctx_block_attention(
        q, ck, ks, cv, vs, blk_k, blk_v, jnp.int32(ctx_len), blk_mask, scale,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("ctx_len", [0, 130, 256])
def test_vanilla_block_verify(quant, ctx_len):
    rng = np.random.default_rng(0)
    q, ck, ks, cv, vs, bk, bv = _mk(rng, 1, 16, 32, 8, 128, 256, quant)
    causal = jnp.tril(jnp.ones((16, 16), bool))
    _compare(q, ck, ks, cv, vs, bk, bv, ctx_len, causal)


def test_flattened_candidate_rows_routing_mask():
    """R = p + C*(B-p) rows with the shared-prefix routing mask — the
    multi-row shape the kernel exists for (spec/candidates.py use_flat)."""
    rng = np.random.default_rng(1)
    B, C, p = 16, 4, 2
    S = B - p
    R = p + C * S  # 58
    q, ck, ks, cv, vs, bk, bv = _mk(rng, 1, R, 32, 8, 128, 512, True)
    ri = jnp.arange(R)
    is_pre = ri < p
    cand_of = jnp.where(is_pre, -1, (ri - p) // S)
    pos = jnp.where(is_pre, ri, p + (ri - p) % S)
    mask = (pos[None, :] <= pos[:, None]) & (
        is_pre[None, :] | (cand_of[None, :] == cand_of[:, None])
    )
    _compare(q, ck, ks, cv, vs, bk, bv, 400, mask, atol=5e-5)


@pytest.mark.parametrize("quant", [False, True])
def test_unflattened_candidates_isolated(quant):
    """C>1 candidate blocks: the kernel adds the cross-candidate isolation
    itself (kron of eye(C) with the causal mask)."""
    rng = np.random.default_rng(2)
    q, ck, ks, cv, vs, bk, bv = _mk(rng, 4, 16, 32, 8, 128, 256, quant)
    causal = jnp.tril(jnp.ones((16, 16), bool))
    _compare(q, ck, ks, cv, vs, bk, bv, 37, causal)


def test_vmap_lane_folding():
    """vmap over lanes (the batched engine path) must fold into the kernel's
    lane grid dimension with per-lane frontiers."""
    rng = np.random.default_rng(3)
    L, B, nh, nkv, d, T = 3, 16, 32, 8, 128, 256
    scale = d ** -0.5
    args = []
    for _ in range(L):
        args.append(_mk(rng, 1, B, nh, nkv, d, T, True))
    stack = [jnp.stack([a[i] for a in args]) for i in range(7)]
    starts = jnp.asarray([3, 130, 256], jnp.int32)
    causal = jnp.tril(jnp.ones((B, B), bool))

    out = jax.vmap(
        lambda q, ck, ks, cv, vs, bk, bv, s: fused_ctx_block_attention(
            q, ck, ks, cv, vs, bk, bv, s, causal, scale, interpret=True
        )
    )(*stack, starts)
    for i in range(L):
        q, ck, ks, cv, vs, bk, bv = args[i]
        ctx_mask = jnp.arange(T) < starts[i]
        ref = gqa_attention_quant_ctx_plus_block(
            q, ck, ks, cv, vs, bk, bv, ctx_mask, causal, scale
        )
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref), atol=2e-5)


def test_unaligned_shapes_fall_back_to_xla():
    """d < 128 (tiny test models) must route to the XLA path, identically."""
    rng = np.random.default_rng(4)
    q, ck, ks, cv, vs, bk, bv = _mk(rng, 1, 8, 4, 2, 16, 48, False)
    causal = jnp.tril(jnp.ones((8, 8), bool))
    _compare(q, ck, ks, cv, vs, bk, bv, 20, causal, atol=1e-6)


# ---------------------------------------------------------------------------
# Whole-loop: spec decode through the kernel stays token-identical to AR
# ---------------------------------------------------------------------------

def _kernel_engine(**kw):
    from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
    from dflash_tpu.models import dflash_draft, qwen3
    from dflash_tpu.spec.engine import SpecEngine

    tcfg = tiny_target_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        head_dim=128, num_hidden_layers=2,
    )
    dcfg = tiny_draft_config(tcfg, block_size=8, num_layers=1)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32)
    return SpecEngine(
        tcfg, dcfg, t_params, d_params,
        max_new_tokens=16, block_size=8, prompt_cap=64, prompt_bucket=16,
        stop_token_ids=(), **kw,
    )


@pytest.mark.parametrize("kv_quant", [False, True])
def test_spec_decode_fused_matches_xla(kv_quant):
    eng_x = _kernel_engine(attn_impl="xla", kv_quant=kv_quant)
    eng_f = _kernel_engine(attn_impl="fused", kv_quant=kv_quant)
    assert eng_f.total_len % 128 == 0  # kernel actually engaged, no fallback
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, eng_x.tcfg.vocab_size - 2, size=(1, 9))
    rx = eng_x.generate(prompt, temperature=0.0)
    rf = eng_f.generate(prompt, temperature=0.0)
    np.testing.assert_array_equal(rx.output_ids, rf.output_ids)
    assert rx.acceptance_lengths == rf.acceptance_lengths


def test_candidate_decode_fused_matches_xla():
    from dflash_tpu.spec.candidates import CandidateConfig, candidate_generate

    eng = _kernel_engine(attn_impl="xla", kv_quant=True)
    rng = np.random.default_rng(11)
    prompt = rng.integers(0, eng.tcfg.vocab_size - 2, size=(1, 9))
    base = dict(
        mode="fixed_prefix_rank", max_candidates=3, rank_top_k=3,
        fixed_prefix_len=2, shared_prefix=True,
    )
    rx = candidate_generate(eng, prompt, CandidateConfig(**base, attn_impl="xla"))
    rf = candidate_generate(eng, prompt, CandidateConfig(**base, attn_impl="fused"))
    np.testing.assert_array_equal(rx.output_ids, rf.output_ids)
    assert rx.acceptance_lengths == rf.acceptance_lengths
