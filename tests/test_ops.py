"""Unit tests for the pure ops: norms, rope, attention, sampling, accept rule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.core.config import build_target_layer_ids
from dflash_tpu.ops.attention import gqa_attention
from dflash_tpu.ops.norms import rms_norm
from dflash_tpu.ops.rope import apply_rope, rope_cos_sin
from dflash_tpu.ops.sampling import acceptance_length, sample

pytestmark = pytest.mark.smoke  # sub-2-minute CI tier (VERDICT r4 weak #5)


def test_rms_norm_matches_reference_formula():
    x = np.random.default_rng(0).normal(size=(2, 5, 16)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=(16,)).astype(np.float32)
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
    expect = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-5)


def test_rope_rotation_preserves_norm_and_position_zero_identity():
    d = 32
    x = np.random.default_rng(0).normal(size=(1, 4, 2, d)).astype(np.float32)
    pos = jnp.asarray([[0, 1, 5, 100]], jnp.int32)
    cos, sin = rope_cos_sin(pos, d, theta=10_000.0)
    out = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    # Position 0: cos=1, sin=0 -> identity.
    np.testing.assert_allclose(out[0, 0], x[0, 0], rtol=1e-6, atol=1e-6)
    # Rotation preserves per-pair norms -> full vector norm.
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
    )


def test_rope_relative_position_property():
    """q.k after RoPE depends only on relative offsets (per head-dim pair)."""
    d = 16
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 1, 1, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 1, 1, d)).astype(np.float32))

    def score(pq, pk):
        cq, sq = rope_cos_sin(jnp.asarray([[pq]], jnp.int32), d, 10_000.0)
        ck, sk = rope_cos_sin(jnp.asarray([[pk]], jnp.int32), d, 10_000.0)
        qe = apply_rope(q, cq, sq)
        ke = apply_rope(k, ck, sk)
        return float(jnp.sum(qe * ke))

    assert score(7, 3) == pytest.approx(score(14, 10), rel=1e-4)


def test_gqa_attention_matches_naive():
    rng = np.random.default_rng(0)
    B, Sq, Sk, nh, nkv, d = 2, 3, 7, 4, 2, 8
    q = rng.normal(size=(B, Sq, nh, d)).astype(np.float32)
    k = rng.normal(size=(B, Sk, nkv, d)).astype(np.float32)
    v = rng.normal(size=(B, Sk, nkv, d)).astype(np.float32)
    mask = rng.random((B, Sq, Sk)) > 0.3
    mask[:, :, 0] = True  # every query attends something
    scale = d**-0.5

    got = np.asarray(gqa_attention(*map(jnp.asarray, (q, k, v, mask)), scale))

    expect = np.zeros((B, Sq, nh * d), np.float32)
    for b in range(B):
        for h in range(nh):
            kv_h = h // (nh // nkv)
            s = q[b, :, h] @ k[b, :, kv_h].T * scale
            s = np.where(mask[b], s, -1e30)
            w = np.exp(s - s.max(-1, keepdims=True))
            w = w / w.sum(-1, keepdims=True)
            expect[b, :, h * d : (h + 1) * d] = w @ v[b, :, kv_h]
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_masked_rows_do_not_leak_even_with_garbage_values():
    B, Sq, Sk, nh, nkv, d = 1, 2, 4, 2, 2, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, Sq, nh, d)).astype(np.float32))
    k = rng.normal(size=(B, Sk, nkv, d)).astype(np.float32)
    v = rng.normal(size=(B, Sk, nkv, d)).astype(np.float32)
    k2, v2 = k.copy(), v.copy()
    k2[:, 2:] = 1e6  # garbage in masked rows
    v2[:, 2:] = -1e6
    mask = np.zeros((B, Sq, Sk), bool)
    mask[:, :, :2] = True
    a = gqa_attention(q, jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask), d**-0.5)
    b = gqa_attention(q, jnp.asarray(k2), jnp.asarray(v2), jnp.asarray(mask), d**-0.5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_greedy_and_temperature():
    logits = jnp.asarray([[[0.1, 3.0, -1.0, 0.5]]], jnp.float32)
    key = jax.random.PRNGKey(0)
    assert int(sample(logits, 0.0, key)[0, 0]) == 1
    # At high temperature sampling should eventually differ from argmax.
    draws = {
        int(sample(logits, 10.0, jax.random.PRNGKey(i))[0, 0]) for i in range(64)
    }
    assert len(draws) > 1


@pytest.mark.parametrize(
    "draft,posterior,expected",
    [
        # all match
        ([5, 6, 7], [5, 6, 7, 9], 3),
        # first mismatch stops acceptance even if later tokens match
        ([5, 0, 7], [5, 6, 7, 9], 1),
        ([0, 6, 7], [5, 6, 7, 9], 0),
        ([5, 6, 0], [5, 6, 7, 9], 2),
    ],
)
def test_acceptance_length_cumprod_rule(draft, posterior, expected):
    """Matches reference benchmark.py:163 cumprod prefix-match."""
    acc = acceptance_length(
        jnp.asarray([draft], jnp.int32), jnp.asarray([posterior], jnp.int32)
    )
    assert int(acc[0]) == expected


def test_build_target_layer_ids_reference_semantics():
    """Matches reference model/utils.py:4-14."""
    assert build_target_layer_ids(36, 1) == (18,)
    assert build_target_layer_ids(36, 2) == (1, 33)
    assert build_target_layer_ids(36, 3) == (1, 17, 33)
    assert build_target_layer_ids(36, 5) == (1, 9, 17, 25, 33)
    assert build_target_layer_ids(28, 1) == (14,)


def test_two_part_quant_ctx_attention_matches_concat():
    """The LSE-merged shared-int8-ctx + per-candidate-block attention must
    equal softmax over the dequantized concatenation (it is the same softmax,
    computed in two parts)."""
    import numpy as np
    from dflash_tpu.ops.attention import (
        gqa_attention,
        gqa_attention_quant_ctx_plus_block,
    )

    rng = np.random.default_rng(0)
    C, B, T, nh, nkv, d = 3, 4, 10, 4, 2, 8
    q = jnp.asarray(rng.normal(size=(C, B, nh, d)), jnp.float32)
    ctx_kq = jnp.asarray(rng.integers(-127, 128, size=(1, T, nkv, d)), jnp.int8)
    ctx_vq = jnp.asarray(rng.integers(-127, 128, size=(1, T, nkv, d)), jnp.int8)
    ctx_ks = jnp.asarray(rng.uniform(0.005, 0.02, size=(1, T, nkv)), jnp.float32)
    ctx_vs = jnp.asarray(rng.uniform(0.005, 0.02, size=(1, T, nkv)), jnp.float32)
    blk_k = jnp.asarray(rng.normal(size=(C, B, nkv, d)), jnp.float32)
    blk_v = jnp.asarray(rng.normal(size=(C, B, nkv, d)), jnp.float32)
    ctx_len = 7
    ctx_mask = jnp.arange(T) < ctx_len
    blk_mask = jnp.tril(jnp.ones((B, B), bool))
    scale = d ** -0.5

    got = gqa_attention_quant_ctx_plus_block(
        q, ctx_kq, ctx_ks, ctx_vq, ctx_vs, blk_k, blk_v, ctx_mask, blk_mask, scale
    )

    k_ctx = ctx_kq.astype(jnp.float32) * ctx_ks[..., None]
    v_ctx = ctx_vq.astype(jnp.float32) * ctx_vs[..., None]
    k_all = jnp.concatenate([jnp.broadcast_to(k_ctx, (C, T, nkv, d)), blk_k], axis=1)
    v_all = jnp.concatenate([jnp.broadcast_to(v_ctx, (C, T, nkv, d)), blk_v], axis=1)
    mask = jnp.concatenate(
        [jnp.broadcast_to(ctx_mask[None, :], (B, T)), blk_mask], axis=1
    )
    want = gqa_attention(q, k_all, v_all, mask, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # empty context: the merge must stay finite (ctx part fully masked)
    got0 = gqa_attention_quant_ctx_plus_block(
        q, ctx_kq, ctx_ks, ctx_vq, ctx_vs, blk_k, blk_v,
        jnp.zeros((T,), bool), blk_mask, scale,
    )
    mask0 = jnp.concatenate([jnp.zeros((B, T), bool), blk_mask], axis=1)
    want0 = gqa_attention(q, k_all, v_all, mask0, scale)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0), atol=2e-5)
