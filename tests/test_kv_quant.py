"""INT8 KV cache: quantization numerics + spec==AR parity with quant cache."""

import jax
import jax.numpy as jnp
import numpy as np

from dflash_tpu.cache.kv import quantize_rows
from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.models import dflash_draft, qwen3
from dflash_tpu.ops.attention import gqa_attention, gqa_attention_quant
from dflash_tpu.spec.engine import SpecEngine

DTYPE = jnp.float32


def test_quantize_rows_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 5, 2, 16)).astype(np.float32))
    q, s = quantize_rows(x)
    deq = q.astype(jnp.float32) * s[..., None]
    err = np.abs(np.asarray(deq) - np.asarray(x))
    bound = np.asarray(s)[..., None] * 0.51
    assert (err <= bound + 1e-7).all()


def test_gqa_attention_quant_close_to_dense():
    rng = np.random.default_rng(1)
    B, Sq, Sk, nh, nkv, d = 1, 3, 12, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, Sq, nh, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Sk, nkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Sk, nkv, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, Sq, Sk)) > 0.3)
    mask = mask.at[:, :, 0].set(True)
    dense = np.asarray(gqa_attention(q, k, v, mask, d**-0.5))
    kq, ks = quantize_rows(k)
    vq, vs = quantize_rows(v)
    quant = np.asarray(gqa_attention_quant(q, kq, ks, vq, vs, mask, d**-0.5))
    np.testing.assert_allclose(quant, dense, rtol=0.05, atol=0.05)


def test_spec_equals_ar_with_quant_kv_cache():
    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=8, num_layers=2)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, DTYPE)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, DTYPE)
    engine = SpecEngine(
        tcfg, dcfg, t_params, d_params, max_new_tokens=16,
        block_size=8, prompt_cap=32, prompt_bucket=16, kv_quant=True,
    )
    prompt = np.random.default_rng(4).integers(0, tcfg.vocab_size - 2, size=(1, 6))
    spec = engine.generate(prompt, temperature=0.0)
    ar = engine.ar_generate(prompt, temperature=0.0)
    np.testing.assert_array_equal(spec.output_ids, ar.output_ids)
    # and it differs only slightly from the bf16-cache decode
    engine_fp = SpecEngine(
        tcfg, dcfg, t_params, d_params, max_new_tokens=16,
        block_size=8, prompt_cap=32, prompt_bucket=16, kv_quant=False,
    )
    ar_fp = engine_fp.ar_generate(prompt, temperature=0.0)
    assert ar_fp.output_ids.shape[1] > 0  # smoke: both decode


def test_candidates_with_quant_kv_cache():
    from dflash_tpu.spec.candidates import CandidateConfig, candidate_generate

    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=6, num_layers=1)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, DTYPE)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, DTYPE)
    engine = SpecEngine(
        tcfg, dcfg, t_params, d_params, max_new_tokens=12,
        block_size=6, prompt_cap=32, prompt_bucket=16, kv_quant=True,
    )
    prompt = np.asarray([[5, 6, 7, 8]])
    cc = CandidateConfig(mode="fixed_prefix_rank", max_candidates=3, rank_top_k=3)
    res = candidate_generate(engine, prompt, cc, temperature=0.0)
    ar = engine.ar_generate(prompt, temperature=0.0)
    np.testing.assert_array_equal(res.output_ids, ar.output_ids)
