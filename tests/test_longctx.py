"""Long-context prefill: ring attention, cache-free prefill, chunked prefill.

The reference has no long-context parallelism (SURVEY §5 long-context row);
these are new TPU-native components.  Correctness anchors:
  * ring_prefill_attention == gqa_attention with a causal mask (8-dev mesh)
  * forward_prefill (cache-free O(P^2)) == forward (cache path) numerics
  * SpecEngine output is invariant to prefill strategy (default / chunked /
    sequence-parallel ring)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.cache.kv import init_kv_cache
from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.models import dflash_draft, qwen3
from dflash_tpu.ops.attention import gqa_attention
from dflash_tpu.parallel.mesh import make_mesh
from dflash_tpu.parallel.ring import ring_prefill_attention
from dflash_tpu.spec import SpecEngine


@pytest.fixture(scope="module")
def model_pair():
    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=4, num_layers=2)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32)
    return tcfg, dcfg, t_params, d_params


def test_ring_attention_matches_reference():
    n = len(jax.devices())
    mesh = make_mesh(sp=n)
    B, S, nh, nkv, d = 2, 8 * n, 4, 2, 16
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, nh, d), jnp.float32)
    k = jax.random.normal(kk, (B, S, nkv, d), jnp.float32)
    v = jax.random.normal(kv, (B, S, nkv, d), jnp.float32)
    scale = d ** -0.5

    causal = jnp.arange(S)[:, None] >= jnp.arange(S)[None, :]
    ref = gqa_attention(q, k, v, causal, scale)
    out = ring_prefill_attention(q, k, v, scale, mesh, "sp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_forward_prefill_matches_cache_forward(model_pair):
    tcfg, dcfg, t_params, _ = model_pair
    P, T = 16, 48
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, P), 1, tcfg.vocab_size - 1)
    positions = jnp.arange(P, dtype=jnp.int32)[None, :]
    embeds = qwen3.embed(t_params, ids)
    taps = dcfg.target_layer_ids

    kv = init_kv_cache(tcfg, 1, T, jnp.float32)
    mask = qwen3.causal_mask(positions[0], T)
    ref = qwen3.forward(
        t_params, tcfg, embeds, positions, kv, jnp.zeros((), jnp.int32), mask,
        tap_ids=taps,
    )
    out = qwen3.forward_prefill(t_params, tcfg, embeds, positions, tap_ids=taps)
    np.testing.assert_allclose(np.asarray(out.hidden), np.asarray(ref.hidden), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.taps), np.asarray(ref.taps), rtol=1e-5, atol=1e-5)
    # The produced K/V rows must equal what the cache path wrote at [0, P).
    np.testing.assert_allclose(
        np.asarray(out.k), np.asarray(ref.kv.k[:, :, :P]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.v), np.asarray(ref.kv.v[:, :, :P]), rtol=1e-5, atol=1e-5
    )


def _gen_tokens(engine, prompt, **kw):
    out = engine.generate(prompt, temperature=0.0, **kw)
    return np.asarray(out.output_ids)


def test_pallas_attn_impl_matches_ar(model_pair):
    """Decode with the frontier-bounded Pallas verify attention (interpret
    mode on CPU) must equal the XLA-attention engine token-for-token."""
    tcfg, dcfg, t_params, d_params = model_pair
    prompt = np.asarray(
        jax.random.randint(jax.random.PRNGKey(11), (1, 17), 1, tcfg.vocab_size - 2)
    )
    common = dict(max_new_tokens=16, prompt_cap=32, prompt_bucket=32, stop_token_ids=())
    ref = SpecEngine(tcfg, dcfg, t_params, d_params, **common).generate(
        prompt, temperature=0.0
    )
    eng = SpecEngine(tcfg, dcfg, t_params, d_params, attn_impl="pallas", **common)
    got = eng.generate(prompt, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got.output_ids), np.asarray(ref.output_ids))
    ar = eng.ar_generate(prompt, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got.output_ids), np.asarray(ar.output_ids))


@pytest.mark.parametrize("strategy", ["chunked", "ring"])
def test_prefill_strategy_invariance(model_pair, strategy):
    tcfg, dcfg, t_params, d_params = model_pair
    prompt = np.asarray(
        jax.random.randint(jax.random.PRNGKey(7), (1, 19), 1, tcfg.vocab_size - 2)
    )
    common = dict(
        max_new_tokens=24, prompt_cap=32, prompt_bucket=32, stop_token_ids=(),
    )
    base = SpecEngine(tcfg, dcfg, t_params, d_params, **common)
    ref = _gen_tokens(base, prompt)

    if strategy == "chunked":
        eng = SpecEngine(
            tcfg, dcfg, t_params, d_params, prefill_chunk=8, **common
        )
    else:
        mesh = make_mesh(sp=len(jax.devices()))
        eng = SpecEngine(
            tcfg, dcfg, t_params, d_params, mesh=mesh, seq_axis="sp", **common
        )
    got = _gen_tokens(eng, prompt)
    np.testing.assert_array_equal(got, ref)


def test_chunked_prefill_matches_ar(model_pair):
    tcfg, dcfg, t_params, d_params = model_pair
    prompt = np.asarray(
        jax.random.randint(jax.random.PRNGKey(9), (1, 13), 1, tcfg.vocab_size - 2)
    )
    eng = SpecEngine(
        tcfg, dcfg, t_params, d_params, max_new_tokens=16,
        prompt_cap=16, prompt_bucket=16, stop_token_ids=(), prefill_chunk=4,
    )
    spec = eng.generate(prompt, temperature=0.0)
    ar = eng.ar_generate(prompt, temperature=0.0)
    np.testing.assert_array_equal(
        np.asarray(spec.output_ids), np.asarray(ar.output_ids)
    )


def test_bucketed_attention_matches_full_read(model_pair):
    """attn_impl='bucketed' must produce the same tokens as the full-T read
    (spec==AR alone cannot catch a consistently-wrong bounded read)."""
    tcfg, dcfg, t_params, d_params = model_pair
    prompt = np.asarray(
        jax.random.randint(jax.random.PRNGKey(13), (1, 21), 1, tcfg.vocab_size - 2)
    )
    common = dict(max_new_tokens=16, prompt_cap=32, prompt_bucket=32, stop_token_ids=())
    full = SpecEngine(tcfg, dcfg, t_params, d_params, attn_impl="xla", **common)
    buck = SpecEngine(tcfg, dcfg, t_params, d_params, attn_impl="bucketed", **common)
    a = full.generate(prompt, temperature=0.0)
    b = buck.generate(prompt, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(a.output_ids), np.asarray(b.output_ids))
    np.testing.assert_array_equal(
        np.asarray(full.ar_generate(prompt, temperature=0.0).output_ids),
        np.asarray(buck.ar_generate(prompt, temperature=0.0).output_ids),
    )


def test_auto_prefill_chunk_selection():
    """prefill_chunk='auto' resolves by padded prompt length — since the
    round-5 flash prefill kernel removed the O(P^2) transient, full prefill
    wins to far past any measured crossover (8k: 763 vs 1915 ms chunked);
    chunking engages only at extreme lengths (peak-memory control) and must
    DIVIDE the padded length."""
    from dflash_tpu.spec.engine import SpecEngine

    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=4, num_layers=1)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32)
    eng = SpecEngine(tcfg, dcfg, t_params, d_params, max_new_tokens=8,
                     prompt_cap=8192, prompt_bucket=128, prefill_chunk="auto")
    assert eng._resolve_chunk(128) is None
    assert eng._resolve_chunk(4096) is None
    assert eng._resolve_chunk(8192) is None  # flash full prefill wins at 8k
    # past the memory threshold the chunk must DIVIDE the padded length
    # (chunked prefill asserts it): walk down 512 -> 256 -> 128
    assert eng._resolve_chunk(16896) == 512  # 33 * 512
    assert eng._resolve_chunk(16640) == 256  # 65 * 256, not a 512 multiple
    assert eng._resolve_chunk(16512) == 128  # 129 * 128, neither
    prompt = np.random.default_rng(0).integers(0, tcfg.vocab_size - 2, size=(1, 9))
    spec = eng.generate(prompt, temperature=0.0)
    ar = eng.ar_generate(prompt, temperature=0.0)
    np.testing.assert_array_equal(spec.output_ids, ar.output_ids)
    # a real generation at a >4096 pad that is NOT a 512 multiple (4100 ->
    # pad 4224): previously crashed with 'prompt pad not divisible by chunk'
    long_prompt = np.random.default_rng(1).integers(
        0, tcfg.vocab_size - 2, size=(1, 4100)
    )
    long_out = eng.generate(long_prompt, temperature=0.0)
    assert long_out.num_output_tokens >= 1
