"""Cross-stack parity: our functional Qwen3 vs HuggingFace transformers.

Builds a tiny random-init HF Qwen3 model (torch CPU), saves it to disk,
loads it through dflash_tpu's safetensors loader, and asserts logits parity.
This pins our RMSNorm/RoPE/GQA/qk-norm semantics to the exact stack the
reference runs on (reference benchmark.py:401-416), with no network access.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dflash_tpu.cache.kv import init_kv_cache  # noqa: E402
from dflash_tpu.core.config import model_config_from_hf  # noqa: E402
from dflash_tpu.models import qwen3  # noqa: E402
from dflash_tpu.models.loader import load_target_params  # noqa: E402


@pytest.fixture(scope="module")
def tiny_hf_qwen3(tmp_path_factory):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("hf_qwen3")
    model.save_pretrained(path, safe_serialization=True)
    return model, path


def test_logits_match_transformers(tiny_hf_qwen3):
    model, path = tiny_hf_qwen3
    cfg = model_config_from_hf(path)
    params = load_target_params(path, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 12))

    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.float().numpy()

    total_len = 16
    kv = init_kv_cache(cfg, 1, total_len, jnp.float32)
    positions = jnp.arange(12, dtype=jnp.int32)[None, :]
    mask = qwen3.causal_mask(positions[0], total_len)
    res = qwen3.forward(
        params, cfg, qwen3.embed(params, jnp.asarray(ids)), positions, kv,
        jnp.zeros((), jnp.int32), mask,
    )
    our_logits = np.asarray(qwen3.lm_head(params, res.hidden))
    np.testing.assert_allclose(our_logits, hf_logits, rtol=2e-3, atol=2e-3)
    # argmax parity everywhere (the decode-relevant property)
    np.testing.assert_array_equal(our_logits.argmax(-1), hf_logits.argmax(-1))


def test_hidden_state_taps_match_transformers(tiny_hf_qwen3):
    """Tap at layer id L must equal HF output_hidden_states[L+1]
    (reference model/utils.py:16-25 offset convention)."""
    model, path = tiny_hf_qwen3
    cfg = model_config_from_hf(path)
    params = load_target_params(path, cfg, dtype=jnp.float32)

    ids = np.arange(8)[None, :] % cfg.vocab_size
    with torch.no_grad():
        hf_out = model(torch.tensor(ids), output_hidden_states=True)
    # Note: tapping the FINAL layer would differ — HF's last hidden_states
    # entry is post-final-norm.  build_target_layer_ids caps taps at L-3
    # (reference model/utils.py:8), so real configs never tap it.
    tap_ids = (0, 1)
    hf_taps = np.concatenate(
        [hf_out.hidden_states[l + 1].float().numpy() for l in tap_ids], axis=-1
    )

    total_len = 8
    kv = init_kv_cache(cfg, 1, total_len, jnp.float32)
    positions = jnp.arange(8, dtype=jnp.int32)[None, :]
    mask = qwen3.causal_mask(positions[0], total_len)
    res = qwen3.forward(
        params, cfg, qwen3.embed(params, jnp.asarray(ids)), positions, kv,
        jnp.zeros((), jnp.int32), mask, tap_ids=tap_ids,
    )
    np.testing.assert_allclose(np.asarray(res.taps), hf_taps, rtol=2e-3, atol=2e-3)


def test_logits_match_transformers_llama(tmp_path):
    """Llama path: no qk-norm + llama3 rope scaling."""
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg_hf = LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=10000.0,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 128,
        },
        tie_word_embeddings=False,
        attention_bias=False,
        mlp_bias=False,
    )
    torch.manual_seed(1)
    model = LlamaForCausalLM(cfg_hf).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = model_config_from_hf(tmp_path)
    assert not cfg.use_qk_norm
    assert cfg.rope_scaling == (8.0, 1.0, 4.0, 128)
    params = load_target_params(tmp_path, cfg, dtype=jnp.float32)

    ids = (np.arange(10)[None, :] * 7) % cfg.vocab_size
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.float().numpy()
    kv = init_kv_cache(cfg, 1, 12, jnp.float32)
    positions = jnp.arange(10, dtype=jnp.int32)[None, :]
    mask = qwen3.causal_mask(positions[0], 12)
    res = qwen3.forward(
        params, cfg, qwen3.embed(params, jnp.asarray(ids)), positions, kv,
        jnp.zeros((), jnp.int32), mask,
    )
    our_logits = np.asarray(qwen3.lm_head(params, res.hidden))
    np.testing.assert_allclose(our_logits, hf_logits, rtol=2e-3, atol=2e-3)


def test_logits_match_transformers_qwen3_moe(tmp_path):
    """Qwen3-MoE path: softmax router, top-k, norm_topk_prob, expert MLPs
    (Qwen3-Coder-30B-A3B semantics, reference README.md:60-68 target)."""
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    cfg_hf = Qwen3MoeConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=10000.0,
        num_experts=8,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        norm_topk_prob=True,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    model = Qwen3MoeForCausalLM(cfg_hf).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = model_config_from_hf(tmp_path)
    assert cfg.is_moe and cfg.num_experts == 8
    params = load_target_params(tmp_path, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 10))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.float().numpy()

    total_len = 16
    kv = init_kv_cache(cfg, 1, total_len, jnp.float32)
    positions = jnp.arange(10, dtype=jnp.int32)[None, :]
    mask = qwen3.causal_mask(positions[0], total_len)
    res = qwen3.forward(
        params, cfg, qwen3.embed(params, jnp.asarray(ids)), positions, kv,
        jnp.zeros((), jnp.int32), mask,
    )
    our_logits = np.asarray(qwen3.lm_head(params, res.hidden))
    np.testing.assert_allclose(our_logits, hf_logits, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(our_logits.argmax(-1), hf_logits.argmax(-1))
