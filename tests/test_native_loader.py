"""Native (C++ mmap) safetensors loader vs the reference safetensors package."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def st_file(tmp_path_factory):
    import ml_dtypes
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    tensors = {
        "model.embed.weight": rng.normal(size=(100, 32)).astype(np.float32),
        "layer.0.w": rng.normal(size=(8, 16)).astype(np.float32).astype(ml_dtypes.bfloat16),
        "bias": rng.normal(size=(7,)).astype(np.float16),
        "ids": rng.integers(0, 100, size=(3, 4)).astype(np.int64),
        "flag": np.asarray([1, 0, 1], np.int8),
    }
    path = tmp_path_factory.mktemp("st") / "model.safetensors"
    save_file({k: np.asarray(v) for k, v in tensors.items()}, str(path),
              metadata={"format": "pt"})
    return path, tensors


def test_native_loader_matches_reference(st_file):
    from dflash_tpu.io import NativeSafetensors

    path, tensors = st_file
    with NativeSafetensors(path) as f:
        assert set(f.keys()) == set(tensors)
        for name, ref in tensors.items():
            got = f.get(name)
            assert got.shape == ref.shape
            assert got.dtype == np.asarray(ref).dtype
            np.testing.assert_array_equal(
                got.view(np.uint8).reshape(-1), np.asarray(ref).view(np.uint8).reshape(-1)
            )


def test_native_loader_missing_tensor_and_file(st_file, tmp_path):
    from dflash_tpu.io import NativeSafetensors

    path, _ = st_file
    with NativeSafetensors(path) as f:
        with pytest.raises(KeyError):
            f.get("nope")
    with pytest.raises(OSError):
        NativeSafetensors(tmp_path / "missing.safetensors")


def test_load_file_zero_copy_views(st_file):
    from dflash_tpu.io import load_file

    path, tensors = st_file
    d = load_file(path)
    assert not d["model.embed.weight"].flags.writeable
    np.testing.assert_array_equal(
        d["model.embed.weight"], tensors["model.embed.weight"]
    )


def test_native_loader_feeds_param_loading(tmp_path):
    """End-to-end: HF checkpoint -> native loader -> identical params."""
    pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM
    import torch

    cfg_hf = Qwen3Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    Qwen3ForCausalLM(cfg_hf).save_pretrained(tmp_path, safe_serialization=True)

    from dflash_tpu.io import load_file

    f = sorted(tmp_path.glob("*.safetensors"))[0]
    native = load_file(f)
    from safetensors import safe_open

    with safe_open(str(f), framework="np") as ref:
        for k in ref.keys():
            a = native[k]
            b = ref.get_tensor(k)
            np.testing.assert_array_equal(
                a.view(np.uint8).reshape(-1), b.view(np.uint8).reshape(-1)
            )
