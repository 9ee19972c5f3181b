"""INT8 weight-only quantization: numerics, pytree behavior, engine parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.models import dflash_draft, qwen3
from dflash_tpu.ops.linear import QTensor, dequantize, linear, quantize_weight
from dflash_tpu.quant import quantize_draft_params, quantize_target_params
from dflash_tpu.spec.engine import SpecEngine


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    qt = quantize_weight(w)
    wd = dequantize(qt, jnp.float32)
    # per-channel absmax scaling: error <= scale/2 = absmax/254 per element
    absmax = np.abs(np.asarray(w)).max(0, keepdims=True)
    assert np.max(np.abs(np.asarray(wd) - np.asarray(w)) / (absmax + 1e-9)) <= 1 / 127


def test_quantize_padding_and_slicing():
    w = jnp.ones((32, 100), jnp.float32)
    qt = quantize_weight(w, pad_to=64)
    assert qt.q.shape == (32, 128)
    assert qt.n == 100
    x = jnp.ones((2, 32), jnp.float32)
    out = linear(x, qt)
    assert out.shape == (2, 100)
    np.testing.assert_allclose(np.asarray(out), 32.0, rtol=1e-2)


def test_linear_quantized_close_to_dense():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    dense = np.asarray(linear(x, w))
    quant = np.asarray(linear(x, quantize_weight(w)))
    rel = np.abs(dense - quant) / (np.abs(dense).max() + 1e-9)
    assert rel.max() < 0.02


def test_qtensor_scans_and_vmaps():
    """QTensor must slice through scan/vmap with n preserved as static aux."""
    qts = jax.vmap(lambda w: quantize_weight(w, pad_to=8))(
        jnp.ones((3, 8, 10), jnp.float32)
    )
    assert qts.q.shape == (3, 8, 16)
    assert qts.n == 10

    def body(carry, qt):
        y = linear(jnp.ones((1, 8), jnp.float32), qt)
        return carry + y.sum(), None

    total, _ = jax.lax.scan(body, jnp.float32(0.0), qts)
    assert float(total) == pytest.approx(3 * 10 * 8, rel=1e-2)


def test_spec_equals_ar_with_quantized_params():
    """Parity oracle must hold with int8 weights (both paths share them)."""
    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=8, num_layers=2)
    t_params = quantize_target_params(
        qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32), tcfg, pad_to=64
    )
    d_params = quantize_draft_params(
        dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32), dcfg, pad_to=64
    )
    engine = SpecEngine(
        tcfg, dcfg, t_params, d_params, max_new_tokens=16,
        block_size=8, prompt_cap=32, prompt_bucket=16,
    )
    prompt = np.random.default_rng(2).integers(0, tcfg.vocab_size - 2, size=(1, 5))
    spec = engine.generate(prompt, temperature=0.0)
    ar = engine.ar_generate(prompt, temperature=0.0)
    np.testing.assert_array_equal(spec.output_ids, ar.output_ids)


def _tiny_moe_cfg():
    import dataclasses

    tcfg = tiny_target_config()
    return dataclasses.replace(
        tcfg, num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32
    )


def test_moe_expert_quantization_numerics():
    """INT8 expert banks (per layer, per expert, per out-channel scales) must
    track the bf16 gather dispatch closely, and the quantized pytree must
    carry QTensor expert banks of the right shapes."""
    from dflash_tpu.models.qwen3 import _moe_mlp

    tcfg = _tiny_moe_cfg()
    params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
    lp_dense = jax.tree.map(lambda x: x[0], params["layers"])

    qparams = quantize_target_params(
        qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32), tcfg, pad_to=64
    )
    gate = qparams["layers"]["gate"]
    E, Im = tcfg.num_experts, tcfg.moe_intermediate_size
    L, H = tcfg.num_hidden_layers, tcfg.hidden_size
    assert isinstance(gate, QTensor)
    assert gate.q.shape == (L, E, H, Im) and gate.q.dtype == jnp.int8
    assert gate.scale.shape == (L, E, 1, Im)
    assert qparams["layers"]["down"].q.shape == (L, E, Im, H)
    assert qparams["layers"]["router"].dtype != jnp.int8  # router stays dense

    def _layer0(x):
        if isinstance(x, QTensor):
            return QTensor(x.q[0], x.scale[0], x.n)
        return x[0]

    lp_q = jax.tree.map(
        _layer0, qparams["layers"], is_leaf=lambda x: isinstance(x, QTensor)
    )
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 5, H)), jnp.float32)
    dense = np.asarray(_moe_mlp(lp_dense, tcfg, x))
    quant = np.asarray(_moe_mlp(lp_q, tcfg, x))
    rel = np.abs(dense - quant) / (np.abs(dense).max() + 1e-9)
    assert rel.max() < 0.05, rel.max()


def test_spec_equals_ar_with_quantized_moe():
    """Parity oracle with an int8-expert MoE target (the Qwen3-Coder-30B-A3B
    serving configuration at test scale, reference README.md:60-68)."""
    import dataclasses

    tcfg = _tiny_moe_cfg()
    dcfg = tiny_draft_config(tcfg, block_size=8, num_layers=1)
    dcfg = dataclasses.replace(
        dcfg,
        model=dataclasses.replace(
            dcfg.model, num_experts=0, num_experts_per_tok=0, moe_intermediate_size=0
        ),
    )
    t_params = quantize_target_params(
        qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32), tcfg, pad_to=64
    )
    d_params = quantize_draft_params(
        dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32), dcfg, pad_to=64
    )
    engine = SpecEngine(
        tcfg, dcfg, t_params, d_params, max_new_tokens=16,
        block_size=8, prompt_cap=32, prompt_bucket=16,
    )
    prompt = np.random.default_rng(2).integers(0, tcfg.vocab_size - 2, size=(1, 5))
    spec = engine.generate(prompt, temperature=0.0)
    ar = engine.ar_generate(prompt, temperature=0.0)
    np.testing.assert_array_equal(spec.output_ids, ar.output_ids)


def test_init_params_quantized_moe_shapes():
    """Direct-int8 init (for geometries whose bf16 form exceeds HBM) must
    produce the same pytree structure as quantize(init(...)) for MoE."""
    from dflash_tpu.quant.quantize import init_params_quantized

    tcfg = _tiny_moe_cfg()
    p = init_params_quantized(jax.random.PRNGKey(0), tcfg, pad_to=64)
    E, Im = tcfg.num_experts, tcfg.moe_intermediate_size
    L, H = tcfg.num_hidden_layers, tcfg.hidden_size
    assert p["layers"]["gate"].q.shape == (L, E, H, Im)
    assert p["layers"]["up"].scale.shape == (L, E, 1, Im)
    assert p["layers"]["down"].q.shape == (L, E, Im, H)
    assert p["layers"]["router"].shape == (L, H, E)
    # and it must actually run
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 3, H)), jnp.bfloat16)
    from dflash_tpu.models.qwen3 import _moe_mlp

    def _layer0(a):
        if isinstance(a, QTensor):
            return QTensor(a.q[0], a.scale[0], a.n)
        return a[0]

    lp = jax.tree.map(_layer0, p["layers"], is_leaf=lambda a: isinstance(a, QTensor))
    out = _moe_mlp(lp, tcfg, x)
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_w8a8_linear_close_to_dense():
    """int8-activation matmul stays within quant error of the dense result."""
    from dflash_tpu.ops import linear as linmod

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    dense = np.asarray(linear(x, w))
    linmod.set_w8a8(True)
    try:
        jax.clear_caches()
        q = np.asarray(linear(x, quantize_weight(w)))
    finally:
        linmod.set_w8a8(False)
        jax.clear_caches()
    rel = np.abs(dense - q) / (np.abs(dense).max() + 1e-9)
    assert rel.max() < 0.03


def test_spec_equals_ar_with_w8a8():
    """Self-parity oracle: spec == AR when BOTH run the W8A8 path (activation
    quant perturbs logits identically for draft/verify, so the cumprod accept
    rule still reduces to AR at temperature 0)."""
    from dflash_tpu.ops import linear as linmod

    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=8, num_layers=2)
    t_params = quantize_target_params(
        qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32), tcfg, pad_to=64
    )
    d_params = quantize_draft_params(
        dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32), dcfg, pad_to=64
    )
    linmod.set_w8a8(True)
    try:
        jax.clear_caches()
        engine = SpecEngine(
            tcfg, dcfg, t_params, d_params, max_new_tokens=16,
            block_size=8, prompt_cap=32, prompt_bucket=16,
        )
        prompt = np.random.default_rng(2).integers(0, tcfg.vocab_size - 2, size=(1, 5))
        spec = engine.generate(prompt, temperature=0.0)
        ar = engine.ar_generate(prompt, temperature=0.0)
    finally:
        linmod.set_w8a8(False)
        jax.clear_caches()
    np.testing.assert_array_equal(spec.output_ids, ar.output_ids)


def test_pallas_matmul_int8_matches_reference():
    """Kernel numerics vs the XLA dequant einsum (runs in interpret mode on CPU)."""
    from dflash_tpu.kernels.matmul_q import _kernel
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    S, K, N, bn = 16, 512, 512, 256
    x = jnp.asarray(rng.normal(size=(S, K)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.integers(-127, 127, size=(K, N)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, size=(1, N)).astype(np.float32))

    out = pl.pallas_call(
        _kernel,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((S, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, bn), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, N), jnp.float32),
        interpret=True,
    )(x, w, scale)

    # Kernel math: f32-accumulate x @ int8-as-bf16, then per-channel scale.
    expect = (
        jnp.einsum(
            "sk,kn->sn", x, w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5, atol=1e-4)
    # And it stays close to the ideal dequantized matmul.
    ideal = jnp.einsum(
        "sk,kn->sn", x.astype(jnp.float32), w.astype(jnp.float32) * scale
    )
    err = np.abs(np.asarray(out) - np.asarray(ideal)) / (np.abs(np.asarray(ideal)).max() + 1e-9)
    assert err.max() < 0.02
