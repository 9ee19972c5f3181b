"""Multi-device sharding tests on the virtual 8-CPU mesh: tp-sharded params,
dp-sharded batched requests, MoE expert sharding, and parity vs single-device."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.models import dflash_draft, qwen3
from dflash_tpu.parallel.mesh import (
    draft_param_shardings,
    make_mesh,
    shard_params,
    target_param_shardings,
)
from dflash_tpu.spec.batched import jit_batched_cycle, jit_batched_decode, jit_batched_prefill

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(tp, tcfg=None):
    tcfg = tcfg or tiny_target_config(
        num_attention_heads=2 * tp, num_key_value_heads=tp, head_dim=16,
        hidden_size=32 * tp,
    )
    dcfg = tiny_draft_config(tcfg, block_size=4, num_layers=1)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32)
    return tcfg, dcfg, t_params, d_params


def _run_batched(mesh, tcfg, dcfg, t_params, d_params, R, shard=True):
    if shard and mesh is not None:
        t_params = shard_params(t_params, target_param_shardings(tcfg, mesh))
        d_params = shard_params(d_params, draft_param_shardings(dcfg, mesh))
    rng = np.random.default_rng(0)
    P_pad, total_len, max_cycles = 16, 48, 8
    input_ids = jnp.asarray(rng.integers(1, tcfg.vocab_size - 2, size=(R, 1, P_pad)), jnp.int32)
    prompt_lens = jnp.asarray([5 + 2 * r for r in range(R)], jnp.int32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(R, dtype=jnp.uint32))
    temp = jnp.float32(0.0)
    state = jit_batched_prefill(
        t_params, d_params, input_ids, prompt_lens, temp, keys,
        tcfg=tcfg, dcfg=dcfg, total_len=total_len, max_cycles=max_cycles,
    )
    if shard and mesh is not None:
        from dflash_tpu.spec.batched import shard_state

        state = shard_state(state, mesh)
    max_lengths = prompt_lens + 12
    state = jit_batched_decode(
        t_params, d_params, state, max_lengths, temp,
        tcfg=tcfg, dcfg=dcfg, block_size=dcfg.block_size,
        stop_token_ids=(), max_cycles=max_cycles,
    )
    return jax.tree.map(np.asarray, state), prompt_lens


def test_tp_sharded_decode_matches_replicated():
    tp = 4
    mesh = make_mesh(dp=2, tp=tp)
    tcfg, dcfg, t_params, d_params = _setup(tp)
    sharded, plens = _run_batched(mesh, tcfg, dcfg, t_params, d_params, R=2, shard=True)
    plain, _ = _run_batched(None, tcfg, dcfg, t_params, d_params, R=2, shard=False)
    np.testing.assert_array_equal(sharded.output_ids, plain.output_ids)
    np.testing.assert_array_equal(sharded.start, plain.start)


def test_tp_sharded_decode_with_filters_matches_replicated():
    """Per-lane top-k/top-p filters under dp x tp GSPMD partitioning: the
    sharded filtered decode must be token-identical to the replicated one
    (approx_max_k + the filter masks must partition cleanly)."""
    from dflash_tpu.spec.engine import SamplingFilters

    tp = 4
    mesh = make_mesh(dp=2, tp=tp)
    tcfg, dcfg, t_params, d_params = _setup(tp)
    rng = np.random.default_rng(0)
    R, P_pad, total_len, max_cycles = 2, 16, 48, 8
    input_ids = jnp.asarray(
        rng.integers(1, tcfg.vocab_size - 2, size=(R, 1, P_pad)), jnp.int32
    )
    prompt_lens = jnp.asarray([5, 7], jnp.int32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(R, dtype=jnp.uint32))
    temp = jnp.full((R,), 1.1, jnp.float32)
    filters = SamplingFilters(
        top_k=jnp.asarray([3, 0], jnp.int32),
        top_p=jnp.asarray([1.0, 0.8], jnp.float32),
    )

    def run(shard):
        tp_, dp_ = t_params, d_params
        if shard:
            tp_ = shard_params(t_params, target_param_shardings(tcfg, mesh))
            dp_ = shard_params(d_params, draft_param_shardings(dcfg, mesh))
        st = jit_batched_prefill(
            tp_, dp_, input_ids, prompt_lens, jnp.float32(1.1), keys,
            tcfg=tcfg, dcfg=dcfg, total_len=total_len, max_cycles=max_cycles,
        )
        if shard:
            from dflash_tpu.spec.batched import shard_state

            st = shard_state(st, mesh)
        st = jit_batched_decode(
            tp_, dp_, st, prompt_lens + 12, temp,
            tcfg=tcfg, dcfg=dcfg, block_size=dcfg.block_size,
            stop_token_ids=(), max_cycles=max_cycles, filters=filters,
        )
        return np.asarray(st.output_ids), np.asarray(st.start)

    out_s, start_s = run(True)
    out_r, start_r = run(False)
    np.testing.assert_array_equal(out_s, out_r)
    np.testing.assert_array_equal(start_s, start_r)
    assert (start_s > np.asarray(prompt_lens)).all()


def test_batched_requests_decode_independently():
    """Lanes of a dp batch must not leak into each other: two lanes given the
    same prompt decode identically; a lane with a different prompt differs.

    (Exact equality against the *single-request* path is not asserted — a
    vmapped graph reduces in a different order, which can flip argmax on
    near-ties with random weights; identical-lane equality is the airtight
    independence invariant.)"""
    tp = 2
    tcfg, dcfg, t_params, d_params = _setup(tp)

    rng = np.random.default_rng(0)
    P_pad, total_len, max_cycles = 16, 48, 8
    base = rng.integers(1, tcfg.vocab_size - 2, size=(1, P_pad))
    other = rng.integers(1, tcfg.vocab_size - 2, size=(1, P_pad))
    input_ids = jnp.asarray(np.stack([base, other, base]), jnp.int32)  # [3,1,P]
    prompt_lens = jnp.asarray([7, 7, 7], jnp.int32)
    keys = jnp.stack([jax.random.PRNGKey(0)] * 3)
    temp = jnp.float32(0.0)
    state = jit_batched_prefill(
        t_params, d_params, input_ids, prompt_lens, temp, keys,
        tcfg=tcfg, dcfg=dcfg, total_len=total_len, max_cycles=max_cycles,
    )
    state = jit_batched_decode(
        t_params, d_params, state, prompt_lens + 12, temp,
        tcfg=tcfg, dcfg=dcfg, block_size=dcfg.block_size,
        stop_token_ids=(), max_cycles=max_cycles,
    )
    out = np.asarray(state.output_ids)
    np.testing.assert_array_equal(out[0], out[2])  # identical lanes agree
    assert not np.array_equal(out[0], out[1])  # different prompts differ
    assert (np.asarray(state.start) > 7).all()


def test_moe_expert_sharded_decode_runs():
    tp = 4
    mesh = make_mesh(dp=2, tp=tp)
    base = tiny_target_config(
        num_attention_heads=2 * tp, num_key_value_heads=tp, head_dim=16,
        hidden_size=32 * tp,
    )
    tcfg = dataclasses.replace(
        base, num_experts=2 * tp, num_experts_per_tok=2, moe_intermediate_size=32
    )
    dcfg = tiny_draft_config(tcfg, block_size=4, num_layers=1)
    dcfg = dataclasses.replace(
        dcfg,
        model=dataclasses.replace(
            dcfg.model, num_experts=0, num_experts_per_tok=0, moe_intermediate_size=0
        ),
    )
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32)
    sharded, plens = _run_batched(mesh, tcfg, dcfg, t_params, d_params, R=2, shard=True)
    plain, _ = _run_batched(None, tcfg, dcfg, t_params, d_params, R=2, shard=False)
    np.testing.assert_array_equal(sharded.output_ids, plain.output_ids)
    assert (sharded.start > np.asarray(plens)).all()


def test_moe_ep_dispatch_matches_gather():
    """Expert-parallel shard_map dispatch (experts over ep x tp) must equal
    the single-device gather dispatch numerically, and full spec decode with
    an EP mesh must match the unsharded engine token-for-token."""
    from dflash_tpu.spec import SpecEngine

    tp, ep = 2, 2
    tcfg = tiny_target_config(
        num_attention_heads=2 * tp, num_key_value_heads=tp, head_dim=16,
        hidden_size=32 * tp, num_experts=8, num_experts_per_tok=2,
        moe_intermediate_size=32,
    )
    dcfg = tiny_draft_config(tcfg, block_size=4, num_layers=1)
    dcfg = dataclasses.replace(
        dcfg,
        model=dataclasses.replace(
            dcfg.model, num_experts=0, num_experts_per_tok=0, moe_intermediate_size=0
        ),
    )
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32)
    mesh = make_mesh(dp=1, tp=tp, ep=ep)
    t_sh = shard_params(t_params, target_param_shardings(tcfg, mesh))
    d_sh = shard_params(d_params, draft_param_shardings(dcfg, mesh))

    prompt = np.asarray(
        jax.random.randint(jax.random.PRNGKey(7), (1, 9), 1, tcfg.vocab_size - 2)
    )
    common = dict(max_new_tokens=12, prompt_cap=16, prompt_bucket=16, stop_token_ids=())
    ref = SpecEngine(tcfg, dcfg, t_params, d_params, **common).generate(
        prompt, temperature=0.0
    )
    got = SpecEngine(tcfg, dcfg, t_sh, d_sh, mesh=mesh, **common).generate(
        prompt, temperature=0.0
    )
    np.testing.assert_array_equal(
        np.asarray(got.output_ids), np.asarray(ref.output_ids)
    )


def test_moe_ep_dispatch_matches_gather_int8():
    """Quantized (int8) expert banks under expert-parallel sharding: the EP
    shard_map dispatch over int8 experts must match the single-device int8
    gather dispatch token-for-token through a full spec decode — the
    quantized-expert counterpart of the bf16 invariant above (the serving
    configuration of the reference's Qwen3-Coder-30B-A3B, README.md:60-68)."""
    from dflash_tpu.quant import quantize_draft_params, quantize_target_params
    from dflash_tpu.spec import SpecEngine

    tp, ep = 2, 2
    tcfg = tiny_target_config(
        num_attention_heads=2 * tp, num_key_value_heads=tp, head_dim=16,
        hidden_size=32 * tp, num_experts=8, num_experts_per_tok=2,
        moe_intermediate_size=32,
    )
    dcfg = tiny_draft_config(tcfg, block_size=4, num_layers=1)
    dcfg = dataclasses.replace(
        dcfg,
        model=dataclasses.replace(
            dcfg.model, num_experts=0, num_experts_per_tok=0, moe_intermediate_size=0
        ),
    )
    t_params = quantize_target_params(
        qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32), tcfg, pad_to=16
    )
    d_params = quantize_draft_params(
        dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32), dcfg, pad_to=16
    )
    mesh = make_mesh(dp=1, tp=tp, ep=ep)
    t_sh = shard_params(t_params, target_param_shardings(tcfg, mesh))
    d_sh = shard_params(d_params, draft_param_shardings(dcfg, mesh))
    gate = t_sh["layers"]["gate"]
    assert gate.q.dtype == jnp.int8  # experts really are int8 on the mesh

    prompt = np.asarray(
        jax.random.randint(jax.random.PRNGKey(7), (1, 9), 1, tcfg.vocab_size - 2)
    )
    common = dict(max_new_tokens=12, prompt_cap=16, prompt_bucket=16, stop_token_ids=())
    ref = SpecEngine(tcfg, dcfg, t_params, d_params, **common).generate(
        prompt, temperature=0.0
    )
    got = SpecEngine(tcfg, dcfg, t_sh, d_sh, mesh=mesh, **common).generate(
        prompt, temperature=0.0
    )
    np.testing.assert_array_equal(
        np.asarray(got.output_ids), np.asarray(ref.output_ids)
    )
