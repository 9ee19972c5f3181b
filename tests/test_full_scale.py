"""Full-scale multi-chip compilation proofs (no weights materialized).

The real Qwen3-Coder-30B-A3B (reference README.md:60-68) and Qwen3-8B decode
executables cannot RUN here (one 16 GB chip; ~29 GB of int8 experts), but the
complete sharded program can be partitioned and compiled ahead-of-time from
``ShapeDtypeStruct`` arguments carrying ``NamedSharding``s — the same GSPMD
pipeline a real dp×ep×tp slice would use.  This pins, at the FULL 48-layer/
128-expert geometry: config plumbing, parameter sharding rules
(parallel/mesh.py), int8 QTensor scan-stacking, the batched-cycle jaxpr, and
the SPMD partitioner's acceptance of every collective the shardings imply.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.core.config import (
    QWEN3_8B,
    QWEN3_CODER_30B_A3B,
    dflash_draft_config,
)
from dflash_tpu.ops.linear import QTensor
from dflash_tpu.parallel.mesh import (
    draft_param_shardings,
    make_mesh,
    target_param_shardings,
)
from dflash_tpu.spec.batched import batched_cycles, batched_prefill, state_shardings


def _abstract_sharded_params(init_fn, shardings):
    """eval_shape the param init, then attach NamedShardings — QTensor nodes
    take one sharding leaf for (q, scale) like parallel.mesh.shard_params."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    shapes = jax.eval_shape(init_fn)

    def put(p, s):
        if isinstance(p, QTensor):
            parts = list(s.spec) + [None] * (p.scale.ndim - len(s.spec))
            sspec = P(*[
                None if p.scale.shape[i] == 1 else parts[i]
                for i in range(p.scale.ndim)
            ])
            return QTensor(
                jax.ShapeDtypeStruct(p.q.shape, p.q.dtype, sharding=s),
                jax.ShapeDtypeStruct(
                    p.scale.shape, p.scale.dtype,
                    sharding=NamedSharding(s.mesh, sspec),
                ),
                p.n,
            )
        return jax.ShapeDtypeStruct(p.shape, p.dtype, sharding=s)

    return jax.tree.map(put, shapes, shardings,
                        is_leaf=lambda x: isinstance(x, QTensor))


def _lower_and_compile(tcfg, mesh, dp: int, kv_quant: bool):
    from dflash_tpu.models import dflash_draft
    from dflash_tpu.quant import quantize_draft_params
    from dflash_tpu.quant.quantize import init_params_quantized

    dcfg = dflash_draft_config(tcfg, num_draft_layers=1, block_size=16)
    t_sds = _abstract_sharded_params(
        lambda: init_params_quantized(jax.random.PRNGKey(0), tcfg),
        target_param_shardings(tcfg, mesh),
    )
    d_sds = _abstract_sharded_params(
        lambda: quantize_draft_params(
            dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.bfloat16),
            dcfg,
        ),
        draft_param_shardings(dcfg, mesh),
    )

    R, P_pad, total_len, max_cycles = dp, 128, 512, 64
    prefill = partial(
        batched_prefill, tcfg=tcfg, dcfg=dcfg, total_len=total_len,
        max_cycles=max_cycles, kv_quant=kv_quant,
    )
    ids = jax.ShapeDtypeStruct((R, 1, P_pad), jnp.int32)
    plens = jax.ShapeDtypeStruct((R,), jnp.int32)
    temp = jax.ShapeDtypeStruct((), jnp.float32)
    keys = jax.ShapeDtypeStruct((R, 2), jnp.uint32)
    state_shapes = jax.eval_shape(prefill, t_sds, d_sds, ids, plens, temp, keys)
    state_sds = jax.tree.map(
        lambda sds, sh: jax.ShapeDtypeStruct(sds.shape, sds.dtype, sharding=sh),
        state_shapes, state_shardings(mesh)(state_shapes),
    )

    cycle = partial(
        batched_cycles, tcfg=tcfg, dcfg=dcfg, block_size=dcfg.block_size,
        stop_token_ids=(2,), n_steps=1,
    )
    temps = jax.ShapeDtypeStruct((R,), jnp.float32)
    maxl = jax.ShapeDtypeStruct((R,), jnp.int32)
    lowered = jax.jit(cycle).lower(state_sds, t_sds, d_sds, temps, maxl)
    compiled = lowered.compile()
    return dcfg, state_shapes, compiled


def test_full_30b_a3b_compiles_on_dp2_ep2_tp2():
    """The COMPLETE 48-layer / 128-expert Qwen3-Coder-30B-A3B spec cycle
    (int8 experts, int8 KV) partitions + compiles for a dp2 x ep2 x tp2 mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    tcfg = QWEN3_CODER_30B_A3B
    mesh = make_mesh(dp=2, tp=2, ep=2, devices=jax.devices()[:8])
    dcfg, state_shapes, compiled = _lower_and_compile(tcfg, mesh, dp=2, kv_quant=True)

    # the executable exists and is SPMD over all 8 devices
    assert compiled is not None
    out_sh = jax.tree.leaves(compiled.output_shardings)
    assert any(not s.is_fully_replicated for s in out_sh), \
        "expected dp/tp-sharded outputs"

    # per-device expert-bank residency: 128 experts over ep2 x tp2 must fit a
    # 16 GB v5e with room for activations (the whole point of the sharding)
    expert_bytes = (
        tcfg.num_hidden_layers
        * tcfg.num_experts
        * (3 * tcfg.hidden_size * tcfg.moe_intermediate_size)  # gate/up/down
    )  # int8 -> 1 byte/param
    per_device = expert_bytes / 4  # ep2 x tp2
    assert per_device < 12e9, f"expert shard {per_device/1e9:.1f} GB too big"


def test_full_qwen3_8b_compiles_on_dp2_tp4():
    """The full 36-layer Qwen3-8B dense cycle (int8, bf16 KV) compiles for a
    dp2 x tp4 mesh (kv heads 8 / tp4 = 2 per device)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(dp=2, tp=4, devices=jax.devices()[:8])
    _, _, compiled = _lower_and_compile(QWEN3_8B, mesh, dp=2, kv_quant=False)
    assert compiled is not None
