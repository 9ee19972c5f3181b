"""Ahead-of-time compilation of full-scale sharded decode executables.

Models too big for the local chip (the full Qwen3-Coder-30B-A3B is ~29 GB of
int8 experts vs 16 GB HBM) can still have their COMPLETE multi-chip program
partitioned and compiled: parameters enter as ``ShapeDtypeStruct``s carrying
``NamedSharding``s, so no weight bytes exist anywhere, yet GSPMD runs the
same partitioning a real dp×ep×tp slice would execute.  Used by
``__graft_entry__.dryrun_multichip`` and ``tests/test_full_scale.py`` to pin
config plumbing, sharding rules, QTensor scan-stacking and every collective
the shardings imply — at the real geometry.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dflash_tpu.core.config import ModelConfig, dflash_draft_config
from dflash_tpu.ops.linear import QTensor
from dflash_tpu.parallel.mesh import draft_param_shardings, target_param_shardings
from dflash_tpu.spec.batched import batched_cycles, batched_prefill, state_shardings


def abstract_sharded_params(init_fn, shardings):
    """``eval_shape`` the param init, then attach NamedShardings — QTensor
    nodes take ONE sharding leaf for (q, scale), with size-1 scale axes
    reverting to replicated, exactly like ``parallel.mesh.shard_params``."""
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


def compile_full_scale_cycle(tcfg: ModelConfig, mesh, dp: int, kv_quant: bool,
                             prompt_pad: int = 128, total_len: int = 512,
                             max_cycles: int = 64):
    """AOT-compile one batched spec-decode cycle of the full ``tcfg`` geometry
    (int8 weights) under ``mesh``.  Returns (dcfg, prefill state shapes,
    compiled executable)."""
    from dflash_tpu.models import dflash_draft
    from dflash_tpu.quant import quantize_draft_params
    from dflash_tpu.quant.quantize import init_params_quantized

    dcfg = dflash_draft_config(tcfg, num_draft_layers=1, block_size=16)
    t_sds = abstract_sharded_params(
        lambda: init_params_quantized(jax.random.PRNGKey(0), tcfg),
        target_param_shardings(tcfg, mesh),
    )
    d_sds = abstract_sharded_params(
        lambda: quantize_draft_params(
            dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.bfloat16),
            dcfg,
        ),
        draft_param_shardings(dcfg, mesh),
    )

    R = dp
    prefill = partial(
        batched_prefill, tcfg=tcfg, dcfg=dcfg, total_len=total_len,
        max_cycles=max_cycles, kv_quant=kv_quant,
    )
    ids = jax.ShapeDtypeStruct((R, 1, prompt_pad), jnp.int32)
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
    compiled = jax.jit(cycle).lower(state_sds, t_sds, d_sds, temps, maxl).compile()
    return dcfg, state_shapes, compiled
