"""Ring attention: sequence-parallel causal prefill over the device mesh.

The reference has no long-context parallelism at all (SURVEY §5: sequence
length is handled by a growable cache + max-token caps; the SGLang env flag
only lifts a config cap).  On TPU the natural long-context design is
sequence-dim sharding of *prefill* attention: each device holds a contiguous
shard of the prompt's Q/K/V rows, and K/V shards rotate around the ring via
``lax.ppermute`` over ICI while every device folds each visiting block into a
running flash-softmax accumulator.  Decode blocks are tiny (B<=32), so ring
parallelism is scoped to prefill only — exactly the scoping recommended by
the survey (§2.3 item 5).

Causality is enforced with *global* positions: device i's queries cover rows
[i*S_loc, (i+1)*S_loc) and a visiting K/V block from source device s covers
[s*S_loc, (s+1)*S_loc); a query attends a key iff q_pos >= k_pos.  Blocks that
are entirely in the future contribute nothing (their scores mask to -inf) but
still ride the ring so every device does the same number of steps — uniform
SPMD control flow, no data-dependent shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30


def _ring_local(q, k, v, *, scale: float, axis: str, n_shards: int):
    """Per-device body (runs under shard_map).

    q: [B, S_loc, nh, d], k/v: [B, S_loc, n_kv, d] — this device's shard.
    Returns [B, S_loc, nh*d] in q.dtype.
    """
    B, S, nh, d = q.shape
    n_kv = k.shape[2]
    g = nh // n_kv
    i = jax.lax.axis_index(axis)

    qg = q.reshape(B, S, n_kv, g, d).astype(jnp.float32)
    q_pos = i * S + jnp.arange(S, dtype=jnp.int32)  # [S]

    acc0 = jnp.zeros((B, n_kv, g, S, d), jnp.float32)
    m0 = jnp.full((B, n_kv, g, S, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((B, n_kv, g, S, 1), jnp.float32)
    perm = [(p, (p + 1) % n_shards) for p in range(n_shards)]

    def step(j, carry):
        k_cur, v_cur, m, l, acc = carry
        src = (i - j) % n_shards
        k_pos = src * S + jnp.arange(S, dtype=jnp.int32)  # [S]
        s = jnp.einsum(
            "bqkgd,bskd->bkgqs", qg, k_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * scale
        causal = q_pos[:, None] >= k_pos[None, :]  # [Sq, Sk]
        s = jnp.where(causal[None, None, None], s, _NEG)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bkgqs,bskd->bkgqd", p, v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        # Rotate the K/V block to the next device; after j steps device i
        # holds the block originally produced on device (i - j) % n.
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return k_nxt, v_nxt, m_new, l_new, acc_new

    _, _, m, l, acc = jax.lax.fori_loop(0, n_shards, step, (k, v, m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)  # [B, n_kv, g, S, d]
    out = jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(B, S, nh * d)
    return out.astype(q.dtype)


def ring_prefill_attention(
    q: jax.Array,  # [B, S, nh, d] — S divisible by mesh.shape[axis]
    k: jax.Array,  # [B, S, n_kv, d]
    v: jax.Array,
    scale: float,
    mesh: Mesh,
    axis: str = "sp",
) -> jax.Array:
    """Causal GQA prefill attention, sequence-sharded over ``axis``.

    Semantically identical to ``ops.attention.gqa_attention`` with a causal
    [S, S] mask; the sequence axis is sharded across the mesh and K/V blocks
    rotate over ICI (one ppermute per ring step, overlapped with the block's
    attention math by XLA's async collectives).
    """
    n = mesh.shape[axis]
    if q.shape[1] % n != 0:
        raise ValueError(f"seq len {q.shape[1]} not divisible by {axis}={n}")
    spec_q = P(None, axis, None, None)
    fn = jax.shard_map(
        partial(_ring_local, scale=scale, axis=axis, n_shards=n),
        mesh=mesh,
        in_specs=(spec_q, spec_q, spec_q),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    return fn(q, k, v)
