"""Token sampling + the speculative acceptance rule, fully on-device.

Semantics match reference model/utils.py:27-34 (temperature < 1e-5 => argmax,
else softmax(logits/T) + multinomial) and the cumprod longest-prefix-match
acceptance of reference benchmark.py:162-165.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GREEDY_TEMP_EPS = 1e-5


def sample(logits: jax.Array, temperature: float | jax.Array, key: jax.Array) -> jax.Array:
    """Sample token ids from ``logits`` [..., V].

    ``temperature`` may be a traced scalar; greedy and sampled branches are
    both computed and selected (cheap relative to the logits matmul).
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)
    temp = jnp.maximum(jnp.asarray(temperature, jnp.float32), GREEDY_TEMP_EPS)
    sampled = jax.random.categorical(key, logits / temp, axis=-1)
    return jnp.where(jnp.asarray(temperature) < GREEDY_TEMP_EPS, greedy, sampled).astype(jnp.int32)


# Default static candidate-pool size for filtered sampling: top-k/top-p are
# resolved within the top-``pool`` logits (one EXACT approx_max_k partial
# reduce over the vocab — recall_target=1.0 runs the TPU PartialReduce with
# enough passes to be exact WITHOUT a full-vocab sort; exact lax.top_k was
# measured 3.2x slower end-to-end at 16 lanes, docs/RESULTS.md).  SEMANTICS:
# top_k <= pool is EXACT (the pool provably contains the true top-pool set,
# and the nucleus mass is normalized over the FULL vocab); requests with
# top_k > pool are rejected at the serving layer — no silent clamp.  The one
# residual approximation is top-p whose true nucleus extends past the pool
# (pool true-mass < p at high temperature): the nucleus truncates at the
# pool.  Deployments needing fatter tails configure a wider pool
# (EngineConfig.topk_pool / SpecEngine(topk_pool=...)): one executable per
# pool size, exact for any top_k <= pool.
TOPK_POOL = 64


def filtered_logits_topk_topp(
    logits: jax.Array,  # [..., V] float32
    temp: jax.Array,  # scalar, >= GREEDY_TEMP_EPS
    top_k: jax.Array,
    top_p: jax.Array,
    pool: int,
) -> jax.Array:
    """Full-vocab logits with everything outside the joint top-k/top-p keep
    set masked to -inf — the exact filter a full-sort sampler applies, built
    from one exact partial-reduce + pool-sized math + one scatter.

    Keep rule (HF/SGLang convention, reference benchmark_sglang.py:42-47):
    rank < top_k AND cumulative probability BEFORE the token < top_p, ranks
    and cumulative mass taken over the descending full-vocab distribution
    (top-p mass normalized over the FULL softmax, not the pool's).
    """
    V = logits.shape[-1]
    pool = min(pool, V)
    scaled = logits / temp
    # exact top-pool: recall_target=1.0 lowers to a PartialReduce with exact
    # semantics — still no full sort
    cand_vals, cand_idx = jax.lax.approx_max_k(scaled, pool, recall_target=1.0)
    order = jnp.argsort(-cand_vals, axis=-1)
    vals = jnp.take_along_axis(cand_vals, order, axis=-1)  # [..., pool] desc
    idxs = jnp.take_along_axis(cand_idx, order, axis=-1)
    k = jnp.asarray(top_k, jnp.int32)
    k_eff = jnp.where(k <= 0, pool, jnp.minimum(k, pool))
    p = jnp.asarray(top_p, jnp.float32)
    pos = jnp.arange(pool, dtype=jnp.int32)
    # true probabilities: normalize over the FULL vocab so the nucleus is
    # the reference's (a pool-local softmax would over-keep: its cumsum
    # reaches 1.0 inside the pool even when real mass lies outside)
    z = jax.scipy.special.logsumexp(scaled, axis=-1, keepdims=True)
    probs = jnp.exp(vals - z)
    # keep a token if the cumulative mass BEFORE it is < p (the first token
    # always survives); combined with the top-k prefix mask
    cum_before = jnp.cumsum(probs, axis=-1) - probs
    keep = (pos < k_eff) & (cum_before < p)
    masked = jnp.full_like(scaled, -jnp.inf)
    return jnp.put_along_axis(
        masked, idxs, jnp.where(keep, vals, -jnp.inf), axis=-1, inplace=False
    )


def sample_topk_topp(
    logits: jax.Array,
    temperature: float | jax.Array,
    key: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
    pool: int = TOPK_POOL,
) -> jax.Array:
    """``sample`` with per-call traced top-k / top-p filtering.

    Serving-parity sampler (the reference's SGLang client sends
    ``sampling_params = {temperature, top_p, top_k}`` per request, reference
    benchmark_sglang.py:42-47); filters follow the HF/SGLang convention:
    temperature scaling first, then top-k (keep the k highest logits;
    ``top_k <= 0`` disables), then top-p (keep the smallest prefix of the
    descending distribution with cumulative probability >= ``top_p``;
    ``top_p >= 1`` disables), then categorical sampling over the masked
    FULL-VOCAB logits.  ``temperature`` below the greedy epsilon returns
    argmax regardless of filters.  When both filters are no-ops the result
    matches unfiltered :func:`sample` bit-for-bit; when active, the sample is
    bit-identical to a full-sort sampler applying the same keep rule (same
    key, same categorical over the same masked logits) for any
    ``top_k <= pool`` — see tests/test_sampling_filters.py.
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)
    temp = jnp.maximum(jnp.asarray(temperature, jnp.float32), GREEDY_TEMP_EPS)
    k = jnp.asarray(top_k, jnp.int32)
    p = jnp.asarray(top_p, jnp.float32)
    active = ((k > 0) & (k < logits.shape[-1])) | (p < 1.0)
    masked = filtered_logits_topk_topp(logits, temp, k, p, pool)
    final = jnp.where(active, masked, logits / temp)
    out = jax.random.categorical(key, final, axis=-1)
    return jnp.where(
        jnp.asarray(temperature) < GREEDY_TEMP_EPS, greedy, out
    ).astype(jnp.int32)


def acceptance_length(draft_tokens: jax.Array, posterior: jax.Array) -> jax.Array:
    """Longest accepted prefix length.

    ``draft_tokens`` [B, S-1] are the drafted tokens for block positions
    1..S-1; ``posterior`` [B, S] are the target's (greedy/sampled) tokens for
    all S block positions.  Returns [B] int32: the number of draft tokens
    matching ``posterior[:-1]`` as a prefix (reference benchmark.py:163):
    ``(draft == posterior[:, :-1]).cumprod(axis=1).sum(axis=1)``.
    """
    matches = (draft_tokens == posterior[..., :-1]).astype(jnp.int32)
    return jnp.cumprod(matches, axis=-1).sum(axis=-1)
