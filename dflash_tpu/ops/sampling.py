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
