"""One-call user API mirroring the reference's shipped entry point.

The reference exposes ``DFlashDraftModel.spec_generate(target, input_ids,
max_new_tokens, stop_token_ids, temperature)`` as the canonical Transformers
path (reference model/dflash.py:192-277, README.md:74-109).  Here the same
call shape is a module-level function over the functional param pytrees; it
builds a transient :class:`SpecEngine` (jit-compiled executables are cached
process-wide by shape, so repeated calls with the same geometry reuse them).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from dflash_tpu.core.config import DraftConfig, ModelConfig
from dflash_tpu.spec.engine import GenerationResult, SpecEngine, _round_up


def spec_generate(
    t_params,
    d_params,
    tcfg: ModelConfig,
    dcfg: DraftConfig,
    input_ids: np.ndarray,
    max_new_tokens: int,
    stop_token_ids: Sequence[int] = (),
    temperature: float = 0.0,
    *,
    block_size: Optional[int] = None,
    seed: int = 0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> GenerationResult:
    """Speculative generation for one prompt (reference spec_generate parity).

    ``block_size`` defaults to the checkpoint-carried ``dcfg.block_size``
    (reference model/dflash.py:157-163 reads it from ``dflash_config``).
    """
    input_ids = np.asarray(input_ids)
    if input_ids.ndim == 1:
        input_ids = input_ids[None, :]
    prompt_cap = _round_up(max(input_ids.shape[1], 1), 128)
    engine = SpecEngine(
        tcfg, dcfg, t_params, d_params,
        max_new_tokens=max_new_tokens,
        block_size=block_size,
        prompt_cap=prompt_cap,
        prompt_bucket=128,
        stop_token_ids=stop_token_ids,
    )
    return engine.generate(
        input_ids, temperature=temperature, seed=seed, top_k=top_k, top_p=top_p
    )
