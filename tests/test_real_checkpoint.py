"""Real-checkpoint readiness (opt-in, env-gated).

No trained DFlash checkpoint is reachable in this environment (zero egress),
so every measured tau here is emulated.  The day checkpoints ARE available,
this test is the one command that proves end-to-end parity with the
reference quick-start path (reference README.md:74-109): point the env vars
at local ``Qwen3-*`` target / ``Qwen3-*-DFlash-b16`` draft checkpoint dirs
and it loads them through the real loader, decodes 3 math500 prompts, and
asserts the measured tau lands in the reference band.

    DFLASH_TARGET_CHECKPOINT=/path/to/Qwen3-4B \
    DFLASH_DRAFT_CHECKPOINT=/path/to/Qwen3-4B-DFlash-b16 \
    python -m pytest tests/test_real_checkpoint.py -x -q
"""

import os
from pathlib import Path

import numpy as np
import pytest

TARGET_DIR = os.environ.get("DFLASH_TARGET_CHECKPOINT")
DRAFT_DIR = os.environ.get("DFLASH_DRAFT_CHECKPOINT")

pytestmark = pytest.mark.skipif(
    not (
        TARGET_DIR and DRAFT_DIR
        and Path(TARGET_DIR, "config.json").exists()
        and Path(DRAFT_DIR, "config.json").exists()
    ),
    reason="set DFLASH_TARGET_CHECKPOINT / DFLASH_DRAFT_CHECKPOINT to local "
    "checkpoint dirs to run the real-checkpoint readiness test",
)


def test_real_checkpoint_tau_in_reference_band():
    import jax
    import jax.numpy as jnp

    from dflash_tpu.bench.tokenizer import resolve_tokenizer
    from dflash_tpu.core.config import draft_config_from_hf, model_config_from_hf
    from dflash_tpu.data import load_and_process_dataset
    from dflash_tpu.models.loader import load_draft_params, load_target_params
    from dflash_tpu.spec.engine import SpecEngine

    tcfg = model_config_from_hf(TARGET_DIR)
    dcfg = draft_config_from_hf(DRAFT_DIR)
    t_params = load_target_params(TARGET_DIR, tcfg, jnp.bfloat16)
    d_params = load_draft_params(DRAFT_DIR, dcfg, jnp.bfloat16)

    tokenizer = resolve_tokenizer(TARGET_DIR, tcfg.vocab_size)
    rows = load_and_process_dataset("math500")[:3]
    assert rows, "math500 rows unavailable"

    engine = SpecEngine(
        tcfg, dcfg, t_params, d_params,
        max_new_tokens=512, block_size=dcfg.block_size, prompt_cap=1024,
        stop_token_ids=(tokenizer.eos_token_id,)
        if tokenizer.eos_token_id is not None else (),
    )
    taus = []
    for row in rows:
        text = tokenizer.apply_chat_template(
            [{"role": "user", "content": row["turns"][0]}],
            tokenize=False, add_generation_prompt=True,
        )
        ids = np.asarray(tokenizer.encode(text))[None, :1024]
        res = engine.generate(ids, temperature=0.0)
        assert res.num_output_tokens > 0
        taus.extend(res.acceptance_lengths)
    mean_tau = float(np.mean(taus))
    # Reference tau at B=16 greedy on math/AIME-class data: 7.3-7.9
    # (reference results.md:362-363); the band below allows prompt noise.
    assert 6.5 <= mean_tau <= 8.5, f"real-checkpoint tau {mean_tau:.2f} outside band"
