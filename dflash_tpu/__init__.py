"""dflash_tpu — TPU-native block-diffusion speculative decoding engine.

A from-scratch JAX/XLA/Pallas implementation of DFlash-style speculative
decoding (reference: AtharvRN/dflash): a lightweight non-causal "draft"
transformer unmasks a whole block of future tokens in one forward pass,
conditioned on mid-layer hidden states of a frozen autoregressive target
model; the target verifies the block in one forward; the longest matching
prefix is committed and both KV caches roll back to the accepted frontier.

Unlike the reference (PyTorch + DynamicCache + per-cycle host syncs,
benchmark.py:39-41,163), the whole draft->verify->accept cycle here runs
on-device inside a single jitted ``lax.while_loop`` with preallocated
fixed-shape KV caches whose "crop" is an O(1) length-frontier update.
"""

from dflash_tpu.core.config import ModelConfig, DraftConfig, build_target_layer_ids
from dflash_tpu.spec import SpecEngine, GenerationResult, spec_generate

__all__ = [
    "ModelConfig",
    "DraftConfig",
    "build_target_layer_ids",
    "SpecEngine",
    "GenerationResult",
    "spec_generate",
]

__version__ = "0.1.0"
