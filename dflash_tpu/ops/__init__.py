from dflash_tpu.ops.norms import rms_norm
from dflash_tpu.ops.rope import rope_cos_sin, apply_rope
from dflash_tpu.ops.attention import gqa_attention
from dflash_tpu.ops.sampling import sample, acceptance_length

__all__ = [
    "rms_norm",
    "rope_cos_sin",
    "apply_rope",
    "gqa_attention",
    "sample",
    "acceptance_length",
]
