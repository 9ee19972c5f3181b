from dflash_tpu.spec.api import spec_generate
from dflash_tpu.spec.engine import SpecEngine, GenerationResult

__all__ = ["SpecEngine", "GenerationResult", "spec_generate"]
