from dflash_tpu.spec.engine import SpecEngine, GenerationResult

__all__ = ["SpecEngine", "GenerationResult"]
