from dflash_tpu.core.config import ModelConfig, DraftConfig, build_target_layer_ids

__all__ = ["ModelConfig", "DraftConfig", "build_target_layer_ids"]
