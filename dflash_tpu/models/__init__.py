from dflash_tpu.models import qwen3, dflash_draft

__all__ = ["qwen3", "dflash_draft"]
