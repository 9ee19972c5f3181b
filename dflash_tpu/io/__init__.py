from dflash_tpu.io.checkpoint import cached_params, load_params, save_params
from dflash_tpu.io.native_loader import NativeSafetensors, load_file

__all__ = [
    "NativeSafetensors",
    "load_file",
    "cached_params",
    "load_params",
    "save_params",
]
