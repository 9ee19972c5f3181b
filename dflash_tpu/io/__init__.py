from dflash_tpu.io.native_loader import NativeSafetensors, load_file

__all__ = ["NativeSafetensors", "load_file"]
