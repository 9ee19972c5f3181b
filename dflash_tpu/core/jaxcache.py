"""Persistent XLA compilation cache setup shared by every entry point.

TPU compiles of the fused decode loop run minutes through a tunneled
runtime; caching them on disk makes the second process start free.  The
reference has no equivalent concern (PyTorch eager); this is the TPU-native
counterpart of its one-time CUDA-graph capture cost.
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    """Idempotently point JAX at an on-disk compilation cache."""
    import jax

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "dflash_tpu", "jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # unwritable $HOME / old jax knob names — run uncached
        pass
