from dflash_tpu.parallel.mesh import (
    make_mesh,
    target_param_shardings,
    draft_param_shardings,
    shard_params,
)

__all__ = [
    "make_mesh",
    "target_param_shardings",
    "draft_param_shardings",
    "shard_params",
]
