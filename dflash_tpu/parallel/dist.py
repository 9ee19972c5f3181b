"""Multi-process (multi-host) harness utilities.

TPU-native replacement for reference distributed.py (NCCL object
gather/barrier shim): JAX multi-controller runtime via
``jax.distributed.initialize`` plus host-level object collectives built on
``multihost_utils.process_allgather``.  Like the reference (distributed.py:
18-21), everything no-ops gracefully in a single-process run, which is what
lets every benchmark run without a cluster.

Env contract (set by the launcher): ``JAX_COORDINATOR_ADDRESS``,
``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID`` — the TPU-pod equivalent of
torchrun's RANK/WORLD_SIZE (reference run_benchmark.sh:121-124).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, List, Optional

import numpy as np

_initialized = False


def init() -> None:
    """Initialize the multi-controller runtime if launch env vars are set."""
    global _initialized
    if _initialized:
        return
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if addr and nproc and pid:
        import jax

        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    _initialized = True


def size() -> int:
    import jax

    return jax.process_count()


def rank() -> int:
    import jax

    return jax.process_index()


def is_main() -> bool:
    return rank() == 0


def barrier(name: str = "barrier") -> None:
    if size() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def all_gather_object(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process.

    Replaces the reference's NCCL ``all_gather_object``
    (distributed.py:78-83).  Two phases: an int64 size exchange, then one
    allgather of buffers padded to the global max size — no fixed cap (a
    hard limit would lose an hours-long run's results at the final reporting
    gather), and small objects move only max-size bytes, not a 16 MB slab.
    """
    if size() <= 1:
        return [obj]
    from jax.experimental import multihost_utils

    blob = pickle.dumps(obj)
    sizes = np.asarray(
        multihost_utils.process_allgather(np.asarray([len(blob)], np.int64))
    ).reshape(-1)
    cap = int(sizes.max())
    buf = np.zeros((max(cap, 1),), np.uint8)
    buf[: len(blob)] = np.frombuffer(blob, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))  # [P, cap]
    return [
        pickle.loads(gathered[p, : int(sizes[p])].tobytes())
        for p in range(sizes.shape[0])
    ]


def gather_object(obj: Any, dst: int = 0) -> Optional[List[Any]]:
    """Gather to one process (others get None), reference distributed.py:66-75."""
    gathered = all_gather_object(obj)
    return gathered if rank() == dst else None
