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


def all_gather_object(obj: Any, max_bytes: int = 1 << 24) -> List[Any]:
    """Gather an arbitrary picklable object from every process.

    Replaces the reference's NCCL ``all_gather_object``
    (distributed.py:78-83).  Objects are pickled into fixed-size uint8
    buffers and allgathered across hosts.
    """
    if size() <= 1:
        return [obj]
    from jax.experimental import multihost_utils

    blob = pickle.dumps(obj)
    if len(blob) > max_bytes - 8:
        raise ValueError(f"object too large to gather ({len(blob)} bytes)")
    buf = np.zeros((max_bytes,), np.uint8)
    buf[:8] = np.frombuffer(np.uint64(len(blob)).tobytes(), np.uint8)
    buf[8 : 8 + len(blob)] = np.frombuffer(blob, np.uint8)
    gathered = multihost_utils.process_allgather(buf)  # [P, max_bytes]
    out = []
    for row in np.asarray(gathered):
        n = int(np.frombuffer(row[:8].tobytes(), np.uint64)[0])
        out.append(pickle.loads(row[8 : 8 + n].tobytes()))
    return out


def gather_object(obj: Any, dst: int = 0) -> Optional[List[Any]]:
    """Gather to one process (others get None), reference distributed.py:66-75."""
    gathered = all_gather_object(obj)
    return gathered if rank() == dst else None
