from dflash_tpu.engine.batching import (
    BucketedEngine,
    BucketSpec,
    ContinuousBatchingEngine,
    EngineConfig,
    Request,
)
from dflash_tpu.engine.disagg import PrefillWorker

__all__ = [
    "BucketedEngine",
    "BucketSpec",
    "ContinuousBatchingEngine",
    "EngineConfig",
    "PrefillWorker",
    "Request",
]
