from dflash_tpu.engine.batching import (
    BucketedEngine,
    BucketSpec,
    ContinuousBatchingEngine,
    EngineConfig,
    Request,
)

__all__ = [
    "BucketedEngine",
    "BucketSpec",
    "ContinuousBatchingEngine",
    "EngineConfig",
    "Request",
]
