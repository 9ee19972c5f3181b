from dflash_tpu.engine.batching import ContinuousBatchingEngine, EngineConfig, Request

__all__ = ["ContinuousBatchingEngine", "EngineConfig", "Request"]
