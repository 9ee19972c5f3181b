from dflash_tpu.cache.kv import KVCache, init_kv_cache

__all__ = ["KVCache", "init_kv_cache"]
