"""Prompt-prefix cache: reuse prefill work across requests.

The reference gets this from SGLang's radix cache (SURVEY §2.2; the serving
engine it defers to caches KV of shared prompt prefixes so chat-template
system prompts are prefilled once).  TPU-native version: an LRU of device
arrays — the target-KV rows and tap features of a prompt prefix at
``granularity``-token boundaries.  A hit admission resumes prefill from the
cached frontier (one incremental forward over the suffix) instead of
recomputing the O(P²) prefix.

Radix-lite rather than a radix tree: one inserted prefix registers a key for
EVERY granularity boundary it covers, all sharing the same device entry
(memory is counted once), so a prompt agreeing with a cached one on only a
shorter boundary still hits — the dominant shared-system-prompt shapes are
captured with static shapes per (prefix, suffix) bucket pair (each is one
compiled executable).
"""

from __future__ import annotations

import hashlib
import itertools
import threading
from collections import OrderedDict
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import numpy as np


class PrefixEntry(NamedTuple):
    """Prefilled prompt-prefix rows: ``kv_rows`` is a KVCache or QuantKVCache
    pytree whose leaves are the cache's first P0 positions ([L, 1, P0, ...]
    — position axis 2 on every leaf, including the int8 scales), so entries
    work for both bf16 and int8-quantized caches."""

    kv_rows: object  # KVCache | QuantKVCache rows pytree
    taps: jax.Array  # [1, P0, n_taps * H]

    @property
    def prefix_len(self) -> int:
        return self.taps.shape[1]

    @property
    def nbytes(self) -> int:
        return sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves((self.kv_rows, self.taps))
        )

    def truncated(self, n: int) -> "PrefixEntry":
        if n == self.prefix_len:
            return self
        return PrefixEntry(
            kv_rows=jax.tree.map(lambda x: x[:, :, :n], self.kv_rows),
            taps=self.taps[:, :n],
        )


def _key(ids: np.ndarray, n: int) -> bytes:
    return hashlib.sha1(np.ascontiguousarray(ids[:n], np.int32).tobytes()).digest()


class PrefixCache:
    """Byte-bounded LRU of :class:`PrefixEntry` keyed by token-prefix hash.

    Entries are evicted as wholes (all their boundary keys together), oldest
    lookup/insert first."""

    def __init__(self, capacity_bytes: int, granularity: int):
        self.capacity = int(capacity_bytes)
        self.granularity = int(granularity)
        # gid -> (entry, boundary keys); LRU order on gids
        self._groups: "OrderedDict[int, Tuple[PrefixEntry, list]]" = OrderedDict()
        self._index: Dict[bytes, Tuple[int, int]] = {}  # key -> (gid, n)
        self._gid = itertools.count()
        self._bytes = 0
        self.hits = 0
        self.misses = 0
        # One cache may be shared by several engine pools (the BucketedEngine
        # rungs), each with its own scheduler thread.
        self._lock = threading.Lock()

    def lookup(self, ids: np.ndarray, max_prefix: int) -> Optional[Tuple[int, PrefixEntry]]:
        """Longest cached prefix of ``ids`` at a granularity boundary, at most
        ``max_prefix`` tokens (callers pass prompt_len - 1: at least one
        suffix token must remain to produce the last-hidden row)."""
        ids = np.asarray(ids).reshape(-1)
        n = (min(max_prefix, ids.shape[0] - 1) // self.granularity) * self.granularity
        with self._lock:
            while n >= self.granularity:
                hit = self._index.get(_key(ids, n))
                if hit is not None:
                    gid, n_hit = hit
                    entry, _ = self._groups[gid]
                    self._groups.move_to_end(gid)
                    self.hits += 1
                    return n_hit, entry.truncated(n_hit)
                n -= self.granularity
            self.misses += 1
            return None

    def insert(self, ids: np.ndarray, entry: PrefixEntry) -> None:
        n_max = entry.prefix_len
        if n_max < self.granularity or n_max % self.granularity:
            return
        ids = np.asarray(ids).reshape(-1)
        with self._lock:
            full_key = _key(ids, n_max)
            if full_key in self._index:
                self._groups.move_to_end(self._index[full_key][0])
                return
            size = entry.nbytes
            if size > self.capacity:
                return
            while self._bytes + size > self.capacity and self._groups:
                self._evict_oldest()
            gid = next(self._gid)
            keys = []
            displaced = set()
            for n in range(self.granularity, n_max + 1, self.granularity):
                key = _key(ids, n)
                old = self._index.get(key)
                if old is not None and old[0] != gid:
                    displaced.add(old[0])
                self._index[key] = (gid, n)
                keys.append(key)
            self._groups[gid] = (entry, keys)
            self._bytes += size
            # a shorter-prefix group whose every boundary key was just
            # repointed to this longer entry is unreachable — free its bytes
            # now rather than letting a dead entry occupy capacity until LRU
            # pressure
            for og in displaced:
                got = self._groups.get(og)
                if got is not None and not any(
                    self._index.get(k, (None,))[0] == og for k in got[1]
                ):
                    self._bytes -= got[0].nbytes
                    del self._groups[og]

    def _evict_oldest(self) -> None:
        gid, (entry, keys) = self._groups.popitem(last=False)
        self._bytes -= entry.nbytes
        for key in keys:
            if self._index.get(key, (None,))[0] == gid:
                del self._index[key]

    def clear(self) -> None:
        with self._lock:
            self._groups.clear()
            self._index.clear()
            self._bytes = 0
