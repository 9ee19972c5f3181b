"""Prompt-prefix cache: reuse prefill work across requests.

The reference gets this from SGLang's radix cache (SURVEY §2.2; the serving
engine it defers to caches KV of shared prompt prefixes so chat-template
system prompts are prefilled once).  TPU-native version: an LRU of device
arrays — the target-KV rows and tap features of a prompt prefix at
``granularity``-token boundaries.  A hit admission resumes prefill from the
cached frontier (one incremental forward over the suffix) instead of
recomputing the O(P²) prefix.

Exact-match prefix keys (hash of the token bytes) rather than a radix tree:
lookups walk bucket boundaries longest-first, which captures the dominant
shared-system-prompt case with static shapes per bucket (each (prefix,
suffix) bucket pair is one compiled executable).
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import NamedTuple, Optional, Tuple

import jax
import numpy as np


class PrefixEntry(NamedTuple):
    k_rows: jax.Array  # [L, 1, P0, n_kv, d]
    v_rows: jax.Array  # [L, 1, P0, n_kv, d]
    taps: jax.Array  # [1, P0, n_taps * H]

    @property
    def prefix_len(self) -> int:
        return self.k_rows.shape[2]

    @property
    def nbytes(self) -> int:
        return sum(x.size * x.dtype.itemsize for x in self)


def _key(ids: np.ndarray, n: int) -> bytes:
    return hashlib.sha1(np.ascontiguousarray(ids[:n], np.int32).tobytes()).digest()


class PrefixCache:
    """Byte-bounded LRU of :class:`PrefixEntry` keyed by token-prefix hash."""

    def __init__(self, capacity_bytes: int, granularity: int):
        self.capacity = int(capacity_bytes)
        self.granularity = int(granularity)
        self._entries: "OrderedDict[bytes, PrefixEntry]" = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def lookup(self, ids: np.ndarray, max_prefix: int) -> Optional[Tuple[int, PrefixEntry]]:
        """Longest cached prefix of ``ids`` at a granularity boundary, at most
        ``max_prefix`` tokens (callers pass prompt_len - 1: at least one
        suffix token must remain to produce the last-hidden row)."""
        ids = np.asarray(ids).reshape(-1)
        n = (min(max_prefix, ids.shape[0] - 1) // self.granularity) * self.granularity
        while n >= self.granularity:
            key = _key(ids, n)
            entry = self._entries.get(key)
            if entry is not None and entry.prefix_len == n:
                self._entries.move_to_end(key)
                self.hits += 1
                return n, entry
            n -= self.granularity
        self.misses += 1
        return None

    def insert(self, ids: np.ndarray, entry: PrefixEntry) -> None:
        n = entry.prefix_len
        if n < self.granularity or n % self.granularity:
            return
        key = _key(np.asarray(ids).reshape(-1), n)
        if key in self._entries:
            self._entries.move_to_end(key)
            return
        size = entry.nbytes
        if size > self.capacity:
            return
        while self._bytes + size > self.capacity and self._entries:
            _, old = self._entries.popitem(last=False)
            self._bytes -= old.nbytes
        self._entries[key] = entry
        self._bytes += size

    def clear(self) -> None:
        self._entries.clear()
        self._bytes = 0
