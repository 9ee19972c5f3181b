"""Disaggregated prefill/decode: a prefill role on its own device (group).

The serving lever the reference gets from its serving stack's deployment
shape (SGLang's prefill/decode disaggregation; the repo's own launch is the
colocated form, reference benchmark_sglang.py:436-447): admission prefill is
O(P²) target-only compute that steals decode cycles from running lanes.  A
:class:`PrefillWorker` owns a SECOND device (or sharded device group) with
its own copy of the target params, runs each admission's prompt-prefix
forward there, and ships the finished ``(kv_rows, taps)`` across the
interconnect to the decode engine, which completes admission through the
existing ``_prefill_from_prefix`` resume path (one bounded suffix forward —
the only prefill work the decode chip ever does).

Topology notes (v5e-2 economics, docs/RESULTS.md "Disaggregated prefill"):
the handoff payload for a P0-token prefix is the prefix KV
(L·P0·2·n_kv·d bytes, int8 when the decode engine runs kv_quant) plus taps
(P0·n_taps·H), e.g. ~29 MB bf16 / ~15 MB int8 for a 1920-token Qwen3-4B
prefix — microseconds over ICI (~10s of GB/s per link), milliseconds over
host DMA.  Decode-side admission cost drops from O(P²) attention to
O((P−P0)·P).

Correctness is device-count-independent: the worker runs the same
``_prefill_chunk`` executable the chunk-interleaved admission path uses, so
a disagg-admitted request is token-identical to a colocated admission
(pinned by tests/test_disagg.py on a 2-device CPU mesh and by
``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dflash_tpu.core.config import DraftConfig, ModelConfig


@dataclass
class DisaggResult:
    """A finished prefill handoff, rows already resident on the decode
    device."""

    req: object  # engine Request
    lane: int
    padded: np.ndarray  # [1, Pb]
    p0: int
    kv_rows: object  # pytree, leaves [L, 1, P0, ...] (decode device)
    taps: Optional[jax.Array]  # [1, P0, n_taps * H] (decode device)
    error: Optional[str] = None


class PrefillWorker:
    """Runs admission prompt-prefix prefills on a dedicated device and ships
    the rows to the decode device.

    ``prefill_device`` / ``decode_device`` accept anything
    ``jax.device_put`` does (a Device, or a Sharding for a sharded prefill
    group).  The worker thread only dispatches JAX computations — the engine
    thread never blocks on prefill compute.
    """

    def __init__(
        self,
        tcfg: ModelConfig,
        dcfg: DraftConfig,
        t_params,
        *,
        prefill_device,
        decode_device,
        kv_quant: bool = False,
    ):
        self.tcfg, self.dcfg = tcfg, dcfg
        self.kv_quant = kv_quant
        self.prefill_device = prefill_device
        self.decode_device = decode_device
        # The worker's own resident copy of the target params (the prefill
        # chip's weights in a real 2-chip deployment).
        self.t_params = jax.device_put(t_params, prefill_device)
        self._in: "queue.Queue" = queue.Queue()
        self._out: "queue.Queue[DisaggResult]" = queue.Queue()
        self.inflight = 0
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._running = True
        self._thread.start()

    def submit(self, req, lane: int, padded: np.ndarray, p0: int) -> None:
        with self._lock:
            self.inflight += 1
        self._in.put((req, lane, padded, p0))

    def poll(self):
        """Drain finished handoffs (non-blocking)."""
        out = []
        while True:
            try:
                out.append(self._out.get_nowait())
            except queue.Empty:
                return out

    def stop(self) -> None:
        self._running = False
        self._in.put(None)
        self._thread.join(timeout=30)

    # -- worker thread -------------------------------------------------------

    def _prefill_prefix(self, padded: np.ndarray, p0: int):
        """Full prompt-prefix forward ON THE PREFILL DEVICE: one dispatch of
        the shared ``_prefill_chunk`` executable over the whole prefix (a
        dedicated chip has no running lanes to stall, so no chunking)."""
        from dflash_tpu.cache.kv import init_kv_cache, init_quant_kv_cache
        from dflash_tpu.spec.engine import _prefill_chunk

        dtype = jax.tree.leaves(self.t_params)[0].dtype
        if dtype not in (jnp.bfloat16, jnp.float32):
            dtype = jnp.bfloat16
        dev = self.prefill_device
        scratch = (
            init_quant_kv_cache(self.tcfg, 1, p0)
            if self.kv_quant
            else init_kv_cache(self.tcfg, 1, p0, dtype)
        )
        scratch = jax.device_put(scratch, dev)
        taps_buf = jax.device_put(
            jnp.zeros((1, p0, self.dcfg.num_taps * self.tcfg.hidden_size), dtype), dev
        )
        ids = jax.device_put(jnp.asarray(padded[:, :p0]), dev)
        kv, taps = _prefill_chunk(
            self.t_params, scratch, taps_buf, ids, jnp.int32(0),
            tcfg=self.tcfg, tap_ids=self.dcfg.target_layer_ids,
        )
        # ship across the interconnect to the decode device
        kv = jax.device_put(kv, self.decode_device)
        taps = jax.device_put(taps, self.decode_device)
        jax.block_until_ready((kv, taps))
        return kv, taps

    def _run(self) -> None:
        while self._running:
            item = self._in.get()
            if item is None:
                return
            req, lane, padded, p0 = item
            try:
                kv, taps = self._prefill_prefix(padded, p0)
                res = DisaggResult(req=req, lane=lane, padded=padded, p0=p0,
                                   kv_rows=kv, taps=taps)
            except Exception as e:  # noqa: BLE001 — per-request isolation
                res = DisaggResult(req=req, lane=lane, padded=padded, p0=p0,
                                   kv_rows=None, taps=None,
                                   error=f"{type(e).__name__}: {e}")
            # enqueue BEFORE decrementing: a drain check of
            # (inflight == 0 and out empty) must never observe the gap
            self._out.put(res)
            with self._lock:
                self.inflight -= 1
