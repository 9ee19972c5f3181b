"""Continuous batching engine: the serving layer the reference outsources to
SGLang (reference README.md:55-69, benchmark_sglang.py) rebuilt TPU-native.

R fixed lanes hold per-request decode state (the vmapped LoopState of
spec/batched.py).  Every engine step runs ONE speculative cycle for all lanes
in a single jitted executable; finished/idle lanes are frozen by a per-lane
select.  Admission writes a freshly prefilled request into a free lane with a
donated-buffer jitted update (no reallocation of the batched KV).  Because
lanes never interact (no cross-lane reductions anywhere in the cycle), a
request's output is independent of what the other lanes are doing — the
invariant the tests pin.

This is the "cudagraph-equivalent" design: fixed-shape executables for
admit/cycle, driven by a host scheduler (SURVEY §2.2: continuous batching
scheduler + per-request dynamic block schedule)."""

from __future__ import annotations

import itertools
import queue
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dflash_tpu.core.config import DraftConfig, ModelConfig
from dflash_tpu.spec.batched import batched_cycles
from dflash_tpu.spec.engine import (
    LoopState,
    SamplingFilters,
    _prefill,
    _prefill_chunk,
    _prefill_from_prefix,
)


@dataclass
class EngineConfig:
    num_lanes: int = 4
    max_new_tokens: int = 256
    block_size: int = 16
    prompt_cap: int = 512
    prompt_bucket: int = 128
    stop_token_ids: Tuple[int, ...] = ()
    temperature: float = 0.0
    seed: int = 0
    kv_quant: bool = False  # int8 KV cache
    # Cycles per device dispatch (multi-step scheduling): the host only
    # retires/admits every steps_per_sync cycles.  With the overlapped
    # scheduler (below) dispatch latency hides behind device compute; the
    # residual tradeoff is the measured ~5-6 ms/window fixed dispatch cost
    # through the tunneled runtime (amortized by bigger windows) against
    # finished-lane idle burn + retire lag (grow with the window).  Round-2
    # measured 2 as the optimum with the slower verify; the round-4 verify
    # moved it to 4 (interleaved A/B at conc 16: sps=4 won all 4 paired
    # reps, median 3373 vs 3331; window microbench 23.6 vs 25.5 ms/cycle —
    # docs/measurements/{sps_ab,window_exec*}.json).  1 pays two dispatches
    # + a peek per cycle — the pipeline can't fully hide that.
    # Settled round 5 (scripts/measure_sps_ab.py, 8 interleaved pairs per
    # concurrency on the qwen3-4b geometry): sps=4 wins 7/8 pairs at conc 16
    # (median 3497 vs 3421) and 8/8 at conc 32 (3675 vs 3631) —
    # docs/measurements/sps_ab_r5.json.  Other geometries inherit this
    # default; re-run the script before leaning on it elsewhere.
    steps_per_sync: int = 4
    # Adaptive windows: size each dispatch to the earliest predicted lane
    # finish (power-of-two buckets <= steps_per_sync, one compile each), so a
    # finishing lane is retired — and a queued request admitted — without
    # idling out the rest of a fixed window.  Measured OFF-by-default: through
    # a high-latency device tunnel the extra dispatches cost more than the
    # idle cycles they save (conc=32 dropped 1600 -> 897 tok/s with this on;
    # docs/RESULTS.md).  Worth enabling on low-latency local runtimes.
    adaptive_window: bool = False
    # Batch same-temperature admission bursts through one vmapped prefill +
    # one multi-lane scatter.  Measured OFF-by-default at bench scales: group
    # sizes vary per retire wave, so each new (k, bucket) pair compiles, and
    # the pow2-padded group prefill computes rows it throws away (conc=32:
    # 1431 vs 1600 tok/s).  Wins only for steady same-shape admission floods
    # with a warm compile cache.
    batch_admission: bool = False
    # Prompt-prefix cache (SGLang-radix-cache equivalent, engine/prefix_cache
    # .py): device-LRU of prefilled prefix KV rows + taps at prompt_bucket
    # boundaries; admissions resume prefill from the longest cached prefix.
    # 0 disables.  Works with both bf16 and int8 (kv_quant) caches — entries
    # are stored in the cache's own representation.
    prefix_cache_mb: int = 0
    # Overlapped scheduling (SGLang's overlapped-scheduler equivalent): each
    # step dispatches window N, then harvests window N-1's results while the
    # device executes N — host readbacks, retire bookkeeping and admission
    # prefill dispatches all hide behind device compute instead of stalling
    # it.  Retire/admit decisions lag one window; per-request outputs are
    # identical (lanes are independent and finished lanes freeze on-device).
    # False = the synchronous dispatch->wait->harvest->admit loop.
    overlap: bool = True
    # Windows in flight before a harvest (overlap mode).  1 = harvest window
    # N-1 right after dispatching N (the round-2..4 pipeline).  2 = harvest
    # N-2 after dispatching N: the host never blocks on a still-executing
    # window, at the price of one more window of retire/admit lag (a freed
    # lane idles up to depth x steps_per_sync cycles before re-admission).
    # Measured on the round-5 verify (scripts/measure_serving_depth.py):
    # whether hiding the harvest block beats the extra idle burn depends on
    # queue pressure; see docs/measurements/serving_depth.json.
    pipeline_depth: int = 1
    # Per-request top-k / top-p sampling (the rest of the SGLang client's
    # sampling_params, reference benchmark_sglang.py:42-47).  Static because
    # the filtered-posterior executable costs one extra lax.top_k over the
    # vocab per cycle; greedy/temperature-only deployments keep the lean
    # executable.  When False, requests whose (top_k, top_p) are semantic
    # no-ops (top_k<=0 / top_p>=1, or effectively-greedy top_k==1) are still
    # accepted and normalized; anything else is rejected at submit().
    sampling_filters: bool = False
    # Static candidate pool for the filtered sampler.  The keep set is EXACT
    # for any accepted top_k/top_p (ops/sampling.py resolves exact value
    # thresholds; the pool only seeds the threshold guess), but a request
    # with top_k far beyond the pool forces the bisection loop every cycle —
    # so submit() REJECTS top_k > topk_pool as a performance guard rather
    # than serving it slowly or (round-2 behavior) silently clamping it.
    # One executable per pool size.
    topk_pool: int = 64
    # Streaming / stop-scan service cadence (SGLang's stream_interval): lanes
    # with SSE consumers or stop strings materialize the output buffer on the
    # host every stream_interval-th scheduling window instead of every window
    # — through a tunneled runtime that readback is the entire streaming tax
    # (docs/RESULTS.md "Streaming tax": −37% at interval 1).  Chunks arrive
    # every interval windows (~tens of ms); a stop string is still honored
    # exactly (the scan sees the same committed tokens, the overshoot is
    # trimmed), it just force-finishes up to interval−1 windows later.
    # Finishing/aborted lanes are always serviced immediately.
    stream_interval: int = 4
    # Chunk-interleaved admission prefill (the serving role of SGLang's
    # chunked prefill, reference benchmark_sglang.py:436-447): a long
    # admission's prompt prefix is prefilled in admission_chunk-token
    # dispatches INTERLEAVED between decode windows, so admitting a 2k
    # prompt stalls the running lanes by at most one chunk per window
    # instead of one full O(P²) prefill.  The completed prefix rows feed the
    # existing _prefill_from_prefix resume path (token parity pinned by
    # tests).  None disables (admissions prefill in one dispatch).
    admission_chunk: Optional[int] = None
    # chunk dispatches per scheduling window across in-flight admissions
    admission_chunks_per_step: int = 1
    # Prefill-ahead (speculative pre-admission): while every lane is busy,
    # up to this many queued plain-path requests are prefilled into staged
    # single-lane states BETWEEN decode windows, so a freed lane is refilled
    # with one cheap admit dispatch instead of waiting on a prompt prefill.
    # Attacks the measured ~10% lane-occupancy loss at cohort turnover
    # (docs/RESULTS.md serving-ceiling decomposition): the prefill FLOPs
    # still run on the device, but during the busy period instead of on the
    # lane-turnaround critical path.  Long prompts keep their chunked /
    # disaggregated admission routes.  Each staged state holds a full
    # total_len KV copy until admission — cap accordingly.  0 disables.
    prefill_ahead: int = 0
    # Admission pacing: at most this many queue pops (prefill dispatches)
    # per scheduling window.  The measured middle ground between burst
    # admission (max throughput, stall = n_admissions x one prefill — 1.7 s
    # for 8x 2048-token prompts) and chunk-interleaved admission (stall ~ one
    # chunk, but reserved lanes idle across many windows, -32% net tok/s at
    # chunk 512): pacing bounds the stall at ~cap x one prefill while lanes
    # refill at full speed (docs/RESULTS.md "Admission stalls").  None = no
    # cap.
    max_admissions_per_step: Optional[int] = None
    # Benchmark-only: override the accept decision with a deterministic
    # pattern of mean tau (no trained draft checkpoints reach this
    # environment; compute per cycle is identical, see bench.py).
    emulate_tau: Optional[float] = None


@dataclass
class Request:
    rid: int
    input_ids: np.ndarray  # [P] int32
    max_new_tokens: int
    temperature: float
    top_k: int = 0  # <= 0 disables
    top_p: float = 1.0  # >= 1 disables
    # Per-request sampling seed: None derives a lane key from the engine seed
    # + rid (unique per request); an explicit seed gives reproducible samples
    # for identical requests regardless of admission order.
    seed: Optional[int] = None
    # Stop strings (SGLang sampling_params "stop", reference
    # benchmark_sglang.py:48-49): generation halts when any appears in the
    # decoded text; the match is excluded from the output.  Checked host-side
    # once per scheduling window (a stop can overshoot by up to one window of
    # cycles on-device; the overshoot is trimmed before the result surfaces).
    stop_strings: Tuple[str, ...] = ()
    # Incremental stop-scan state: generated tokens already scanned clean
    # (no stop string found up to this many tokens) — each window decodes
    # only the new tokens plus a max-stop-length overlap, not the whole
    # generation (see _find_stop_cut).
    scanned_tokens: int = 0
    submitted_at: float = field(default_factory=time.perf_counter)
    # Streaming: when set, the engine pushes {"token_ids": [...], "finished":
    # False} per scheduling window as tokens commit, then one final item with
    # finished=True once meta_info is ready.
    stream_queue: Optional["queue.Queue"] = None
    streamed: int = 0  # generated tokens already pushed to stream_queue
    # filled on completion:
    output_ids: Optional[np.ndarray] = None
    meta_info: Optional[dict] = None
    error: Optional[str] = None  # per-request failure, surfaced not fatal
    done_event: threading.Event = field(default_factory=threading.Event)


class _GroupPrefillError(RuntimeError):
    """Group admission failed before any engine buffer was donated —
    the caller may safely retry the requests one at a time."""


class _EngineStateLost(RuntimeError):
    """A donating dispatch failed AFTER consuming the engine state's buffers:
    every in-flight request's KV is gone.  The engine recovers by failing
    those requests individually and rebuilding an empty state — the engine
    itself keeps serving (see _recover_lost_state)."""


@dataclass
class _PrefillTask:
    """An in-flight chunk-interleaved admission: the prompt prefix [0, p0)
    is prefilled chunk-by-chunk between decode windows into a scratch cache
    independent of the lane state; on completion the request is admitted via
    the prefix-resume path."""

    req: Request
    lane: int
    padded: np.ndarray  # [1, Pb] bucket-padded prompt ids
    scratch_kv: object  # KVCache | QuantKVCache sized [L, 1, Pb, ...]
    taps_buf: jax.Array  # [1, Pb, n_taps * H]
    c0: int  # next chunk start (multiple of the chunk size)
    p0: int  # prefix target: largest chunk multiple <= prompt_len - 1


def _select_lane(batched, lane: jax.Array, single, axis: int = 0):
    """Write a batch-1 pytree into lane ``lane`` of a batched pytree."""
    return jax.tree.map(
        lambda full, one: jax.lax.dynamic_update_index_in_dim(full, one, lane, axis),
        batched,
        single,
    )


def _admit_impl(batched_state: LoopState, lane: jax.Array, single_state: LoopState) -> LoopState:
    # Lane axis placement per spec.batched.STATE_AXES: KV caches carry the
    # lane axis at position 1 (behind layers), everything else leading.
    return batched_state._replace(
        output_ids=_select_lane(batched_state.output_ids, lane, single_state.output_ids),
        start=_select_lane(batched_state.start, lane, single_state.start),
        done=_select_lane(batched_state.done, lane, single_state.done),
        cycle_idx=_select_lane(batched_state.cycle_idx, lane, single_state.cycle_idx),
        acc_trace=_select_lane(batched_state.acc_trace, lane, single_state.acc_trace),
        key=_select_lane(batched_state.key, lane, single_state.key),
        t_kv=_select_lane(batched_state.t_kv, lane, single_state.t_kv, axis=1),
        d_kv=_select_lane(batched_state.d_kv, lane, single_state.d_kv, axis=1),
        features=_select_lane(batched_state.features, lane, single_state.features),
    )


_admit = jax.jit(_admit_impl, donate_argnums=(0,))


@jax.jit
def _peek_impl(state: LoopState):
    """Small fresh-buffer copies of everything the host scheduler needs to
    retire lanes: no donation, and every output is a real computation (+0 /
    |False) so its buffer can never alias state leaves that the NEXT cycle
    dispatch will donate.  ~250KB/window — cheap even through the tunnel."""
    return (
        state.start + 0,
        state.done | False,
        state.cycle_idx + 0,
        state.output_ids + 0,
        state.acc_trace + 0,
    )


def _lane_view(group: LoopState, j: int) -> LoopState:
    """Row ``j`` of a batched LoopState, lane axis dropped (STATE_AXES
    placement: KV caches at axis 1, everything else leading)."""
    ix = lambda axis: (lambda x: jax.lax.index_in_dim(x, j, axis, keepdims=False))
    return LoopState(
        output_ids=ix(0)(group.output_ids),
        start=ix(0)(group.start),
        done=ix(0)(group.done),
        cycle_idx=ix(0)(group.cycle_idx),
        acc_trace=ix(0)(group.acc_trace),
        key=ix(0)(group.key),
        t_kv=jax.tree.map(ix(1), group.t_kv),
        d_kv=jax.tree.map(ix(1), group.d_kv),
        features=ix(0)(group.features),
    )


@partial(jax.jit, donate_argnums=(0,), static_argnames=("k",))
def _admit_many(batched_state: LoopState, lanes: jax.Array,
                group_state: LoopState, *, k: int) -> LoopState:
    """Write rows 0..k-1 of a freshly prefilled group into lanes[0..k-1] —
    one dispatch for the whole admission burst."""
    st = batched_state
    for j in range(k):
        st = _admit_impl(st, lanes[j], _lane_view(group_state, j))
    return st


class ContinuousBatchingEngine:
    """Host scheduler around the batched speculative cycle.

    Use either synchronously (``submit`` + ``run_until_drained``) or as a
    background loop (``start``/``stop``) serving concurrent callers.
    """

    def __init__(self, tcfg: ModelConfig, dcfg: DraftConfig, t_params, d_params,
                 cfg: EngineConfig, tokenizer=None, prefill_worker=None):
        self.tcfg, self.dcfg = tcfg, dcfg
        self.t_params, self.d_params = t_params, d_params
        self.cfg = cfg
        self.tokenizer = tokenizer  # needed only for stop-string requests
        # Disaggregated prefill (engine/disagg.py): long admissions run their
        # prompt-prefix forward on the worker's OWN device and come back as
        # (kv_rows, taps) for the _prefill_from_prefix resume path — the
        # decode chip only ever runs the bounded suffix forward.
        self._disagg = prefill_worker
        self._disagg_pending = 0
        if prefill_worker is not None and prefill_worker.kv_quant != cfg.kv_quant:
            raise ValueError(
                "prefill_worker.kv_quant must match EngineConfig.kv_quant "
                "(handoff rows are in the cache's own representation)"
            )
        R = cfg.num_lanes
        self.total_len = cfg.prompt_cap + cfg.max_new_tokens + cfg.block_size + 1
        self.max_cycles = cfg.max_new_tokens

        self._queue: "queue.Queue[Request]" = queue.Queue()
        self._lane_req: List[Optional[Request]] = [None] * R
        self._lane_max_length = np.zeros((R,), np.int64)
        self._lane_prompt_len = np.zeros((R,), np.int64)
        # Per-lane decode temperature (reference per-request sampling_params,
        # benchmark_sglang.py:107-222): every cycle samples each lane's
        # posterior at its own request's temperature.
        self._lane_temp = np.full((R,), cfg.temperature, np.float32)
        self._lane_top_k = np.zeros((R,), np.int32)
        self._lane_top_p = np.ones((R,), np.float32)
        # Overlapped scheduling state: the previous window's pending peek
        # ((device arrays), lane-epoch snapshot) and the last harvested start
        # values (drives _pick_window without a device sync).  Lane epochs
        # guard against retiring a freshly admitted request with a peek taken
        # before its admission.  Oldest-first deque of ((device arrays),
        # lane-epoch snapshot); holds up to cfg.pipeline_depth entries.
        self._peek_pending: deque = deque()
        self._window_count = 0  # harvested windows (stream_interval cadence)
        self._lane_epoch = np.zeros((R,), np.int64)
        self._last_start_host: Optional[np.ndarray] = None
        self._rid = itertools.count()
        # chunk-interleaved admissions in flight + their reserved lanes
        self._prefill_tasks: List[_PrefillTask] = []
        # prefill-ahead: (request, prefilled single-lane state) pairs staged
        # while all lanes were busy, admitted the moment a lane frees
        self._staged: List[tuple] = []
        self._lane_reserved: set = set()
        self._aborted: set = set()  # rids to force-finish at next harvest
        # rids popped from the queue but not yet bound into a lane: abort()
        # must see these too, or a request caught mid-admission would be
        # invisible to both the queue drain and the lane scan and run to
        # completion uncancellable.
        self._pending_admit: set = set()
        self._abort_lock = threading.Lock()
        self._lock = threading.Lock()
        self._running = False
        self._thread: Optional[threading.Thread] = None
        self.completed: Dict[int, Request] = {}
        self.cycle_count = 0

        forced = None
        if cfg.emulate_tau is not None:
            rng = np.random.default_rng(0)
            lo = int(np.floor(cfg.emulate_tau))
            taus = np.where(
                rng.random(self.max_cycles) < cfg.emulate_tau - lo, lo + 1, lo
            )
            forced = jnp.asarray(
                np.clip(taus, 1, cfg.block_size).astype(np.int32) - 1
            )
        self._forced_acc = forced

        def make_cycle_fn(n_steps: int):
            return self._make_cycle_fn(n_steps)

        self._max_window = max(1, cfg.steps_per_sync)
        # Power-of-two window ladder (1, 2, 4, ..., steps_per_sync): bounded
        # compile count, and any target window is covered within 2x.
        sizes = {self._max_window}
        if cfg.adaptive_window:
            n = 1
            while n < self._max_window:
                sizes.add(n)
                n *= 2
        self._cycle_fns = {n: make_cycle_fn(n) for n in sorted(sizes)}
        del make_cycle_fn
        # Running estimate of tokens committed per cycle (tau); refined from
        # retired requests' measured acceptance.
        self._tau_est = max(1.0, cfg.block_size / 2)
        self._prefix_cache = None
        if cfg.prefix_cache_mb > 0:
            from dflash_tpu.engine.prefix_cache import PrefixCache

            self._prefix_cache = PrefixCache(
                cfg.prefix_cache_mb * (1 << 20), cfg.prompt_bucket
            )
        self._state = self._empty_state(R)

    def _make_cycle_fn(self, n_steps: int):
        return jax.jit(
            partial(
                batched_cycles,
                tcfg=self.tcfg, dcfg=self.dcfg,
                block_size=self.cfg.block_size,
                stop_token_ids=tuple(self.cfg.stop_token_ids),
                n_steps=n_steps,
                forced_acc=self._forced_acc,
                topk_pool=self.cfg.topk_pool,
            ),
            donate_argnums=(0,),
        )

    def set_steps_per_sync(self, n: int) -> None:
        """Re-point the scheduling window size on a live (idle) engine.

        For interleaved A/B measurement (scripts/measure_sps_ab.py): two
        whole engines double the device memory; this swaps only the window
        executable (compiled lazily per size, memoized)."""
        import dataclasses

        if any(r is not None for r in self._lane_req) or self._peek_pending:
            raise RuntimeError("set_steps_per_sync needs an idle engine")
        self.cfg = dataclasses.replace(self.cfg, steps_per_sync=int(n))
        self._max_window = max(1, int(n))
        if self._max_window not in self._cycle_fns:
            self._cycle_fns[self._max_window] = self._make_cycle_fn(self._max_window)

    # -- state management ---------------------------------------------------

    def _empty_state(self, R: int) -> LoopState:
        from dflash_tpu.cache.kv import init_kv_cache, init_quant_kv_cache

        dtype = jax.tree.leaves(self.t_params)[0].dtype
        if dtype not in (jnp.bfloat16, jnp.float32):
            dtype = jnp.bfloat16
        T = self.total_len
        mk = lambda *shape, d=jnp.int32: jnp.zeros((R,) + shape, d)
        t_kv0 = (
            init_quant_kv_cache(self.tcfg, 1, T)
            if self.cfg.kv_quant
            else init_kv_cache(self.tcfg, 1, T, dtype)
        )
        # KV lane axis at position 1, behind layers (spec.batched.STATE_AXES).
        lane1 = lambda x: jnp.zeros(x.shape[:1] + (R,) + x.shape[1:], x.dtype)
        return LoopState(
            output_ids=jnp.full((R, 1, T), self.dcfg.mask_token_id, jnp.int32),
            start=jnp.zeros((R,), jnp.int32),
            done=jnp.ones((R,), bool),  # all lanes idle
            cycle_idx=mk(),
            acc_trace=mk(self.max_cycles),
            key=jnp.stack([jax.random.PRNGKey(self.cfg.seed)] * R),
            t_kv=jax.tree.map(lane1, t_kv0),
            d_kv=jax.tree.map(lane1, init_kv_cache(self.dcfg.model, 1, T, dtype)),
            features=jnp.zeros(
                (R, 1, T, self.dcfg.num_taps * self.tcfg.hidden_size), dtype
            ),
        )

    # -- public API ---------------------------------------------------------

    def submit(self, input_ids: np.ndarray, max_new_tokens: Optional[int] = None,
               temperature: Optional[float] = None, top_k: int = 0,
               top_p: float = 1.0, stop: Optional[Sequence[str]] = None,
               stream: bool = False, seed: Optional[int] = None) -> Request:
        input_ids = np.asarray(input_ids).reshape(-1)
        if input_ids.shape[0] > self.cfg.prompt_cap:
            raise ValueError(
                f"prompt length {input_ids.shape[0]} exceeds prompt_cap {self.cfg.prompt_cap}"
            )
        stop_strings = (stop,) if isinstance(stop, str) else tuple(stop or ())
        if stop_strings and self.tokenizer is None:
            raise ValueError("stop strings need an engine tokenizer")
        temperature = self.cfg.temperature if temperature is None else temperature
        if top_k == 1:
            # argmax over one candidate == greedy; normalize so the common
            # SGLang-client default (T=0, top_k=1, top_p=1) needs no filters
            temperature, top_k, top_p = 0.0, 0, 1.0
        if temperature == 0.0:
            top_k, top_p = 0, 1.0  # greedy ignores filters
        if not self.cfg.sampling_filters and (top_k > 0 or top_p < 1.0):
            raise ValueError(
                "request has top_k/top_p but the engine was built with "
                "sampling_filters=False"
            )
        # Any top_k < vocab is accepted (SGLang accepts arbitrary
        # sampling_params, reference benchmark_sglang.py:42-47).  The keep
        # set is EXACT regardless of topk_pool — the pool only seeds the
        # threshold guess (ops/sampling.py exact_filter_thresholds); a
        # top_k far beyond the pool pays bisection rounds inside the cycle,
        # whose measured cost at 16 lanes is ~0% vs in-pool filtering
        # (docs/RESULTS.md "Wide top-k" table;
        # docs/measurements/wide_topk.json), not a correctness risk — so the
        # round-3 submit() rejection was dropped.
        if top_k >= self.tcfg.vocab_size:
            top_k = 0  # keep-everything == filter off
        req = Request(
            rid=next(self._rid),
            input_ids=input_ids.astype(np.int32),
            max_new_tokens=min(max_new_tokens or self.cfg.max_new_tokens,
                               self.cfg.max_new_tokens),
            temperature=temperature,
            top_k=int(top_k),
            top_p=float(top_p),
            stop_strings=stop_strings,
            stream_queue=queue.Queue() if stream else None,
            seed=seed,
        )
        self._queue.put(req)
        return req

    def abort(self, rid: int) -> bool:
        """Cancel a request: a queued one never runs; an active one is
        force-finished at the next harvest with its committed tokens and
        ``finish_reason {"type": "abort"}`` (the SGLang abort semantics for
        client disconnects).  Returns False for unknown/completed rids."""
        with self._abort_lock:
            # queued: rebuild the queue without it
            drained: List[Request] = []
            hit = False
            while True:
                try:
                    r = self._queue.get_nowait()
                except queue.Empty:
                    break
                if r.rid == rid:
                    hit = True
                    r.error = "aborted before admission"
                    r.meta_info = {"error": r.error,
                                   "finish_reason": {"type": "abort"}}
                    self.completed[rid] = r
                    if r.stream_queue is not None:
                        r.stream_queue.put({"token_ids": [], "finished": True,
                                            "meta_info": r.meta_info})
                    r.done_event.set()
                else:
                    drained.append(r)
            for r in drained:
                self._queue.put(r)
            if hit:
                return True
            if (
                any(r is not None and r.rid == rid for r in self._lane_req)
                or rid in self._pending_admit
            ):
                self._aborted.add(rid)
                return True
            return False

    def step(self) -> int:
        """Admit waiting requests into free lanes, dispatch one multi-cycle
        window, harvest finished requests.  Returns active lanes.

        Idle/finished lanes advance garbage state through the cycle — that is
        deliberate: nobody reads an idle lane (results are harvested the same
        step the lane finishes, and admission fully re-initializes a lane), so
        no freeze/select is needed and the executable stays branch-free.
        Each lane decodes at its own request's temperature.

        With ``cfg.overlap`` the harvest consumes the PREVIOUS window's peek
        while the device executes the window just dispatched: every host
        readback and admission prefill hides behind device compute.  Retire /
        admit decisions lag exactly one window; outputs are identical because
        lanes are independent and a finished lane freezes itself on-device
        (its ``done``/frontier condition fails in the cycle's select)."""
        self._drain_disagg()
        self._admit_pending()
        n_active = sum(r is not None for r in self._lane_req)
        if n_active == 0 and self._disagg_pending and not self._prefill_tasks:
            # nothing to dispatch, work pending only on the prefill worker:
            # yield the GIL instead of starving the worker thread's
            # trace/compile with a hot drain-poll spin
            time.sleep(0.001)

        if not self.cfg.overlap:
            if n_active == 0:
                self._step_prefill_tasks()
                return (len(self._prefill_tasks) + self._disagg_pending
                        + len(self._staged))
            self._dispatch_window()
            self._step_prefill_tasks()
            self._stage_pending()
            self._retire_finished()
            return (n_active + len(self._prefill_tasks) + self._disagg_pending
                    + len(self._staged))

        new_peek = None
        if n_active > 0:
            self._dispatch_window()
            peek = _peek_impl(self._state)
            for leaf in peek:
                leaf.copy_to_host_async()
            new_peek = (peek, self._lane_epoch.copy())
        # in-flight admission chunks dispatch BEHIND the decode window: the
        # device runs window then chunk(s), so each window is delayed by at
        # most admission_chunks_per_step chunk forwards, never a full prefill
        self._step_prefill_tasks()
        # prefill-ahead staging also dispatches behind the running window
        self._stage_pending()
        if new_peek is not None:
            self._peek_pending.append(new_peek)
            # keep at most pipeline_depth windows in flight (depth 1 = the
            # classic dispatch-N / harvest-N-1 cadence)
            while len(self._peek_pending) > max(1, self.cfg.pipeline_depth):
                self._harvest(self._peek_pending.popleft())
        else:
            # nothing new dispatched: drain every outstanding window so
            # finished lanes retire even when the engine goes idle
            while self._peek_pending:
                self._harvest(self._peek_pending.popleft())
        return (n_active + len(self._prefill_tasks) + self._disagg_pending
                + len(self._staged))

    def _dispatch_window(self) -> None:
        window = self._pick_window()
        temps = jnp.asarray(self._lane_temp, jnp.float32)
        max_lengths = jnp.asarray(self._lane_max_length, jnp.int32)
        filters = None
        if self.cfg.sampling_filters:
            filters = SamplingFilters(
                top_k=jnp.asarray(self._lane_top_k, jnp.int32),
                top_p=jnp.asarray(self._lane_top_p, jnp.float32),
            )
        self._state = self._cycle_fns[window](
            self._state, self.t_params, self.d_params, temps, max_lengths,
            filters=filters,
        )
        self.cycle_count += window

    def _harvest(self, pending: tuple) -> None:
        """Retire lanes using a window's peeked state (overlap mode: one
        window stale; sync mode passes the live state through the same path).
        Lanes whose epoch advanced since the peek (re-admitted) are skipped —
        their peek rows describe the PREVIOUS request.  Lanes with streaming
        or stop-string requests are serviced every window (token push / stop
        scan) — including the window they finish in, so a stop string
        committed in the final window still truncates the output."""
        (start_d, done_d, cycle_idx_d, output_ids_d, acc_trace_d), epochs = pending
        start = np.asarray(start_d)
        done = np.asarray(done_d)
        fresh = epochs == self._lane_epoch
        # Streaming/stop lanes materialize the output buffer only every
        # stream_interval-th window (cfg comment; the readback IS the
        # streaming tax through a tunneled runtime).  Finishing and aborted
        # lanes are always serviced.
        self._window_count += 1
        service_window = (
            self._window_count % max(1, self.cfg.stream_interval) == 0
        )
        # _pick_window reads these; a stale (pre-re-admission) row would make
        # the adaptive window think the NEW request is nearly done
        if self._last_start_host is None:
            self._last_start_host = np.where(fresh, start, 0)
        else:
            self._last_start_host = np.where(fresh, start, self._last_start_host)
        out_h = acc_h = cyc_h = None
        for lane in range(self.cfg.num_lanes):
            req = self._lane_req[lane]
            if req is None or not fresh[lane]:
                continue
            finished = bool(done[lane] or start[lane] >= self._lane_max_length[lane])
            aborted = req.rid in self._aborted
            # a finishing/aborted lane ALWAYS gets its final scan (a stop
            # string committed in the last window must still truncate)
            needs_scan = bool(
                (req.stop_strings or req.stream_queue is not None)
                and (service_window or finished or aborted)
            )
            if not (finished or needs_scan or aborted):
                continue
            if out_h is None:
                out_h = np.asarray(output_ids_d)
                acc_h = np.asarray(acc_trace_d)
                cyc_h = np.asarray(cycle_idx_d)
            n_cycles = int(cyc_h[lane])
            if aborted:
                self._aborted.discard(req.rid)
                gen = self._committed_gen(lane, req, int(start[lane]), out_h[lane])
                self._push_stream(req, gen)
                seq = np.concatenate([req.input_ids, gen]).astype(np.int32)
                self._complete(lane, req, seq, n_cycles,
                               acc_h[lane][:n_cycles], {"type": "abort"})
                continue
            if needs_scan and self._service_lane(
                lane, req, int(start[lane]), out_h[lane],
                n_cycles, acc_h[lane][:n_cycles]
            ):
                continue  # force-finished on a stop-string hit
            if finished:
                self._finish(lane, req, out_h[lane], n_cycles,
                             acc_h[lane][:n_cycles])

    def _pick_window(self) -> int:
        """Cycles for the next dispatch.  With requests queued, shrink the
        window to the earliest predicted lane finish so the freed lane is
        refilled promptly; with an empty queue, idle-burn is impossible and
        the full window amortizes dispatch latency best."""
        if not self.cfg.adaptive_window or self._queue.empty():
            return self._max_window
        if self.cfg.overlap:
            if self._last_start_host is None:
                return self._max_window
            start = self._last_start_host
        else:
            start = np.asarray(self._state.start)
        need = None
        for lane, req in enumerate(self._lane_req):
            if req is None:
                continue
            remaining = max(1, int(self._lane_max_length[lane]) - int(start[lane]))
            cycles = int(np.ceil(remaining / max(1.0, self._tau_est)))
            need = cycles if need is None else min(need, cycles)
        if need is None:
            return self._max_window
        for n in sorted(self._cycle_fns):
            if n >= need:
                return n
        return self._max_window

    def _admit_pending(self) -> None:
        # staged prefill-ahead singles admit first: one cheap scatter each
        if self._staged:
            for lane in range(self.cfg.num_lanes):
                if not self._staged:
                    break
                if self._lane_req[lane] is not None or lane in self._lane_reserved:
                    continue
                while self._staged:
                    req, single = self._staged.pop(0)
                    if req.rid in self._aborted:
                        self._complete_aborted_admission(req)
                        continue  # lane still free — try the next staged
                    self._state = _admit(self._state, jnp.int32(lane), single)
                    self._bind_lane(lane, req)
                    break
        free = [
            l for l in range(self.cfg.num_lanes)
            if self._lane_req[l] is None and l not in self._lane_reserved
        ]
        if self.cfg.max_admissions_per_step is not None:
            free = free[: max(1, self.cfg.max_admissions_per_step)]
        reqs: List[Request] = []
        with self._abort_lock:  # pop + register atomically vs abort()'s scan
            while len(reqs) < len(free):
                try:
                    r = self._queue.get_nowait()
                except queue.Empty:
                    break
                reqs.append(r)
                self._pending_admit.add(r.rid)
        if not reqs:
            return
        # Admission bursts (startup, post-retire) run each group of
        # same-temperature requests through ONE vmapped prefill dispatch +
        # ONE multi-lane admit dispatch instead of 2 dispatches per request.
        # Grouping is skipped when the prefix cache is on (the group prefill
        # has no prefix-resume path and would silently bypass the cache).
        grouping = self.cfg.batch_admission and self._prefix_cache is None
        i = 0
        while i < len(reqs):
            group = [reqs[i]]
            sp = lambda r: (r.temperature, r.top_k, r.top_p)
            while (
                grouping
                and i + len(group) < len(reqs)
                and sp(reqs[i + len(group)]) == sp(group[0])
                and len(group) < len(free)
            ):
                group.append(reqs[i + len(group)])
            lanes = free[:len(group)]
            free = free[len(group):]
            if len(group) > 1:
                try:
                    self._admit_group(lanes, group)
                    i += len(group)
                    continue
                except _GroupPrefillError:
                    pass  # fall through to per-request admission below
                except _EngineStateLost as e:
                    # The donating _admit_many consumed self._state's buffers
                    # and then failed: every in-flight request's KV is gone.
                    # Fail them, re-queue the not-yet-dispatched admissions,
                    # and keep serving — a known kill-path is not acceptable
                    # in a serving engine.
                    self._recover_lost_state(
                        group, reqs[i + len(group):], str(e)
                    )
                    return
            # A bad request (e.g. malformed ids tripping a device error during
            # its prefill) must not kill the other lanes: surface the failure
            # on the request itself and keep serving (SURVEY §5 failure row —
            # the reference only has sweep-level CONTINUE_ON_ERROR).
            for lane, req in zip(lanes, group):
                try:
                    chunk = self.cfg.admission_chunk
                    g = self.cfg.prompt_bucket
                    p0_disagg = ((len(req.input_ids) - 1) // g) * g
                    if self._disagg is not None and p0_disagg >= g:
                        self._start_disagg(lane, req, p0_disagg)
                    elif (
                        chunk is not None
                        and ((len(req.input_ids) - 1) // chunk) * chunk >= chunk
                    ):
                        self._start_prefill_task(lane, req)
                    else:
                        self._admit_request(lane, req)
                except Exception as e:  # noqa: BLE001 — isolate per-request faults
                    self._fail_request(req, f"{type(e).__name__}: {e}")
            i += len(group)

    def _complete_aborted_admission(self, req: Request) -> None:
        """A request aborted while its prefill was still in flight (chunked
        task or disagg worker): complete it with the abort finish_reason
        before it ever touches a lane."""
        with self._abort_lock:
            self._aborted.discard(req.rid)
            self._pending_admit.discard(req.rid)
        req.error = "aborted before admission"
        req.meta_info = {"error": req.error,
                         "finish_reason": {"type": "abort"}}
        self.completed[req.rid] = req
        if req.stream_queue is not None:
            req.stream_queue.put({"token_ids": [], "finished": True,
                                  "meta_info": req.meta_info})
        req.done_event.set()

    def _fail_request(self, req: Request, msg: str) -> None:
        """Surface a per-request failure: error recorded, SSE consumers
        unblocked, waiters released; the engine keeps serving."""
        req.error = msg
        req.meta_info = {"error": req.error}
        self.completed[req.rid] = req
        with self._abort_lock:
            self._pending_admit.discard(req.rid)
            self._aborted.discard(req.rid)
        if req.stream_queue is not None:  # unblock SSE consumers
            req.stream_queue.put({
                "token_ids": [], "finished": True, "meta_info": req.meta_info,
            })
        req.done_event.set()

    def _recover_lost_state(self, failed: List[Request],
                            requeue: List[Request], cause: str) -> None:
        """Rebuild after a donating dispatch consumed the engine state and
        then failed.  The donated buffers (all lanes' KV, committed tokens)
        are unrecoverable, so every ACTIVE request fails individually — but
        the engine itself survives: fresh empty state, epochs bumped so any
        in-flight peek of the dead state is ignored, and requests whose
        prefill had not been dispatched yet go back to the queue untouched."""
        victims = list(failed) + [r for r in self._lane_req if r is not None]
        for req in victims:
            self._fail_request(req, f"engine state lost during admission: {cause}")
        with self._abort_lock:
            for req in requeue:
                self._pending_admit.discard(req.rid)
                self._queue.put(req)
        self._lane_req = [None] * self.cfg.num_lanes
        self._lane_epoch += 1  # any pending peek describes the dead state
        self._peek_pending.clear()
        self._last_start_host = None
        self._state = self._empty_state(self.cfg.num_lanes)

    def _prompt_bucket(self, prompt_len: int) -> int:
        """Smallest prompt_bucket multiple covering prompt_len, capped."""
        g = self.cfg.prompt_bucket
        return min(self.cfg.prompt_cap, ((max(prompt_len, 1) + g - 1) // g) * g)

    def _admit_group(self, lanes: List[int], reqs: List[Request]) -> None:
        """Prefill ``k`` same-temperature requests in ONE vmapped dispatch and
        scatter them into their lanes with one more; group sizes are bucketed
        to powers of two so the compile count stays logarithmic.

        Failures BEFORE the donating multi-lane admit raise
        :class:`_GroupPrefillError` (safe to retry per-request); a failure
        inside ``_admit_many`` raises :class:`_EngineStateLost` when the
        donation actually consumed the state's buffers (the caller rebuilds
        and keeps serving), else :class:`_GroupPrefillError`."""
        from dflash_tpu.spec.batched import jit_batched_prefill

        k = len(reqs)
        try:
            R = 1 << (k - 1).bit_length()  # pow2 bucket; padded rows dropped
            bucket = self._prompt_bucket(max(len(r.input_ids) for r in reqs))
            padded = np.zeros((R, 1, bucket), np.int32)
            plens = np.ones((R,), np.int32)
            for j, req in enumerate(reqs):
                padded[j, 0, : len(req.input_ids)] = req.input_ids
                plens[j] = len(req.input_ids)
            base_key = jax.random.PRNGKey(self.cfg.seed)
            row_keys = [self._req_key(r) for r in reqs] + [
                jax.random.fold_in(base_key, jnp.uint32(0))
            ] * (R - k)
            keys = jnp.stack(row_keys)
            group = jit_batched_prefill(
                self.t_params, self.d_params, jnp.asarray(padded), jnp.asarray(plens),
                jnp.float32(reqs[0].temperature), keys,
                tcfg=self.tcfg, dcfg=self.dcfg, total_len=self.total_len,
                max_cycles=self.max_cycles, kv_quant=self.cfg.kv_quant,
                filters=self._req_filters(reqs[0]),
                topk_pool=self.cfg.topk_pool,
            )
            jax.block_until_ready(group.start)  # surface prefill faults here
        except Exception as e:  # noqa: BLE001
            raise _GroupPrefillError(str(e)) from e
        try:
            self._state = _admit_many(
                self._state, jnp.asarray(lanes, jnp.int32), group, k=k
            )
        except Exception as e:  # noqa: BLE001 — classify by donation outcome
            if any(
                getattr(x, "is_deleted", lambda: False)()
                for x in jax.tree.leaves(self._state)
            ):
                raise _EngineStateLost(str(e)) from e
            # failed before execution consumed the buffers (e.g. compile
            # error): state intact, per-request retry is safe
            raise _GroupPrefillError(str(e)) from e
        for lane, req in zip(lanes, reqs):
            self._bind_lane(lane, req)

    def _req_key(self, req: Request) -> jax.Array:
        """Per-request PRNG key: explicit ``seed`` -> reproducible regardless
        of admission order; otherwise engine seed folded with the rid."""
        if req.seed is not None:
            return jax.random.PRNGKey(req.seed)
        return jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed), req.rid)

    def _req_filters(self, req: Request) -> Optional[SamplingFilters]:
        """Scalar-leaf filters for a request's prefill; None when the engine
        runs without the filtered executables (submit() already rejected any
        non-no-op request in that case)."""
        if not self.cfg.sampling_filters:
            return None
        return SamplingFilters(
            top_k=jnp.int32(req.top_k), top_p=jnp.float32(req.top_p)
        )

    def _bind_lane(self, lane: int, req: Request) -> None:
        with self._abort_lock:
            self._pending_admit.discard(req.rid)
        self._lane_req[lane] = req
        self._lane_prompt_len[lane] = len(req.input_ids)
        self._lane_max_length[lane] = len(req.input_ids) + req.max_new_tokens
        self._lane_temp[lane] = req.temperature
        self._lane_top_k[lane] = req.top_k
        self._lane_top_p[lane] = req.top_p
        self._lane_epoch[lane] += 1

    def _compute_single(self, req: Request):
        """Run a plain-path admission's prompt prefill: returns the
        prefilled single-lane LoopState (lane-independent — only the admit
        scatter couples a request to a lane)."""
        P = len(req.input_ids)
        bucket = self._prompt_bucket(P)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :P] = req.input_ids
        common = dict(
            tcfg=self.tcfg, dcfg=self.dcfg, total_len=self.total_len,
            max_cycles=self.max_cycles, kv_quant=self.cfg.kv_quant,
            filters=self._req_filters(req),
            topk_pool=self.cfg.topk_pool,
        )
        key = self._req_key(req)
        hit = (
            self._prefix_cache.lookup(req.input_ids, P - 1)
            if self._prefix_cache is not None else None
        )
        if hit is not None:
            _, entry = hit
            single = _prefill_from_prefix(
                self.t_params, self.d_params, jnp.asarray(padded), jnp.int32(P),
                entry.kv_rows, entry.taps,
                jnp.float32(req.temperature), key, **common,
            )
        else:
            single = _prefill(
                self.t_params, self.d_params, jnp.asarray(padded), jnp.int32(P),
                jnp.float32(req.temperature), key, **common,
            )
            if self._prefix_cache is not None:
                g = self.cfg.prompt_bucket
                P0 = ((P - 1) // g) * g
                if P0 >= g:
                    from dflash_tpu.engine.prefix_cache import PrefixEntry

                    self._prefix_cache.insert(req.input_ids, PrefixEntry(
                        kv_rows=jax.tree.map(lambda x: x[:, :, :P0], single.t_kv),
                        taps=single.features[:, :P0],
                    ))
        return single

    def _admit_request(self, lane: int, req: Request) -> None:
        single = self._compute_single(req)
        self._state = _admit(self._state, jnp.int32(lane), single)
        self._bind_lane(lane, req)

    def _plain_path(self, req: Request) -> bool:
        """True when admission would run the one-dispatch prefill (neither
        the disaggregated-worker nor the chunk-interleaved route applies —
        mirrors _admit_pending's routing)."""
        P1 = len(req.input_ids) - 1
        g = self.cfg.prompt_bucket
        if self._disagg is not None and (P1 // g) * g >= g:
            return False
        chunk = self.cfg.admission_chunk
        return not (chunk is not None and (P1 // chunk) * chunk >= chunk)

    def _stage_pending(self) -> None:
        """Prefill-ahead: while every lane is busy, prefill queued plain-path
        requests into staged single-lane states (device work interleaved
        behind the running decode windows), so that a freed lane is refilled
        by one cheap admit scatter instead of a full prompt prefill on the
        turnaround critical path."""
        cap = self.cfg.prefill_ahead
        if cap <= 0 or len(self._staged) >= cap:
            return
        if any(
            self._lane_req[lane] is None and lane not in self._lane_reserved
            for lane in range(self.cfg.num_lanes)
        ):
            return  # free lanes exist: normal admission owns the queue now
        # pace the staging dispatches: each prefill rides behind the current
        # decode window, and a burst of them would bubble the pipeline the
        # same way burst admission does (the admission-pacing lesson,
        # max_admissions_per_step) — so stage at most a couple per window.
        # Mirror _admit_pending's clamp: an explicit 0 means 1 pop/step, not
        # the unset default of 2.
        budget = (
            max(1, self.cfg.max_admissions_per_step)
            if self.cfg.max_admissions_per_step is not None
            else 2
        )
        while len(self._staged) < cap and budget > 0:
            budget -= 1
            with self._queue.mutex:  # peek FIFO head without popping
                head = self._queue.queue[0] if self._queue.queue else None
            if head is None or not self._plain_path(head):
                return  # long prompts keep their chunked/disagg routes
            with self._abort_lock:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    return
                self._pending_admit.add(req.rid)
            if not self._plain_path(req):
                # raced with abort()'s queue rebuild: a different (long)
                # request surfaced — put it back at the FRONT (preserve FIFO)
                with self._abort_lock:
                    self._pending_admit.discard(req.rid)
                with self._queue.mutex:
                    self._queue.queue.appendleft(req)
                    # appendleft bypasses Queue.put's condition protocol: wake
                    # any consumer blocked in get(timeout=...) now instead of
                    # at its timeout
                    self._queue.not_empty.notify()
                return
            try:
                self._staged.append((req, self._compute_single(req)))
            except Exception as e:  # noqa: BLE001 — isolate per-request faults
                self._fail_request(req, f"{type(e).__name__}: {e}")

    def _start_disagg(self, lane: int, req: Request, p0: int) -> None:
        """Hand an admission's prompt-prefix prefill to the disaggregated
        prefill worker: the lane is reserved, the worker computes the prefix
        rows on ITS device, and :meth:`_drain_disagg` completes the admission
        when the handoff lands (engine/disagg.py)."""
        P = len(req.input_ids)
        bucket = self._prompt_bucket(P)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :P] = req.input_ids
        self._lane_reserved.add(lane)
        self._disagg_pending += 1
        self._disagg.submit(req, lane, padded, p0)

    def _drain_disagg(self) -> None:
        """Admit finished disagg handoffs: rows are already on the decode
        device; the resume path runs one bounded suffix forward (the same
        _prefill_from_prefix the prefix cache and chunked admission use, so
        token parity is inherited from their tests)."""
        if self._disagg is None:
            return
        for res in self._disagg.poll():
            req = res.req
            self._disagg_pending -= 1
            self._lane_reserved.discard(res.lane)
            if req.rid in self._aborted:
                self._complete_aborted_admission(req)
                continue
            if res.error is not None:
                self._fail_request(req, f"disagg prefill failed: {res.error}")
                continue
            try:
                single = _prefill_from_prefix(
                    self.t_params, self.d_params, jnp.asarray(res.padded),
                    jnp.int32(len(req.input_ids)), res.kv_rows, res.taps,
                    jnp.float32(req.temperature), self._req_key(req),
                    tcfg=self.tcfg, dcfg=self.dcfg, total_len=self.total_len,
                    max_cycles=self.max_cycles, kv_quant=self.cfg.kv_quant,
                    filters=self._req_filters(req), topk_pool=self.cfg.topk_pool,
                )
                if self._prefix_cache is not None:
                    g = self.cfg.prompt_bucket
                    P0c = (res.p0 // g) * g
                    if P0c >= g:
                        from dflash_tpu.engine.prefix_cache import PrefixEntry

                        self._prefix_cache.insert(req.input_ids, PrefixEntry(
                            kv_rows=jax.tree.map(
                                lambda x: x[:, :, :P0c], res.kv_rows
                            ),
                            taps=res.taps[:, :P0c],
                        ))
                self._state = _admit(self._state, jnp.int32(res.lane), single)
                self._bind_lane(res.lane, req)
            except Exception as e:  # noqa: BLE001 — isolate per-request faults
                self._fail_request(req, f"{type(e).__name__}: {e}")

    def _start_prefill_task(self, lane: int, req: Request) -> None:
        """Begin a chunk-interleaved admission: reserve the lane, allocate a
        bucket-sized scratch cache (seeded from the prefix cache when it
        covers a chunk boundary), and let _step_prefill_tasks advance it one
        chunk per scheduling window."""
        from dflash_tpu.cache.kv import init_kv_cache, init_quant_kv_cache

        chunk = self.cfg.admission_chunk
        P = len(req.input_ids)
        bucket = self._prompt_bucket(P)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :P] = req.input_ids
        p0 = ((P - 1) // chunk) * chunk
        dtype = jax.tree.leaves(self.t_params)[0].dtype
        if dtype not in (jnp.bfloat16, jnp.float32):
            dtype = jnp.bfloat16
        scratch = (
            init_quant_kv_cache(self.tcfg, 1, bucket)
            if self.cfg.kv_quant
            else init_kv_cache(self.tcfg, 1, bucket, dtype)
        )
        taps_buf = jnp.zeros(
            (1, bucket, self.dcfg.num_taps * self.tcfg.hidden_size), dtype
        )
        c0 = 0
        if self._prefix_cache is not None:
            hit = self._prefix_cache.lookup(req.input_ids, p0)
            if hit is not None:
                n_hit, entry = hit
                n0 = (n_hit // chunk) * chunk  # chunk-align the resume point
                if n0 >= chunk:
                    rows = jax.tree.map(lambda x: x[:, :, :n0], entry.kv_rows)
                    scratch = jax.tree.map(
                        lambda buf, r: jax.lax.dynamic_update_slice(
                            buf, r.astype(buf.dtype), (0,) * buf.ndim
                        ),
                        scratch, rows,
                    )
                    taps_buf = jax.lax.dynamic_update_slice(
                        taps_buf, entry.taps[:, :n0].astype(dtype), (0, 0, 0)
                    )
                    c0 = n0
        self._lane_reserved.add(lane)
        self._prefill_tasks.append(
            _PrefillTask(req=req, lane=lane, padded=padded, scratch_kv=scratch,
                         taps_buf=taps_buf, c0=c0, p0=p0)
        )

    def _step_prefill_tasks(self) -> None:
        """Advance in-flight chunk-interleaved admissions: up to
        ``admission_chunks_per_step`` chunk forwards total per scheduling
        window (admission order), finalizing tasks whose prefix is done."""
        if not self._prefill_tasks:
            return
        budget = max(1, self.cfg.admission_chunks_per_step)
        for task in list(self._prefill_tasks):
            req = task.req
            if req.rid in self._aborted:  # dropped before admission
                self._complete_aborted_admission(req)
                self._lane_reserved.discard(task.lane)
                self._prefill_tasks.remove(task)
                continue
            if budget <= 0:
                break
            try:
                C = self.cfg.admission_chunk
                while budget > 0 and task.c0 < task.p0:
                    ids_c = jnp.asarray(task.padded[:, task.c0:task.c0 + C])
                    task.scratch_kv, task.taps_buf = _prefill_chunk(
                        self.t_params, task.scratch_kv, task.taps_buf, ids_c,
                        jnp.int32(task.c0), tcfg=self.tcfg,
                        tap_ids=self.dcfg.target_layer_ids,
                    )
                    task.c0 += C
                    budget -= 1
                if task.c0 >= task.p0:
                    self._finalize_prefill_task(task)
                    self._prefill_tasks.remove(task)
            except Exception as e:  # noqa: BLE001 — isolate per-request faults
                self._fail_request(req, f"{type(e).__name__}: {e}")
                self._lane_reserved.discard(task.lane)
                self._prefill_tasks.remove(task)

    def _finalize_prefill_task(self, task: _PrefillTask) -> None:
        """Prefix rows complete: admit via the prefix-resume path (one
        bounded suffix forward, token parity pinned by the prefix-cache
        tests) and publish the prefix to the cache."""
        req = task.req
        P = len(req.input_ids)
        rows = jax.tree.map(lambda x: x[:, :, :task.p0], task.scratch_kv)
        taps = task.taps_buf[:, :task.p0]
        single = _prefill_from_prefix(
            self.t_params, self.d_params, jnp.asarray(task.padded),
            jnp.int32(P), rows, taps,
            jnp.float32(req.temperature), self._req_key(req),
            tcfg=self.tcfg, dcfg=self.dcfg, total_len=self.total_len,
            max_cycles=self.max_cycles, kv_quant=self.cfg.kv_quant,
            filters=self._req_filters(req), topk_pool=self.cfg.topk_pool,
        )
        if self._prefix_cache is not None:
            g = self.cfg.prompt_bucket
            P0c = (task.p0 // g) * g
            if P0c >= g:
                from dflash_tpu.engine.prefix_cache import PrefixEntry

                self._prefix_cache.insert(req.input_ids, PrefixEntry(
                    kv_rows=jax.tree.map(
                        lambda x: x[:, :, :P0c], task.scratch_kv
                    ),
                    taps=task.taps_buf[:, :P0c],
                ))
        self._state = _admit(self._state, jnp.int32(task.lane), single)
        self._lane_reserved.discard(task.lane)
        self._bind_lane(task.lane, req)

    def _retire_finished(self) -> None:
        """Sync-mode retire: the live state through the shared harvest path
        (one bulk transfer per array, not per lane)."""
        st = self._state
        self._harvest((
            (st.start, st.done, st.cycle_idx, st.output_ids, st.acc_trace),
            self._lane_epoch.copy(),
        ))

    def _committed_gen(self, lane: int, req: Request, start_l: int,
                       out_row: np.ndarray) -> np.ndarray:
        """Committed generated tokens so far: region [P, start] inclusive —
        position start holds the bonus token, committed and stable across
        cycles — mask-stripped, truncated at the first engine stop token."""
        P = int(self._lane_prompt_len[lane])
        end = min(start_l + 1, P + req.max_new_tokens)
        gen = out_row[0, P:end]
        gen = gen[gen != self.dcfg.mask_token_id]
        if self.cfg.stop_token_ids:
            hits = np.nonzero(np.isin(gen, list(self.cfg.stop_token_ids)))[0]
            if hits.size > 0:
                gen = gen[: hits[0] + 1]
        return gen

    def _service_lane(self, lane: int, req: Request, start_l: int,
                      out_row: np.ndarray, n_cycles: int,
                      acc: np.ndarray) -> bool:
        """Per-window service for a streaming / stop-string lane: push newly
        committed tokens, scan for stop-string hits.  Returns True when the
        lane was force-finished on a stop match."""
        gen = self._committed_gen(lane, req, start_l, out_row)
        if req.stop_strings:
            cut, matched = self._find_stop_cut(req, gen)
            if cut is not None:
                gen = gen[:cut]
                self._push_stream(req, gen)
                seq = np.concatenate([req.input_ids, gen]).astype(np.int32)
                self._complete(lane, req, seq, n_cycles, acc,
                               {"type": "stop", "matched": matched})
                return True
        self._push_stream(req, gen)
        return False

    def _find_stop_cut(self, req: Request, gen: np.ndarray):
        """(token_count, matched_string) for the earliest stop-string match in
        the decoded generation, or (None, None).  The returned count is the
        smallest prefix whose decoding contains the match — the boundary token
        is kept (token ids are not re-segmented; the server truncates the
        *text* at the match, which is the user-visible SGLang behavior).

        Incremental: each window decodes only the NEW tokens plus a
        max-stop-length overlap (``req.scanned_tokens`` tracks the clean
        frontier), and a hit binary-searches the exact cut — O(log n) prefix
        decodes instead of one per prefix.  The committed generation is
        append-only, so "a stop appears in decode(gen[:n])" is monotone in n."""
        total = len(gen)
        if total == 0:
            return None, None
        dec = lambda n: self.tokenizer.decode(gen[:n], skip_special_tokens=True)
        hit = lambda text: any(s in text for s in req.stop_strings)
        # Overlap re-covers a stop spanning the window boundary: a stop of L
        # chars spans at most L 1-char tokens, +4 tokens of margin for byte-
        # level tokens that decode to partial/empty pieces.
        max_stop = max(len(s) for s in req.stop_strings)
        lo = max(0, min(req.scanned_tokens, total) - (max_stop + 4))
        tail = self.tokenizer.decode(gen[lo:], skip_special_tokens=True)
        req.scanned_tokens = total
        if not hit(tail):
            return None, None
        if not hit(dec(total)):
            return None, None  # tail-only decode artifact, not a real match
        # invariant: not hit(dec(lo)), hit(dec(hi)); previous windows scanned
        # [0, lo) clean — if a decode-boundary artifact breaks that, restart
        # from 0 (hit(dec(0)) is False: stops are non-empty)
        if lo > 0 and hit(dec(lo)):
            lo = 0
        hi = total
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if hit(dec(mid)):
                hi = mid
            else:
                lo = mid
        text = dec(hi)
        matched = min((s for s in req.stop_strings if s in text), key=text.index)
        return hi, matched

    @staticmethod
    def _push_stream(req: Request, gen: np.ndarray) -> None:
        if req.stream_queue is None:
            return
        new = gen[req.streamed:]
        if new.size:
            req.stream_queue.put(
                {"token_ids": np.asarray(new).tolist(), "finished": False}
            )
            req.streamed += int(new.size)

    def _finish(self, lane: int, req: Request, out: np.ndarray,
                n_cycles: int, acc: np.ndarray) -> None:
        P = int(self._lane_prompt_len[lane])
        max_length = P + req.max_new_tokens
        seq = out[0, :max_length]
        # strip masks from the GENERATED region only (a prompt may contain
        # the mask token id legitimately)
        gen = seq[P:]
        gen = gen[gen != self.dcfg.mask_token_id]
        finish_reason: dict = {"type": "length", "length": req.max_new_tokens}
        if self.cfg.stop_token_ids:
            hits = np.nonzero(np.isin(gen, list(self.cfg.stop_token_ids)))[0]
            if hits.size > 0:
                gen = gen[: hits[0] + 1]
                finish_reason = {"type": "stop"}
        seq = np.concatenate([seq[:P], gen])
        self._complete(lane, req, seq, n_cycles, acc, finish_reason)

    def _complete(self, lane: int, req: Request, seq: np.ndarray,
                  n_cycles: int, acc: np.ndarray, finish_reason: dict) -> None:
        P = int(self._lane_prompt_len[lane])
        req.output_ids = seq[None, :]
        req.meta_info = {
            "prompt_tokens": P,
            "completion_tokens": int(seq.shape[0] - P),
            "spec_verify_ct": n_cycles,
            "spec_accept_length": float(acc.mean()) if n_cycles else 0.0,
            "e2e_latency_s": time.perf_counter() - req.submitted_at,
            "finish_reason": finish_reason,
        }
        if n_cycles:
            # refine the tokens-per-cycle estimate driving adaptive windows
            self._tau_est = 0.7 * self._tau_est + 0.3 * float(acc.mean())
        self.completed[req.rid] = req
        self._lane_req[lane] = None
        # mark lane idle so the next cycle's freeze logic sees it done
        self._state = self._state._replace(done=self._state.done.at[lane].set(True))
        if req.stream_queue is not None:
            tail = seq[P + req.streamed:]
            req.streamed += int(tail.size)
            req.stream_queue.put({
                "token_ids": np.asarray(tail).tolist(),
                "finished": True,
                "meta_info": req.meta_info,
            })
        req.done_event.set()

    def run_until_drained(self, max_steps: int = 100_000) -> None:
        for _ in range(max_steps):
            active = self.step()
            if (
                active == 0
                and not self._peek_pending
                and self._queue.empty()
                and not self._prefill_tasks
                and self._disagg_pending == 0
                and all(r is None for r in self._lane_req)
            ):
                return
        raise RuntimeError("run_until_drained exceeded max_steps")

    # -- background serving loop -------------------------------------------

    def start(self) -> None:
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=30)

    def _loop(self) -> None:
        while self._running:
            with self._lock:
                active = self.step()
            if active == 0:
                try:
                    req = self._queue.get(timeout=0.05)
                    self._queue.put(req)
                except queue.Empty:
                    continue

    def flush(self) -> None:
        """Drop all idle state (the /flush_cache equivalent)."""
        with self._lock:
            if (
                any(r is not None for r in self._lane_req)
                or self._prefill_tasks
                or self._disagg_pending
                or self._staged
            ):
                raise RuntimeError("cannot flush with active requests")
            self._peek_pending.clear()
            self._last_start_host = None
            self._state = self._empty_state(self.cfg.num_lanes)
            if self._prefix_cache is not None:
                self._prefix_cache.clear()


# ---------------------------------------------------------------------------
# Bucket ladder: per-request total_len right-sizing
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BucketSpec:
    """One rung of the ladder: lanes sized for requests up to
    prompt_cap + max_new_tokens tokens."""

    prompt_cap: int
    max_new_tokens: int
    num_lanes: int


class BucketedEngine:
    """A ladder of engine pools with tightly sized token/KV buffers.

    The measured-best answer to long-context decode traffic on TPU is NOT
    bounding cache reads (both the bucketed-read and Pallas frontier-bounded
    attention lost to XLA's masked full-buffer read, docs/RESULTS.md) but
    sizing ``total_len`` itself per request.  A single engine must size every
    lane for the worst case; the ladder routes each request to the smallest
    pool whose (prompt_cap, max_new_tokens) fits it, so short requests decode
    against short KV buffers.  All pools alias the same parameter pytrees —
    the only extra memory is the per-pool lane state.
    """

    def __init__(self, tcfg: ModelConfig, dcfg: DraftConfig, t_params, d_params,
                 cfg: EngineConfig, buckets: List[BucketSpec], tokenizer=None):
        import dataclasses

        if not buckets:
            raise ValueError("need at least one BucketSpec")
        self.buckets = sorted(
            buckets, key=lambda b: b.prompt_cap + b.max_new_tokens
        )
        self.pools = [
            ContinuousBatchingEngine(
                tcfg, dcfg, t_params, d_params,
                dataclasses.replace(
                    cfg, num_lanes=b.num_lanes, prompt_cap=b.prompt_cap,
                    max_new_tokens=b.max_new_tokens, prefix_cache_mb=0,
                ),
                tokenizer=tokenizer,
            )
            for b in self.buckets
        ]
        # ONE prefix cache shared across rungs: entries are sliced to
        # prompt_bucket boundaries (PrefixEntry.truncated), so a prefix
        # prefilled in one pool resumes admissions in every pool — a mixed-
        # length workload pays for a shared system prompt once, and the flag
        # stays the total device-memory bound.
        self._prefix_cache = None
        if cfg.prefix_cache_mb > 0:
            from dflash_tpu.engine.prefix_cache import PrefixCache

            self._prefix_cache = PrefixCache(
                cfg.prefix_cache_mb * (1 << 20), cfg.prompt_bucket
            )
            for p in self.pools:
                p._prefix_cache = self._prefix_cache
        # one request-id space across pools (completed dict merges by rid)
        shared_rid = itertools.count()
        for p in self.pools:
            p._rid = shared_rid

    def _route(self, prompt_len: int, max_new: int) -> ContinuousBatchingEngine:
        for b, pool in zip(self.buckets, self.pools):
            if prompt_len <= b.prompt_cap and max_new <= b.max_new_tokens:
                return pool
        raise ValueError(
            f"request (prompt {prompt_len}, max_new {max_new}) exceeds every "
            f"bucket; largest is {self.buckets[-1]}"
        )

    def submit(self, input_ids: np.ndarray, max_new_tokens: Optional[int] = None,
               temperature: Optional[float] = None, top_k: int = 0,
               top_p: float = 1.0, stop: Optional[Sequence[str]] = None,
               stream: bool = False, seed: Optional[int] = None) -> Request:
        ids = np.asarray(input_ids).reshape(-1)
        biggest = self.pools[-1]
        max_new = min(
            max_new_tokens or biggest.cfg.max_new_tokens,
            biggest.cfg.max_new_tokens,
        )
        pool = self._route(ids.shape[0], max_new)
        return pool.submit(ids, max_new_tokens=max_new, temperature=temperature,
                           top_k=top_k, top_p=top_p, stop=stop, stream=stream,
                           seed=seed)

    def abort(self, rid: int) -> bool:
        # rids are unique across pools (shared counter), so at most one hits
        return any(p.abort(rid) for p in self.pools)

    def step(self) -> int:
        return sum(p.step() for p in self.pools)

    def run_until_drained(self, max_steps: int = 100_000) -> None:
        # Round-robin across pools (NOT pool 0 to empty while pool 1 idles):
        # every pool advances one scheduling window per pass, so a mixed-
        # length workload keeps all rungs' lanes busy concurrently.
        for _ in range(max_steps):
            busy = False
            for p in self.pools:
                active = p.step()
                busy |= bool(
                    active
                    or bool(p._peek_pending)
                    or not p._queue.empty()
                    or p._prefill_tasks
                    or p._disagg_pending
                    or any(r is not None for r in p._lane_req)
                )
            if not busy:
                return
        raise RuntimeError("run_until_drained exceeded max_steps")

    def start(self) -> None:
        for p in self.pools:
            p.start()

    def stop(self) -> None:
        for p in self.pools:
            p.stop()

    def flush(self) -> None:
        for p in self.pools:
            p.flush()

    @property
    def completed(self) -> Dict[int, Request]:
        out: Dict[int, Request] = {}
        for p in self.pools:
            out.update(p.completed)
        return out
