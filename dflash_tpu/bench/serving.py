"""Serving benchmark: concurrency sweep against the HTTP engine.

TPU-native equivalent of reference benchmark_sglang.py: launches the engine
server (in-process or against a running URL), sweeps client concurrency
(default 1/4/8/16/32, reference :379-380), drives `/generate` with a
ThreadPool (reference :180-201), collects ``meta_info`` acceptance stats,
sanity-checks that speculation actually ran (``spec_verify_ct_sum > 0``,
reference :206-210), and emits a markdown report (reference :489-564).

Run ``python -m dflash_tpu.bench.serving --help``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class BenchMetrics:
    concurrency: int
    n_requests: int
    wall_s: float
    completion_tokens: int
    spec_verify_ct_sum: int
    accept_lengths: List[float] = field(default_factory=list)

    @property
    def tokens_per_sec(self) -> float:
        return self.completion_tokens / max(self.wall_s, 1e-9)

    @property
    def mean_accept_length(self) -> float:
        xs = [a for a in self.accept_lengths if a > 0]
        return sum(xs) / len(xs) if xs else 0.0


def _post(url: str, payload: dict, timeout: float = 1800.0) -> dict:
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _flush(url: str) -> None:
    req = urllib.request.Request(url + "/flush_cache", data=b"{}", method="POST")
    try:
        urllib.request.urlopen(req, timeout=30).read()
    except Exception:
        pass


def _consume_sse(url: str, payload: dict) -> dict:
    """POST a streaming /generate and consume the SSE events; returns the
    final chunk's body (same shape as the non-stream response)."""
    import json as _json

    req = urllib.request.Request(
        url + "/generate", _json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    last = None
    with urllib.request.urlopen(req, timeout=1800) as resp:
        for raw in resp:
            line = raw.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                last = _json.loads(line[6:])
    assert last is not None, "no SSE chunks received"
    return last


def run_bench_requests(
    url: str,
    prompts: List[List[int]],
    concurrency: int,
    max_new_tokens: int,
    temperature: float = 0.0,
    stream: bool = False,
    top_k: int = 0,
    top_p: float = 1.0,
) -> BenchMetrics:
    def one(ids):
        payload = {
            "input_ids": ids,
            "sampling_params": {
                "max_new_tokens": max_new_tokens,
                "temperature": temperature,
                "top_k": top_k,
                "top_p": top_p,
            },
        }
        if stream:
            payload["stream"] = True
            return _consume_sse(url, payload)
        return _post(url, payload)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=concurrency) as pool:
        results = list(pool.map(one, prompts))
    wall = time.perf_counter() - t0

    m = BenchMetrics(
        concurrency=concurrency, n_requests=len(prompts), wall_s=wall,
        completion_tokens=sum(r["meta_info"]["completion_tokens"] for r in results),
        spec_verify_ct_sum=sum(r["meta_info"]["spec_verify_ct"] for r in results),
        accept_lengths=[r["meta_info"]["spec_accept_length"] for r in results],
    )
    return m


def markdown_report(rows: List[BenchMetrics], title: str) -> str:
    lines = [
        f"## {title}",
        "",
        "| concurrency | requests | wall (s) | tokens/s | mean accept len | verify ct |",
        "|---|---|---|---|---|---|",
    ]
    for m in rows:
        lines.append(
            f"| {m.concurrency} | {m.n_requests} | {m.wall_s:.2f} | "
            f"{m.tokens_per_sec:.1f} | {m.mean_accept_length:.2f} | {m.spec_verify_ct_sum} |"
        )
    return "\n".join(lines)



def _honor_jax_platforms_env() -> None:
    """Re-assert JAX_PLATFORMS even when a sitecustomize-registered PJRT
    plugin already overrode jax.config programmatically."""
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass


def main(argv=None) -> None:
    _honor_jax_platforms_env()
    from dflash_tpu.core.jaxcache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    p = argparse.ArgumentParser(description="Serving concurrency benchmark")
    p.add_argument("--url", default=None,
                   help="Benchmark a running server; default launches in-process.")
    p.add_argument("--model-name-or-path", default="tiny")
    p.add_argument("--draft-name-or-path", default="auto:1")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--num-lanes", type=int, default=8)
    p.add_argument("--concurrencies", default="1,4,8")
    p.add_argument("--num-requests", type=int, default=16)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--prompt-cap", type=int, default=128)
    p.add_argument("--block-size", type=int, default=None)
    p.add_argument("--quant", default="", choices=["", "int8"],
                   help="INT8 weight-only quantization for the in-process engine")
    p.add_argument("--kv-quant", action="store_true", help="int8 KV cache")
    p.add_argument("--prefix-cache-mb", type=int, default=0)
    p.add_argument("--shared-prefix-len", type=int, default=0,
                   help="length of a system-prompt prefix shared by all "
                        "requests (exercises the prefix cache)")
    p.add_argument("--steps-per-sync", type=int, default=4,
                   help="decode cycles per device dispatch (engine default; "
                        "round-4 A/B: 4 beats 2 with the two-part verify)")
    p.add_argument("--emulate-tau", type=float, default=None,
                   help="benchmark-only acceptance override (mean tau)")
    p.add_argument("--report-path", default=None)
    p.add_argument("--stream", action="store_true",
                   help="drive /generate with \"stream\": true and consume the\n"
                        "SSE events (measures the streaming tax)")
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top-k", type=int, default=0,
                   help="per-request top_k (needs --sampling-filters)")
    p.add_argument("--top-p", type=float, default=1.0,
                   help="per-request top_p (needs --sampling-filters)")
    p.add_argument("--sampling-filters", action="store_true",
                   help="build the engine with the exact filtered sampler")
    p.add_argument("--topk-pool", type=int, default=64)
    p.add_argument("--stream-interval", type=int, default=4,
                   help="engine service cadence for streaming/stop lanes "
                        "(windows between output readbacks; 1 = every window)")
    p.add_argument("--prefill-ahead", type=int, default=0,
                   help="stage up to N plain-path admission prefills while "
                        "all lanes are busy (speculative pre-admission)")
    p.add_argument("--admission-chunk", type=int, default=None,
                   help="chunk-interleaved admission prefill (tokens per "
                        "chunk); unset = one-dispatch admission prefill")
    p.add_argument("--disagg", action="store_true",
                   help="disaggregated prefill/decode: admission prefix "
                        "prefill runs on jax.devices()[1] (falls back to "
                        "device 0 when only one chip is visible — measures "
                        "the handoff overhead) and ships (kv_rows, taps) to "
                        "the decode engine")
    p.add_argument("--vocab-size", type=int, default=1000,
                   help="prompt-id range when benchmarking an external --url "
                        "server (must not exceed the served model's vocab)")
    args = p.parse_args(argv)

    import numpy as np

    server = None
    url = args.url
    if url is None:
        from dflash_tpu.bench.cli import _resolve_models
        from dflash_tpu.bench.tokenizer import SyntheticTokenizer
        from dflash_tpu.engine import ContinuousBatchingEngine, EngineConfig
        from dflash_tpu.engine.server import EngineHTTPServer

        tcfg, dcfg, t_params, d_params = _resolve_models(args)  # honors --quant
        worker = None
        if args.disagg:
            import jax

            from dflash_tpu.engine import PrefillWorker

            devs = jax.devices()
            worker = PrefillWorker(
                tcfg, dcfg, t_params,
                prefill_device=devs[1] if len(devs) > 1 else devs[0],
                decode_device=devs[0], kv_quant=args.kv_quant,
            )
        engine = ContinuousBatchingEngine(
            tcfg, dcfg, t_params, d_params,
            prefill_worker=worker,
            cfg=EngineConfig(
                num_lanes=args.num_lanes,
                max_new_tokens=args.max_new_tokens,
                block_size=args.block_size or dcfg.block_size,
                prompt_cap=args.prompt_cap,
                kv_quant=args.kv_quant,
                steps_per_sync=args.steps_per_sync,
                prefix_cache_mb=args.prefix_cache_mb,
                emulate_tau=args.emulate_tau,
                stream_interval=args.stream_interval,
                admission_chunk=args.admission_chunk,
                prefill_ahead=args.prefill_ahead,
                temperature=args.temperature,
                sampling_filters=args.sampling_filters,
                topk_pool=args.topk_pool,
            ),
        )
        server = EngineHTTPServer(
            engine, port=0, tokenizer=SyntheticTokenizer(tcfg.vocab_size)
        )
        server.start()
        url = f"http://{server.host}:{server.port}"
        vocab = tcfg.vocab_size
    else:
        # external server: its vocab is unknowable from here — take it as a
        # flag so prompt ids stay in range (out-of-range ids clamp to the
        # last embedding row on-device, degenerating the benchmark's inputs)
        vocab = args.vocab_size

    if args.shared_prefix_len >= args.prompt_len:
        raise SystemExit(
            f"--shared-prefix-len {args.shared_prefix_len} must be < "
            f"--prompt-len {args.prompt_len} (each request needs its own tail)"
        )
    rng = np.random.default_rng(0)
    # Shared "system prompt" prefix + per-request tail — the chat-serving
    # shape the prompt-prefix cache targets (reference serves this via
    # SGLang's radix cache).  shared_prefix_len=0 keeps prompts independent.
    # Total length is exactly prompt_len in both cases.
    shared = rng.integers(10, vocab - 10, size=(args.shared_prefix_len,)).tolist()
    tail = args.prompt_len - args.shared_prefix_len
    prompts = [
        shared + rng.integers(10, vocab - 10, size=(tail,)).tolist()
        for _ in range(args.num_requests)
    ]

    rows = []
    try:
        # warmup (compiles the lane executables)
        run_bench_requests(url, prompts[:2], 2, args.max_new_tokens,
                           temperature=args.temperature, stream=args.stream,
                           top_k=args.top_k, top_p=args.top_p)
        for conc in (int(c) for c in args.concurrencies.split(",")):
            _flush(url)
            m = run_bench_requests(url, prompts, conc, args.max_new_tokens,
                                   temperature=args.temperature,
                                   stream=args.stream,
                                   top_k=args.top_k, top_p=args.top_p)
            if m.spec_verify_ct_sum <= 0:
                raise RuntimeError("speculative decoding did not run (verify_ct == 0)")
            print(f"[serving] conc={conc}: {m.tokens_per_sec:.1f} tok/s, "
                  f"accept_len={m.mean_accept_length:.2f}", file=sys.stderr, flush=True)
            rows.append(m)
    finally:
        if server is not None:
            server.stop()

    report = markdown_report(rows, f"dflash_tpu serving ({args.model_name_or_path})")
    print(report)
    if args.report_path:
        with open(args.report_path, "w") as f:
            f.write(report + "\n")


if __name__ == "__main__":
    main()
