"""Collective/compute overlap evidence from real-TPU-topology AOT schedules.

The multi-chip story must show not just that the sharded programs compile,
but that the collectives the shardings imply actually HIDE behind compute
(SURVEY §2.3 item 6; BASELINE.md north star "collectives overlapped with
verify matmuls").  No multi-chip hardware is reachable here — but XLA can
AOT-compile for a named TPU topology (``jax.experimental.topologies``), and
the resulting optimized HLO is SCHEDULED: instruction order is execution
order, async collectives appear as start/done pairs (``AsyncCollectiveStart``
/ ``AsyncCollectiveDone`` custom-calls from TPU async collective fusion, and
``collective-permute-start``/``-done``), and whatever is listed between a
start and its done runs concurrently with the transfer.

``collective_overlap_report`` parses that schedule and counts, for every
async pair, the compute ops (fusions / dots) scheduled inside the window —
the direct evidence that the tp all-gathers ride under the verify matmuls.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np


def topology_mesh(shape: dict, topology: str = "v5e:2x4"):
    """A Mesh over a named TPU topology's virtual devices (no hardware
    needed; compilation behaves exactly as on a real slice)."""
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh

    topo = topologies.get_topology_desc(topology, "tpu")
    names = tuple(shape.keys())
    dims = tuple(shape.values())
    n = int(np.prod(dims))
    if n != len(topo.devices):
        raise ValueError(f"mesh {shape} needs {n} devices; {topology} has "
                         f"{len(topo.devices)}")
    return Mesh(np.asarray(topo.devices).reshape(dims), names)


def _computations(hlo: str):
    """Split scheduled HLO text into (name, body_lines) computations."""
    comps = []
    name, body = None, []
    for ln in hlo.splitlines():
        m = re.match(r"(?:ENTRY )?%?([\w.\-]+)\s*\(.*\)\s*->.*\{", ln)
        if m:
            if name is not None:
                comps.append((name, body))
            name, body = m.group(1), []
        elif name is not None:
            if ln.strip() == "}":
                comps.append((name, body))
                name, body = None, []
            else:
                body.append(ln)
    if name is not None:
        comps.append((name, body))
    return comps


_COMPUTE = re.compile(r"= \S+ (fusion|dot|convolution)\(")


def collective_overlap_report(hlo_text: str) -> dict:
    """Parse a scheduled TPU HLO module for async-collective overlap.

    Returns counts of async start/done pairs and, per pair, how many compute
    ops (fusions/dots) the scheduler placed inside the in-flight window.
    """
    comps = _computations(hlo_text)
    # fusion computations that contain async start/done custom-calls
    start_comps, done_comps = set(), set()
    for name, body in comps:
        text = "\n".join(body)
        if 'custom_call_target="AsyncCollectiveStart"' in text:
            start_comps.add(name)
        if 'custom_call_target="AsyncCollectiveDone"' in text:
            done_comps.add(name)

    pairs = []
    for name, body in comps:
        opens = []  # (line_idx, kind)
        for i, ln in enumerate(body):
            called = re.search(r"(?:fusion|call)\(.*calls=%?([\w.\-]+)", ln)
            is_start = (
                "collective-permute-start" in ln
                or "-gather-start" in ln
                or "-reduce-start" in ln
                or (called and called.group(1) in start_comps)
            )
            is_done = (
                "collective-permute-done" in ln
                or "-gather-done" in ln
                or "-reduce-done" in ln
                or (called and called.group(1) in done_comps)
            )
            if is_start and not is_done:
                opens.append(i)
            elif is_done and opens:
                j = opens.pop(0)
                window = body[j + 1:i]
                n_compute = sum(1 for w in window if _COMPUTE.search(w))
                pairs.append({
                    "computation": name,
                    "window_ops": len(window),
                    "compute_ops_in_flight": n_compute,
                })
    overlapped = [q for q in pairs if q["compute_ops_in_flight"] > 0]
    # collectives ASYNC-FUSED into a surrounding fusion: the DMA runs
    # between flag_start and flag_end of the fused loop — overlap happens
    # inside the fusion rather than across scheduled instructions
    async_fused = len(re.findall(
        r'"async_collective_fusion_config":\{"flag_start":"(?!-1")', hlo_text
    ))
    return {
        "async_pairs": len(pairs),
        "overlapped_pairs": len(overlapped),
        "max_compute_in_flight": max(
            (q["compute_ops_in_flight"] for q in pairs), default=0
        ),
        "async_fusion_computations": len(start_comps),
        "async_fused_collectives": async_fused,
        "sync_all_gathers": len(re.findall(
            r"= \S+ all-gather\((?![^)]*start)", hlo_text
        )),
        "pairs": pairs,
    }


def compile_and_report(tcfg, mesh_shape: dict, topology: str = "v5e:2x4",
                       kv_quant: bool = True,
                       compiler_options: Optional[dict] = None) -> dict:
    """AOT-compile the batched spec-decode cycle of ``tcfg`` for a real TPU
    topology and return the overlap report (plus the compiled object's memory
    analysis when available)."""
    import jax

    from dflash_tpu.parallel.aot import compile_full_scale_cycle

    mesh = topology_mesh(mesh_shape, topology)
    dp = mesh_shape.get("dp", 1)
    _, _, compiled = compile_full_scale_cycle(tcfg, mesh, dp=dp,
                                              kv_quant=kv_quant)
    report = collective_overlap_report(compiled.as_text())
    try:
        mem = compiled.memory_analysis()
        report["argument_bytes_per_device"] = int(mem.argument_size_in_bytes)
        report["temp_bytes_per_device"] = int(mem.temp_size_in_bytes)
    except Exception:  # noqa: BLE001 — memory analysis is best-effort
        pass
    return report
