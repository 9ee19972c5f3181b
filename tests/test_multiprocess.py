"""Multi-process harness actually executed: two coordinator-connected CPU
processes run ``dist.init`` + object collectives + the rank-strided benchmark
CLI end-to-end (the reference's DP path runs under torchrun,
reference run_benchmark.sh:121-131 + distributed.py:18-83; ours must run
too, not just no-op single-process)."""

import os
import socket
import subprocess
import sys
from pathlib import Path


REPO = Path(__file__).resolve().parent.parent

WORKER = """
import os
import jax
jax.config.update("jax_platforms", "cpu")
from dflash_tpu.parallel import dist

dist.init()
assert dist.size() == 2, dist.size()
rows = [{"rank": dist.rank(), "idx": i} for i in range(dist.rank(), 7, dist.size())]
gathered = dist.all_gather_object(rows)
flat = sorted(r["idx"] for part in gathered for r in part)
assert flat == list(range(7)), flat
got = dist.gather_object(rows, dst=0)
if dist.is_main():
    assert got is not None and len(got) == 2
    print("MPOK world=%d rows=%s" % (dist.size(), flat), flush=True)
else:
    assert got is None
dist.barrier("test-exit")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(script_args, port, pid, extra_env=None):
    env = {
        **os.environ,
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": "2",
        "JAX_PROCESS_ID": str(pid),
        "JAX_PLATFORMS": "cpu",
        # one device per process keeps the virtual topology simple
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PYTHONPATH": f"{REPO}{os.pathsep}" + os.environ.get("PYTHONPATH", ""),
        **(extra_env or {}),
    }
    return subprocess.Popen(
        [sys.executable, *script_args],
        env=env, cwd=str(REPO),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def test_two_process_object_collectives(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    procs = [_spawn([str(script)], port, pid) for pid in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), "\n===\n".join(outs)
    assert "MPOK world=2 rows=[0, 1, 2, 3, 4, 5, 6]" in outs[0]


def test_two_process_benchmark_cli(tmp_path):
    """The full CLI under a 2-process launch: rank-strided prompts, gathered
    metrics printed by rank 0 only (reference benchmark.py:445, 539-551)."""
    port = _free_port()
    args = [
        "-m", "dflash_tpu.bench.cli",
        "--model-name-or-path", "tiny", "--synthetic-data",
        "--max-samples", "4", "--max-new-tokens", "8",
        "--skip-baseline", "--dataset", "gsm8k",
        "--save-outputs-path",
    ]
    procs = [
        _spawn(args + [str(tmp_path / f"out{pid}.jsonl")], port, pid)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), "\n===\n".join(outs)
    # rank 0 prints the gathered metrics (4 samples from both ranks)
    assert "Hardware World Size: 2" in outs[0]
    assert "Speculative tokens_per_sec:" in outs[0]
    # rank 1 returns after the gather without printing metric lines
    assert "Hardware World Size" not in outs[1]
    # rank 0's JSONL holds ALL samples (both ranks' rows, gathered)
    import json

    rows = [json.loads(l) for l in (tmp_path / "out0.jsonl").read_text().splitlines()]
    assert sorted(r["dataset_row_idx"] for r in rows) == [0, 1, 2, 3]
    assert {r["rank"] for r in rows} == {0, 1}
