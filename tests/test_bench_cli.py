"""Benchmark CLIs emit the reference's canonical metric lines.

The bash sweep launchers grep these exact line prefixes out of stdout
(reference run_block_sweep.sh:199-256), so the printed vocabulary is part of
the API surface.
"""

import json

import pytest


def test_cli_vanilla_metric_lines(capsys, tmp_path):
    from dflash_tpu.bench.cli import main

    out_path = tmp_path / "outputs.jsonl"
    main([
        "--model-name-or-path", "tiny", "--synthetic-data",
        "--max-samples", "1", "--max-new-tokens", "16", "--prompt-cap", "128",
        "--block-size", "4",
        "--save-outputs-path", str(out_path),
    ])
    out = capsys.readouterr().out
    for prefix in (
        "Baseline TPOT:", "Speculative TPOT:", "Speculative tokens_per_sec:",
        "Decoding speedup:", "Average Acceptance length:",
        "Acceptance length histogram:", "Hardware Device:",
    ):
        assert prefix in out, f"missing metric line {prefix!r}"
    rows = [json.loads(l) for l in out_path.read_text().splitlines()]
    assert rows and rows[0]["speculative"]["num_output_tokens"] > 0


def test_cli_block_size_one_dedups_to_baseline(capsys):
    """--block-size 1 must mirror the reference's candidate dedup
    (benchmark.py:456-457, dict.fromkeys([1, block_size])): ONE degenerate AR
    run serves as both baseline and spec, so the printed speedup is exactly
    1.00 (previously the spec run overwrote the baseline entry)."""
    from dflash_tpu.bench.cli import main

    main([
        "--model-name-or-path", "tiny", "--synthetic-data",
        "--max-samples", "1", "--max-new-tokens", "16", "--prompt-cap", "128",
        "--block-size", "1",
    ])
    out = capsys.readouterr().out
    base = next(l for l in out.splitlines() if l.startswith("Baseline TPOT:"))
    spec = next(l for l in out.splitlines() if l.startswith("Speculative TPOT:"))
    assert base.split(":")[1].strip() == spec.split(":")[1].strip()
    assert "Decoding speedup: 1.00" in out


def test_multi_block_shared_baseline(capsys, tmp_path):
    """Reference benchmark_multi_block.py:305-337 semantics: one shared bs=1
    baseline, per-block [bs=N] metric lines, summary CSV."""
    from dflash_tpu.bench.multi_block import main

    csv_path = tmp_path / "summary.csv"
    main([
        "--model-name-or-path", "tiny", "--synthetic-data",
        "--max-samples", "1", "--max-new-tokens", "16", "--prompt-cap", "128",
        "--block-sizes", "4,8,1",  # bs=1 must be filtered (baseline covers it)
        "--save-summary-path", str(csv_path),
    ])
    out = capsys.readouterr().out
    assert "Baseline TPOT:" in out
    for bs in (4, 8):
        assert f"[bs={bs}] Speculative TPOT:" in out
        assert f"[bs={bs}] Decoding speedup:" in out
        assert f"[bs={bs}] Average Acceptance length:" in out
    assert "[bs=1]" not in out
    lines = csv_path.read_text().splitlines()
    assert lines[0].startswith("dataset,max_samples,block_size,")
    assert len(lines) == 3  # header + one row per block size


def test_multi_block_parse_block_sizes():
    from dflash_tpu.bench.multi_block import parse_block_sizes

    assert parse_block_sizes("8, 12,16,8") == [8, 12, 16]
    with pytest.raises(ValueError):
        parse_block_sizes("0,4")
    with pytest.raises(ValueError):
        parse_block_sizes(",")


def test_tau_for_block_follows_reference_curve():
    from dflash_tpu.bench.cli import make_forced_acc_by_bs, tau_for_block

    # At tau16 == the reference's own 7.67 the curve is reproduced verbatim.
    assert abs(tau_for_block(16, 7.67) - 7.67) < 1e-9
    assert abs(tau_for_block(8, 7.67) - 5.46) < 1e-9
    # Rescaled: tau(B) ratios preserved, clamped to [1, B].
    assert abs(tau_for_block(16, 7.48) - 7.48) < 1e-9
    assert tau_for_block(4, 7.48) <= 4.0
    # Interpolation between sweep points is monotone there.
    assert 5.46 < tau_for_block(10, 7.67) < 6.80
    by_bs = make_forced_acc_by_bs(512, (8, 12, 16), 7.48, seed=0)
    for bs, arr in by_bs.items():
        assert arr.shape == (512,)
        mean_tau = float(arr.mean()) + 1.0
        assert abs(mean_tau - tau_for_block(bs, 7.48)) < 0.15, (bs, mean_tau)


def test_cli_batched_lanes_mode(capsys, tmp_path):
    """--num-lanes > 1 routes prompts through the continuous-batching engine
    (reference benchmark_batched.py parity, with a genuinely batched forward)."""
    from dflash_tpu.bench.cli import main

    out_path = tmp_path / "batched.jsonl"
    main([
        "--model-name-or-path", "tiny", "--synthetic-data",
        "--max-samples", "3", "--max-new-tokens", "16", "--prompt-cap", "128",
        "--block-size", "4", "--num-lanes", "2",
        "--save-outputs-path", str(out_path),
    ])
    out = capsys.readouterr().out
    assert "Batched lanes: 2" in out
    assert "Speculative tokens_per_sec:" in out
    rows = [json.loads(l) for l in out_path.read_text().splitlines()]
    assert len(rows) == 3
    assert all(r["prompt_batch_size"] == 2 and r["error"] is None for r in rows)
    assert all(r["completion_tokens"] >= 1 for r in rows)
