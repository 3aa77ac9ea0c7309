"""Perf-harness CLI plumbing tests (tiny config, CPU auto-interpret).

The real rates are measured on hardware (BASELINE.md); these verify the
reference-parity CLI surface itself: flag mapping, the single-run JSON
record, and the --sweep mode (mode x batch x chunk ranked table + best
config) that mirrors the reference's documented tuning workflow
(`/root/reference/README.md:58-66`, `nv_wavenet_perf.cu:203-254`).
"""

import json

from nv_wavenet_tpu.tools import perf


def run_cli(capsys, args):
    import sys
    old = sys.argv
    sys.argv = ["perf.py"] + args
    try:
        perf.main()
    finally:
        sys.argv = old
    return capsys.readouterr().out


TINY = ["-l", "2", "-r", "32", "-s", "64", "-a", "256", "-d", "2",
        "-n", "16", "-t", "1"]


def test_perf_single_run_record(capsys):
    out = run_cli(capsys, TINY + ["-b", "2", "-m", "persistent", "-c", "8"])
    assert "Sample rate:" in out
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["batch"] == 2 and rec["mode"] == "persistent"
    assert rec["khz_per_utterance"] > 0
    assert rec["khz_total"] == round(rec["khz_per_utterance"] * 2, 1)


def test_perf_sweep_ranked_table(capsys):
    out = run_cli(capsys, TINY + ["--sweep", "--sweep_batches", "1,2",
                                  "--sweep_chunks", "8",
                                  "--sweep_modes", "persistent,manyblock"])
    assert "Ranked by total throughput:" in out
    best_line = [ln for ln in out.splitlines() if ln.startswith("Best total:")]
    assert best_line
    best = json.loads(best_line[0].split("Best total:")[1])
    assert best["mode"] in ("persistent", "manyblock")
    assert best["batch"] in (1, 2) and best["khz_total"] > 0
    assert "Best per-utterance:" in out
    # all 4 combinations measured
    assert out.count("-> ") == 4


def test_perf_fused_mode(capsys):
    """-m fused routes through the collapsed-chain kernel and reports."""
    out = run_cli(capsys, TINY + ["-b", "2", "-m", "fused", "-c", "8"])
    assert "Sample rate:" in out
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["mode"] == "fused" and rec["khz_per_utterance"] > 0


def test_perf_speculative_mode(capsys):
    """-m speculative routes through the speculative exact decoder and
    reports the rounds diagnostic."""
    out = run_cli(capsys, TINY + ["-b", "1", "-m", "speculative", "-c", "8",
                                  "--spec_window", "8"])
    rec = json.loads([ln for ln in out.splitlines()
                      if ln.startswith("{")][-1])
    assert rec["mode"] == "speculative" and rec["khz_per_utterance"] > 0
    assert "avg committed run" in out
