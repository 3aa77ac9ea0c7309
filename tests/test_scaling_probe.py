"""Smoke test for the scaling-efficiency harness (tools/scaling_probe.py)
on the virtual 8-device CPU mesh: the curve runs end-to-end, reports one
record per mesh size with consistent totals, and the summary efficiency is
computed against the smallest mesh."""
import sys

sys.path.insert(0, ".")


def test_scaling_probe_cpu_mesh():
    from tools import scaling_probe

    summary = scaling_probe.main([
        "-l", "2", "-r", "32", "-s", "64", "-a", "256", "-d", "2",
        "-b", "2", "-c", "8", "-n", "16", "-t", "1",
        "--mesh_sizes", "1,2,4", "--interpret"])
    rows = summary["scaling"]
    assert [r["mesh_size"] for r in rows] == [1, 2, 4]
    for r in rows:
        assert r["batch"] == 2 * r["mesh_size"]
        assert abs(r["khz_total"] - r["khz_per_utt"] * r["batch"]) < 0.51
    assert summary["efficiency"] > 0
