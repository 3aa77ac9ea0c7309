import numpy as np

from nv_wavenet_tpu.config import FLAGSHIP_CONFIG, WaveNetConfig
from nv_wavenet_tpu.utils.profiling import step_cost, vmem_report


def test_step_cost_flagship():
    c = step_cost(FLAGSHIP_CONFIG)
    # ~1.7 MFLOP per sample per utterance for the flagship config
    assert 1.0e6 < c.flops_per_sample_per_utt < 3.0e6
    # roofline must sit far above the measured ~80 kHz (compute is not the
    # bottleneck; per-step op-issue latency is)
    assert c.roofline_khz(batch=16) > 1000


def test_vmem_report_contains_budget_lines():
    r = vmem_report(WaveNetConfig(num_layers=20, R=64, S=256, A=256,
                                  max_dilation=512), batch=16, chunk=256)
    assert "weights" in r and "ring buffer" in r and "total est." in r
    # flagship fp32 plan fits the 110MB kernel limit
    total_mb = float(r.splitlines()[-1].split()[-2])
    assert total_mb < 110
    # lane-packed ring: two same-dilation layers share each 128-lane row
    # (R=64, 2 dilation cycles) -> 1023 rows x 16 x 128 x 4B = 7.99 MB
    ring_mb = float([ln for ln in r.splitlines() if "ring buffer" in ln][0]
                    .split()[2])
    assert 7.5 < ring_mb < 8.5


def test_latency_floor_brackets_measured_rate():
    """The flagship kernel is latency-bound: the measured per-utterance rate
    (~100 kHz, BASELINE.md) must sit between ~60% and 100% of the
    sequential-matmul-chain floor; the FLOP roofline sits far above both."""
    c = step_cost(FLAGSHIP_CONFIG)
    assert c.critical_path_matmuls == 43
    floor = c.latency_floor_khz()
    assert 90 < floor < 150
    assert c.roofline_khz(batch=16) > 5 * floor
