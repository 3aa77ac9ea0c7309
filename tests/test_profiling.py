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
