"""Tracing / profiling / cost-model utilities — the aux subsystem the
reference covers with `cudaProfilerStart`, CUDA events, occupancy prints and
`--ptxas-options=-v` (SURVEY §5: Tracing/profiling).

TPU-native equivalents:
  * `trace(...)`: jax.profiler trace context writing a TensorBoard-readable
    profile (the cudaProfilerStart analog),
  * `step_cost(cfg, batch)`: analytic per-sample FLOPs/bytes roofline — used
    to sanity-check measured rates (a rate above the roofline means a broken
    measurement, see .claude/skills/verify/SKILL.md),
  * `vmem_report(cfg, batch, chunk)`: VMEM plan print, the occupancy-assert
    analog (`nv_wavenet_util.cuh:42-58`).
"""

from __future__ import annotations

import contextlib
import dataclasses

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.ops.persistent import estimate_vmem_bytes


@contextlib.contextmanager
def trace(logdir: str = "/tmp/nv_wavenet_tpu_trace"):
    """Profile a region: `with trace(): eng.run(...)`; inspect with
    TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class StepCost:
    flops_per_sample_per_utt: float
    weight_bytes: int
    cond_bytes_per_sample_per_utt: int

    def roofline_khz(self, batch: int, peak_flops: float = 98e12,
                     hbm_gbs: float = 800.0) -> float:
        """Upper bound on per-utterance kHz from the compute roofline (fp32
        MXU peak for v5e ~ 98 TFLOP/s; HBM ~ 819 GB/s)."""
        compute_bound = peak_flops / (self.flops_per_sample_per_utt * batch)
        return compute_bound / 1e3


def step_cost(cfg: WaveNetConfig) -> StepCost:
    L, R, S, A = cfg.num_layers, cfg.R, cfg.S, cfg.A
    flops = 2.0 * (2 * A * R              # embedding one-hot GEMM
                   + L * (2 * R * 2 * R)  # dilated conv
                   + L * (R * (R + S))    # residual+skip
                   + S * A + A * A        # output stack
                   + A * A)               # cumsum tri-matmul (sampling)
    return StepCost(
        flops_per_sample_per_utt=flops,
        weight_bytes=cfg.weight_bytes(4),
        cond_bytes_per_sample_per_utt=L * 2 * R * 4,
    )


def vmem_report(cfg: WaveNetConfig, batch: int, chunk: int,
                weight_bytes: int = 4) -> str:
    mb = 1024 * 1024
    total = estimate_vmem_bytes(cfg, batch, chunk, weight_bytes)
    lines = [
        f"VMEM plan for L={cfg.num_layers} R={cfg.R} S={cfg.S} A={cfg.A} "
        f"maxD={cfg.max_dilation} B={batch} chunk={chunk}:",
        f"  weights      {cfg.weight_bytes(weight_bytes) / mb:8.2f} MB",
        f"  ring buffer  {cfg.ring_bytes(batch, 4) / mb:8.2f} MB "
        f"({cfg.ring_size} slots)",
        f"  cond stream  {2 * chunk * cfg.num_layers * batch * 2 * cfg.R * 4 / mb:8.2f}"
        f" MB (double-buffered)",
        f"  total est.   {total / mb:8.2f} MB",
    ]
    return "\n".join(lines)
