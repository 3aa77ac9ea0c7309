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
from nv_wavenet_tpu.ops.persistent import _padded_bytes, estimate_vmem_bytes


def _ring_bytes(cfg: WaveNetConfig, batch: int) -> int:
    rows, pack, _, _ = cfg.packed_ring_plan()
    return _padded_bytes((rows, batch, pack * cfg.R), 4)


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
    critical_path_matmuls: int

    def roofline_khz(self, batch: int, peak_flops: float = 98e12,
                     hbm_gbs: float = 800.0) -> float:
        """Upper bound on per-utterance kHz from the compute roofline (fp32
        MXU peak for v5e ~ 98 TFLOP/s; HBM ~ 819 GB/s)."""
        compute_bound = peak_flops / (self.flops_per_sample_per_utt * batch)
        return compute_bound / 1e3

    def latency_floor_khz(self, stage_ns: float = 200.0) -> float:
        """The binding bound for this workload: every sample is a chain of
        `critical_path_matmuls` DEPENDENT small matmuls (embed -> L x
        (dilated, residual) -> Zs -> Za), each costing roughly one
        MXU occupancy+drain (~200 ns measured for fp32 HIGHEST at B<=64 on
        v5e — the 6-pass fp32 decomposition and the gate/softmax VPU work
        hide inside it).  Batch does not change this (rows < 128 ride along
        free); it only multiplies total chip throughput.  Measured flagship
        rates (~10 us/step = 2L+3 = 43 stages x ~220 ns) sit at ~90% of this
        floor — the kernel is latency-bound, not FLOP-bound."""
        return 1e6 / (self.critical_path_matmuls * stage_ns)

    def fused_latency_floor_khz(self, cfg: WaveNetConfig,
                                stage_ns: float = 200.0,
                                ktile_ns: float = 8.5,
                                passes: int = 1,
                                pack_gates: bool = False) -> float:
        """Latency floor for the collapsed-chain kernel
        (`ops/fused_chain.py`): the chain is embed -> w0 -> L gated matmuls
        -> skip -> Zs -> Za = L+5 stages, but layer l's chain matmul
        contracts over K = l*stride columns, adding `passes` MXU passes
        per 128-wide K-tile beyond the first (~8.5 ns each at 940 MHz;
        passes=1 for bf16/fast_math single-pass, ~3 for fp32 HIGHEST).
        Shows why the fused mode pairs with single-pass matmuls: under
        HIGHEST the K-pass term eats most of the chain savings.

        pack_gates=True models the tight R-lane gate layout (stride R
        instead of max(R,128)): for R=64 it halves the K-tile term — at the
        default stage_ns the flagship fp32-HIGHEST floor moves ~107 -> ~141
        kHz (past the standard kernel's ~116) and the single-pass floor
        ~155 -> ~176 kHz."""
        P = cfg.R if pack_gates else max(cfg.R, 128)
        # only K-tiles BEYOND the first add pipeline passes (the first tile's
        # cost is the stage_ns term already charged per chain stage)
        ktiles = sum(max(0, -(-l * P // 128) - 1)
                     for l in range(cfg.num_layers))
        chain_ns = ((cfg.num_layers + 5) * stage_ns
                    + ktiles * ktile_ns * passes)
        return 1e6 / chain_ns


def step_cost(cfg: WaveNetConfig) -> StepCost:
    L, R, S, A = cfg.num_layers, cfg.R, cfg.S, cfg.A
    flops = 2.0 * (2 * A * R              # embedding one-hot GEMM
                   + L * (2 * R * 2 * R)  # dilated conv
                   + L * (R * (R + S))    # residual+skip
                   + S * A + A * A)       # output stack
    # sampling cumsum is log2(A) VPU shifted adds (fixed-tree scan), not a
    # matmul — off the MXU critical path
    return StepCost(
        flops_per_sample_per_utt=flops,
        weight_bytes=cfg.weight_bytes(4),
        cond_bytes_per_sample_per_utt=L * 2 * R * 4,
        critical_path_matmuls=2 * L + 3,
    )


def vmem_report(cfg: WaveNetConfig, batch: int, chunk: int,
                weight_bytes: int = 4) -> str:
    mb = 1024 * 1024
    total = estimate_vmem_bytes(cfg, batch, chunk, weight_bytes)
    lines = [
        f"VMEM plan for L={cfg.num_layers} R={cfg.R} S={cfg.S} A={cfg.A} "
        f"maxD={cfg.max_dilation} B={batch} chunk={chunk}:",
        f"  weights      {cfg.weight_bytes(weight_bytes) / mb:8.2f} MB (unpadded)",
        f"  ring buffer  {_ring_bytes(cfg, batch) / mb:8.2f} MB "
        f"({cfg.ring_size} FIFO slots, lane-packed VMEM scratch)",
        f"  cond stream  {2 * _padded_bytes((chunk, cfg.num_layers, batch, 2 * cfg.R), 4) / mb:8.2f}"
        f" MB (double-buffered)",
        f"  total est. (padded windows) {total / mb:.2f} MB",
    ]
    return "\n".join(lines)
