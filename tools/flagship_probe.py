"""Probe flagship-config (64R/256S/256A x 20L, maxD=512) generation rate on
the real TPU across batch/dtype settings.

Tunnel-proof measurement (on-device inputs, pipelined dispatches, tail-slice
fetch) — see bench.py docstring and tools/probe_split.measure.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from nv_wavenet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from nv_wavenet_tpu.config import WaveNetConfig
from tools.probe_split import measure

if __name__ == "__main__":
    cfg = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=512)
    T = 4096
    measure(cfg, 16, 256, T, "flagship b=16 fp32 (exact path)")
    measure(cfg, 16, 256, T, "flagship b=16 bf16 weights",
            weight_dtype=jnp.bfloat16)
    measure(cfg, 1, 256, T, "flagship b=1 fp32")
    measure(cfg, 64, 32, T, "flagship b=64 fp32")
