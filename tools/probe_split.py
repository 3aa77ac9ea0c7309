"""Probe: per-step cost of the flagship config under candidate kernel
restructurings on the real TPU (tunnel-proof measurement: on-device inputs,
pipelined dispatches, tail-slice fetch — see bench.py docstring).

Variants are exactness-preserving N-splits of existing matmuls, verified
bit-exact in the CPU test suite; this tool measures whether they pay off.
"""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from nv_wavenet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.ops import persistent


def measure(cfg, batch, chunk, T, label, iters=3, fetch_all=False, **kw):
    ref_w = params_lib.random_reference_weights(cfg, seed=1)
    params = {k: jnp.asarray(v) for k, v in
              params_lib.to_canonical(ref_w, cfg).items()}
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cond = jax.random.uniform(k1, (T, cfg.num_layers, batch, 2 * cfg.R),
                              jnp.float32, -0.5, 0.5)
    sel = jax.random.uniform(k2, (T, batch), jnp.float32)
    ring = persistent.init_ring(cfg, batch)
    ys = jnp.full((2, batch), cfg.silence_bin, jnp.int32)
    if kw.get("prefold_cond"):
        # the kernel skips its dil_b add under prefold; fold it here so the
        # variant computes the same network
        dil_b = params["dil_b"]
        cond = cond + dil_b[None, :, None, :]
    t0 = time.time()
    gen = jax.jit(persistent.make_persistent_generator(cfg, batch, chunk, **kw))
    y_dev = gen(params, np.array([0]), cond, sel, ring, ys)[0]
    np.asarray(y_dev[-1])
    compile_s = time.time() - t0
    t0 = time.time()
    tails = [gen(params, np.array([0]), cond, sel, ring, ys)[0][-1]
             for _ in range(iters)]
    for tl in tails:
        np.asarray(tl)
    dt = (time.time() - t0) / iters
    us = dt / T * 1e6
    print(f"{label:44s}: {us:6.2f} us/step  {T/dt/1e3:8.1f} kHz/utt  "
          f"(compile {compile_s:.0f}s)", flush=True)
    return np.asarray(y_dev) if fetch_all else None


if __name__ == "__main__":
    FL = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=512)
    T = 4096
    # The prev/cur dilated-GEMM split is THE canonical order since round 4
    # and prev_prefetch (P5 cross-sample pipelining of the prev half) is the
    # default schedule; the probe rows isolate each remaining knob.
    measure(FL, 16, 256, T, "baseline (split + prev_prefetch)")
    measure(FL, 16, 256, T, "prev in-loop (prev_prefetch=False)",
            prev_prefetch=False)
    measure(FL, 16, 256, T, "rs_split", rs_split=True)
    measure(FL, 16, 256, T, "embed_split", embed_split=True)
    measure(FL, 16, 256, T, "embed_split+rs_split", embed_split=True,
            rs_split=True)
    measure(FL, 1, 256, T, "b=1 baseline")
    measure(FL, 1, 256, T, "b=1 embed_split", embed_split=True)
