"""Per-step cost breakdown for the persistent kernel on real TPU: vary
layers/batch/chunk/mode/dtype to locate fixed vs per-layer cost.  Also
exercises prng mode on hardware."""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.ops import persistent


def measure(cfg, batch, chunk, T, mode="sample", wdt=jnp.float32,
            cdt=jnp.float32, label="", unroll=1, fast_math=False,
            prefold=False):
    ref_w = params_lib.random_reference_weights(cfg, seed=1)
    params = {k: jnp.asarray(v) for k, v in
              params_lib.to_canonical(ref_w, cfg).items()}
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cond = jax.random.uniform(k1, (T, cfg.num_layers, batch, 2 * cfg.R),
                              jnp.float32, -0.5, 0.5)
    sel = jax.random.uniform(k2, (T, batch), jnp.float32)
    ring = persistent.init_ring(cfg, batch,
                                jnp.float32 if cdt == jnp.float32 else cdt)
    ys = jnp.full((2, batch), cfg.silence_bin, jnp.int32)
    gen = jax.jit(persistent.make_persistent_generator(
        cfg, batch, chunk, mode=mode, weight_dtype=wdt, compute_dtype=cdt,
        unroll=unroll, fast_math=fast_math, prefold_cond=prefold))
    if prefold:
        dil_b = params["dil_b"]
        cond = cond + dil_b[None, :, None, :]
    y0 = np.asarray(gen(params, np.array([0]), cond, sel, ring, ys)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = gen(params, np.array([0]), cond, sel, ring, ys)
        np.asarray(out[0][-1])  # tail fetch: forces the run, tiny transfer
        best = min(best, time.time() - t0)
    us = best / T * 1e6
    print(f"{label:44s} L={cfg.num_layers:2d} B={batch:3d} chunk={chunk:4d} "
          f"{mode:7s}: {us:6.2f} us/step  {T/best/1e3:8.1f} kHz/utt "
          f"uniq={len(np.unique(y0))}", flush=True)
    return us


FL = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=512)
T = 4096
measure(FL, 16, 256, T, label="flagship prefold", prefold=True)
measure(FL, 16, 256, T, label="flagship prefold+fastmath", prefold=True,
        fast_math=True)
MD128 = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=128)
measure(MD128, 128, 16, T, label="maxD128 B=128", prefold=True)
measure(MD128, 256, 8, 2048, label="maxD128 B=256", prefold=True)
