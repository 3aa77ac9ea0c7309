"""Probe flagship-config (64R/256S/256A x 20L, maxD=512) generation rate on
the real TPU across batch/chunk/dtype settings."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.ops import persistent


def bench(cfg, batch, chunk, T, weight_dtype, compute_dtype, ring_dtype):
    ref_w = params_lib.random_reference_weights(cfg, seed=1)
    params = {k: jnp.asarray(v) for k, v in
              params_lib.to_canonical(ref_w, cfg).items()}
    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.uniform(-0.5, 0.5,
        (T, cfg.num_layers, batch, 2 * cfg.R)).astype(np.float32)).astype(compute_dtype)
    sel = jnp.asarray(rng.uniform(0, 1, (T, batch)).astype(np.float32))
    ring = persistent.init_ring(cfg, batch, ring_dtype)
    ys = jnp.full((2, batch), cfg.silence_bin, jnp.int32)
    gen = jax.jit(persistent.make_persistent_generator(
        cfg, batch, chunk, weight_dtype=weight_dtype, compute_dtype=compute_dtype))
    t0 = time.time()
    out = gen(params, np.array([0]), cond, sel, ring, ys)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    out = gen(params, np.array([0]), cond, sel, ring, ys)
    jax.block_until_ready(out)
    dt = time.time() - t0
    khz = T / dt / 1e3
    print(f"B={batch} chunk={chunk} w={weight_dtype.__name__} c={compute_dtype.__name__} "
          f"ring={ring_dtype.__name__}: {khz:.2f} kHz/utt, {khz*batch:.1f} kHz total, "
          f"compile {compile_s:.0f}s, step {dt/T*1e6:.1f} us", flush=True)
    return khz


cfg = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=512)
T = 4096
f32, bf16 = jnp.float32, jnp.bfloat16
bench(cfg, 16, 128, T, bf16, f32, f32)
bench(cfg, 16, 128, T, f32, f32, f32)
bench(cfg, 1, 128, T, bf16, f32, f32)
bench(cfg, 64, 128, T, bf16, f32, f32)
