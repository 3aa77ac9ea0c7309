"""Quick real-TPU smoke: compile + run the persistent kernel, compare to the
numpy golden model, print a rough samples/sec. Run on a machine with a TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.models.golden import WaveNetGolden
from nv_wavenet_tpu.ops import persistent


def main():
    print("devices:", jax.devices())
    cfg = WaveNetConfig(num_layers=20, R=64, S=128, A=256, max_dilation=8)
    batch, samples, chunk = 4, 16, 8
    ref_w = params_lib.random_reference_weights(cfg, seed=11)
    rng = np.random.RandomState(0)
    cond = rng.uniform(-0.5, 0.5,
                       (samples, cfg.num_layers, batch, 2 * cfg.R)).astype(np.float32)
    sel = rng.uniform(0, 1, (samples, batch)).astype(np.float32)

    golden = WaveNetGolden(cfg, batch, samples)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    y_gold = golden.run(samples, batch)

    params = {k: jnp.asarray(v) for k, v in
              params_lib.to_canonical(ref_w, cfg).items()}
    gen = jax.jit(persistent.make_persistent_generator(cfg, batch, chunk))
    ring = persistent.init_ring(cfg, batch)
    ys = jnp.full((2, batch), cfg.silence_bin, jnp.int32)
    t_start = time.time()
    out = gen(params, np.array([0]), jnp.asarray(cond), jnp.asarray(sel), ring, ys)
    y = np.asarray(out[0]).T
    print(f"compile+run: {time.time()-t_start:.1f}s")
    print("golden:", y_gold[0])
    print("kernel:", y[0])
    match = np.array_equal(y_gold, y)
    print("EXACT MATCH" if match else "MISMATCH", flush=True)
    if not match:
        print("agreement:", np.mean(y_gold == y))
        sys.exit(1)

    # timing: longer run — inputs generated ON DEVICE (a 167 MB host cond
    # upload over the tunnel would dwarf the measurement; see bench.py)
    samples2 = 4096
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cond2j = jax.random.uniform(k1, (samples2, cfg.num_layers, batch,
                                     2 * cfg.R), jnp.float32, -0.5, 0.5)
    sel2j = jax.random.uniform(k2, (samples2, batch), jnp.float32)
    gen2 = jax.jit(persistent.make_persistent_generator(cfg, batch, 64))
    np.asarray(gen2(params, np.array([0]), cond2j, sel2j, ring, ys)[0][-1])
    t0 = time.time()
    out = gen2(params, np.array([0]), cond2j, sel2j, ring, ys)
    # tail-slice fetch forces the whole run; block_until_ready does not
    # reliably wait over the tunnel and a full-y fetch is bandwidth-bound
    np.asarray(out[0][-1])
    dt = time.time() - t0
    print(f"{samples2} samples in {dt*1e3:.1f} ms -> {samples2/dt/1e3:.2f} kHz")


if __name__ == "__main__":
    main()
