"""Headline benchmark: audio samples/sec (kHz) per utterance on one TPU chip.

Flagship config from BASELINE.md: 64R/256S/256A x 20 layers (max_dilation=512,
the reference perf harness default, `nv_wavenet_perf.cu:189-200`), batch=16
utterances generated in parallel, fp32, stochastic sampling with injected
selectors.  Metric matches the reference harness: kHz = num_samples /
elapsed_ms per utterance (`nv_wavenet_perf.cu:87,279-280`).  Baseline is the
24 kHz/chip real-time+margin target from BASELINE.json (the reference repo
publishes no numbers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nv_wavenet_tpu.config import WaveNetConfig
    from nv_wavenet_tpu.models import params as params_lib
    from nv_wavenet_tpu.ops import persistent

    cfg = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=512)
    batch, T, chunk = 16, 16384, 256

    ref_w = params_lib.random_reference_weights(cfg, seed=1)
    params = {k: jnp.asarray(v) for k, v in
              params_lib.to_canonical(ref_w, cfg).items()}
    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.uniform(
        -0.5, 0.5, (T, cfg.num_layers, batch, 2 * cfg.R)).astype(np.float32))
    sel = jnp.asarray(rng.uniform(0, 1, (T, batch)).astype(np.float32))
    ring = jnp.zeros((cfg.ring_size, batch, cfg.R), jnp.float32)
    ys = jnp.full((2, batch), cfg.silence_bin, jnp.int32)

    gen = jax.jit(persistent.make_persistent_generator(cfg, batch, chunk))

    # warmup (compile)
    np.asarray(gen(params, np.array([0]), cond, sel, ring, ys)[0])

    # measure: forced device->host fetch inside the timed region
    # (block_until_ready does not reliably wait over the axon tunnel)
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        out = gen(params, np.array([0]), cond, sel, ring, ys)
        y = np.asarray(out[0])
        dt = time.time() - t0
        best = max(best, T / dt / 1e3)
    assert y.shape == (T, batch) and y.min() >= 0 and y.max() < cfg.A

    baseline_khz = 24.0
    print(json.dumps({
        "metric": "samples_per_sec_per_utterance_64R_256S_256A_20L_b16",
        "value": round(best, 2),
        "unit": "kHz",
        "vs_baseline": round(best / baseline_khz, 3),
    }))


if __name__ == "__main__":
    main()
