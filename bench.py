"""Headline benchmark: audio samples/sec (kHz) per utterance on one TPU chip.

Flagship config from BASELINE.md: 64R/256S/256A x 20 layers (max_dilation=512,
the reference perf harness default, `nv_wavenet_perf.cu:189-200`), batch=16
utterances generated in parallel, fp32, stochastic sampling with injected
selectors.  Metric matches the reference harness: kHz = num_samples /
elapsed_ms per utterance (`nv_wavenet_perf.cu:87,279-280`).  Baseline is the
24 kHz/chip real-time+margin target from BASELINE.json (the reference repo
publishes no numbers).

Tunnel-proof measurement (the axon TPU is reached over a tunnel whose
bandwidth varies wildly between sessions — measured 30 MB/s down one day,
0.3 MB/s another): inputs are generated ON DEVICE, and the timed region
dispatches three back-to-back generation runs then force-fetches only the
final time-slice of each (a few hundred bytes), so one ~40 ms RTT is
amortized over 3*T samples instead of shipping megabytes through the timed
path.  On a host-attached TPU the same code simply measures steady-state
throughput, like the reference's event-timed `run_chunks` loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.  When no
TPU backend is reachable (the tunnel goes down for hours at a time), it
prints ONE machine-readable skip line and exits 0 instead of dying with a
40-line traceback — so the driver artifact distinguishes "no hardware" from
"regression".
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

METRIC = "samples_per_sec_per_utterance_64R_256S_256A_20L_b16"


def _skip(reason: str):
    """One parseable line, rc=0: value 0 marks 'not measured', the skipped
    field says why (tunnel down vs. no TPU backend on this host)."""
    print(json.dumps({"metric": METRIC, "value": 0, "unit": "kHz",
                      "vs_baseline": 0, "skipped": reason}))
    raise SystemExit(0)


def _require_tpu():
    """Probe backend availability with a hard deadline.  jax.devices() blocks
    inside the C++ PJRT client when the tunnel is wedged — uninterruptible by
    SIGALRM (the Python handler never runs while the main thread sits in a C
    call) — so the probe runs on a daemon thread and a hung probe is
    abandoned via os._exit after printing the skip line."""
    import threading

    import jax

    result = {}

    def probe():
        try:
            result["devices"] = jax.devices()
            result["backend"] = jax.default_backend()
        except Exception as e:  # backend init raises RuntimeError when down
            result["error"] = f"{type(e).__name__}: {str(e)[:120]}"

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout=int(os.environ.get("BENCH_DISCOVER_TIMEOUT", "240")))
    if th.is_alive():
        print(json.dumps({"metric": METRIC, "value": 0, "unit": "kHz",
                          "vs_baseline": 0,
                          "skipped": "tpu-unavailable (discovery timed out)"}),
              flush=True)
        os._exit(0)   # the probe thread is stuck in C++; exit hard
    if "error" in result:
        _skip(f"tpu-unavailable ({result['error']})")
    if result.get("backend") != "tpu":
        _skip(f"tpu-unavailable (backend={result.get('backend')})")
    print(f"devices: {result['devices']}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    _require_tpu()

    from nv_wavenet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from nv_wavenet_tpu.config import WaveNetConfig
    from nv_wavenet_tpu.models import params as params_lib
    from nv_wavenet_tpu.ops import persistent

    cfg = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=512)
    batch, T, chunk = 16, 16384, 256

    ref_w = params_lib.random_reference_weights(cfg, seed=1)
    params = {k: jnp.asarray(v) for k, v in
              params_lib.to_canonical(ref_w, cfg).items()}
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cond = jax.random.uniform(k1, (T, cfg.num_layers, batch, 2 * cfg.R),
                              jnp.float32, -0.5, 0.5)
    sel = jax.random.uniform(k2, (T, batch), jnp.float32)
    ring = persistent.init_ring(cfg, batch)
    ys = jnp.full((2, batch), cfg.silence_bin, jnp.int32)

    gen = jax.jit(persistent.make_persistent_generator(cfg, batch, chunk))

    # warmup (compile) — force with a tiny tail fetch
    tail = np.asarray(gen(params, np.array([0]), cond, sel, ring, ys)[0][-1])
    assert tail.shape == (batch,) and tail.min() >= 0 and tail.max() < cfg.A

    # measure: three back-to-back dispatches, one forced fetch of each run's
    # final time-slice (tiny transfer; depends on the whole computation)
    iters = 3
    t0 = time.time()
    tails = [gen(params, np.array([0]), cond, sel, ring, ys)[0][-1]
             for _ in range(iters)]
    for tl in tails:
        np.asarray(tl)
    dt = time.time() - t0
    khz = iters * T / dt / 1e3

    baseline_khz = 24.0
    print(json.dumps({
        "metric": METRIC,
        "value": round(khz, 2),
        "unit": "kHz",
        "vs_baseline": round(khz / baseline_khz, 3),
    }))


if __name__ == "__main__":
    main()
