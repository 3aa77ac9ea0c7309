#!/usr/bin/env python
"""Per-feed overhead BREAKDOWN (VERDICT r4 #4): where do the ~1.6 ms of
non-compute cost in a 40-sample streaming feed go?

`tools/feed_latency.py` measures the total (on-chip pipelined per-feed
cost); this tool splits it into an attribution ladder, all with the same
tunnel-proof methodology (pre-staged device inputs, K back-to-back
dispatches, tail-only fetch):

  noop      — a cached jitted callable with the SAME operand tree and
              donation as the real feed, trivial body: the pure
              jit-dispatch + donation floor (unfixable at the engine level;
              XLA/PJRT per-execution cost).
  direct    — the engine's cached feed executable called directly with
              fixed operands: noop delta = kernel launch + compute.
  engine    — the public `feed_device` path: direct delta = engine python
              (plan lookup, selector staging, t0 scalar upload).
  compute   — T samples at the headline kernel rate (the roofline).

Run: stdbuf -oL python tools/feed_breakdown.py [chunk_sizes...]
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

from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer
from nv_wavenet_tpu.models import params as params_lib

L, R, S, A, MAXD = 20, 64, 256, 256, 512     # flagship
B = 1
K = 32


def pipeline(fn, K):
    outs = [fn(i) for i in range(K)]
    np.asarray(jax.tree.leaves(outs[-1])[0])
    t0 = time.time()
    outs = [fn(i) for i in range(K)]
    np.asarray(jax.tree.leaves(outs[-1])[-1])
    return (time.time() - t0) / K * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    from nv_wavenet_tpu.config import WaveNetConfig
    cfg = WaveNetConfig(num_layers=L, R=R, S=S, A=A, max_dilation=MAXD)
    ref_w = params_lib.random_reference_weights(cfg, seed=1)
    sizes = ([int(a) for a in sys.argv[1:]] if len(sys.argv) > 1
             else (40, 160))
    for T in sizes:
        eng = WaveNetInfer(num_layers=L, max_dilation=MAXD, R=R, S=S, A=A,
                           max_batch=B, implementation=Impl.PERSISTENT,
                           chunk_size=256)
        eng.set_reference_weights(ref_w)
        conds = jax.random.uniform(jax.random.PRNGKey(0),
                                   (K + 2, T, L, B, 2 * R), jnp.float32,
                                   -0.5, 0.5)
        conds = [jnp.asarray(conds[i]) for i in range(K + 2)]
        sels = [jnp.asarray(np.random.RandomState(i)
                            .uniform(0, 1, (T, B)).astype(np.float32))
                for i in range(K + 2)]

        eng.begin_stream(B)
        np.asarray(eng.feed_device(conds[0], sels[0])[-1])   # build caches

        # --- engine: the public per-feed path ---
        def eng_feed(i):
            if eng._stream_t > 1 << 28:
                eng._stream_t = 0
            return eng.feed_device(conds[i % (K + 2)], sels[i % (K + 2)])
        t_engine = pipeline(eng_feed, K)

        # --- direct: cached executable, fixed operands ---
        (key, fe), = [(k, v) for k, v in eng._feed_cache.items()
                      if k[0] == "feed"]
        params = eng._device_params()
        dil_b = eng._dil_b_folded()
        t0s = np.asarray([0, eng.sampling_seed], np.int32)
        state = {"ring": eng._ring, "ys": eng._y_state}

        def direct(i):
            out = fe(params, dil_b, conds[i % (K + 2)], sels[i % (K + 2)],
                     state["ring"], state["ys"], t0s)
            state["ring"], state["ys"] = out[1], out[2]
            return out[0]
        t_direct = pipeline(direct, K)

        # --- noop: same operand tree + donation, trivial body ---
        f_noop2 = jax.jit(lambda p, d, c, s, r, y, t:
                          (s[:, :1].astype(jnp.int32), r, y),
                          donate_argnums=(4, 5))

        def noop(i):
            out = f_noop2(params, dil_b, conds[i % (K + 2)],
                          sels[i % (K + 2)], state["ring"], state["ys"], t0s)
            state["ring"], state["ys"] = out[1], out[2]
            return out[0]
        t_noop = pipeline(noop, K)

        # --- compute roofline: T samples at the measured headline rate ---
        headline_khz = 113.6                                  # bench.py r5
        t_compute = T / headline_khz / 1e3 * 1e3              # ms

        audio_ms = T / 16.0
        print(f"\nchunk={T} ({audio_ms:.1f} ms audio):")
        print(f"  dispatch+donation floor (noop): {t_noop:7.3f} ms")
        print(f"  direct executable:              {t_direct:7.3f} ms "
              f"(kernel launch+compute {t_direct - t_noop:+.3f})")
        print(f"  engine feed_device:             {t_engine:7.3f} ms "
              f"(engine python {t_engine - t_direct:+.3f})")
        print(f"  compute roofline:               {t_compute:7.3f} ms "
              f"(non-compute overhead {t_engine - t_compute:+.3f})")
        print(f"  realtime: {audio_ms / t_engine:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
