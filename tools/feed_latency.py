#!/usr/bin/env python
"""Single-stream serving latency: measured ON-CHIP per-feed cost of
incremental generation (`begin_stream`/`feed`) at conversational chunk
sizes, exact tier vs priority="latency" (VERDICT r3 #5).

Tunnel-proof methodology (see bench.py / CLAUDE.md): conditioning chunks
are pre-staged ON DEVICE, K `feed_device` dispatches run back-to-back
(async dispatch pipelines them), and only the LAST chunk's final y column
is force-fetched — so the reported per-feed number is compute + dispatch
overhead, with the tunnel's ~40 ms RTT amortized over K feeds instead of
paid per feed.  The separately-reported "sync feed" number is the public
`feed()` path with its per-call host readout — over the axon tunnel that
is RTT-bound and NOT a property of the chip (a host-attached TPU pays PCIe
microseconds instead).

Run: stdbuf -oL python tools/feed_latency.py
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
K = 32                                        # feeds per timed run


def measure(tier, chunk_samples, ref_w, kernel_chunk=256):
    eng = WaveNetInfer(num_layers=L, max_dilation=MAXD, R=R, S=S, A=A,
                       max_batch=B, implementation=Impl.PERSISTENT,
                       chunk_size=kernel_chunk,
                       priority=None if tier == "exact" else tier)
    eng.set_reference_weights(ref_w)
    # pre-staged on-device conditioning chunks (a TTS frontend would hand
    # over device arrays; uploading per feed would measure the tunnel)
    chunks = jax.random.uniform(jax.random.PRNGKey(0),
                                (K + 2, chunk_samples, L, B, 2 * R),
                                jnp.float32, -0.5, 0.5)
    chunks = [jnp.asarray(chunks[i]) for i in range(K + 2)]
    # selectors pre-staged on device too: a host sel array per feed is a
    # per-call host->device upload inside the timed loop (RTT-bound over
    # the tunnel, not a property of the chip)
    sels = [jnp.asarray(np.random.RandomState(i)
                        .uniform(0, 1, (chunk_samples, B))
                        .astype(np.float32)) for i in range(K + 2)]

    eng.begin_stream(B)
    # warmup/compile (two feeds: first-call + steady-state shapes)
    np.asarray(eng.feed_device(chunks[0], sels[0])[-1])
    np.asarray(eng.feed_device(chunks[1], sels[1])[-1])

    # pipelined on-chip: K dispatches back-to-back, tail fetch forces all
    t0 = time.time()
    ys = [eng.feed_device(chunks[2 + i], sels[2 + i]) for i in range(K)]
    np.asarray(ys[-1][-1])
    per_feed_ms = (time.time() - t0) / K * 1e3

    # sync feed(): the public per-call path (includes one tunnel RTT per
    # feed — reported for honesty, dominated by the tunnel here)
    eng.begin_stream(B)
    eng.feed(np.asarray(chunks[0]), sels[0])
    lat = []
    for i in range(6):
        t0 = time.time()
        eng.feed(np.asarray(chunks[1 + i]), sels[1 + i])
        lat.append((time.time() - t0) * 1e3)
    sync_ms = float(np.median(lat))

    audio_ms = chunk_samples / 16.0           # 16 kHz audio
    print(f"  {tier:8s} chunk={chunk_samples:4d} ({audio_ms:5.1f} ms audio): "
          f"on-chip {per_feed_ms:7.2f} ms/feed "
          f"({audio_ms / per_feed_ms:5.2f}x realtime)   "
          f"sync-feed(tunnel) {sync_ms:7.1f} ms", flush=True)
    return per_feed_ms


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    from nv_wavenet_tpu.config import WaveNetConfig
    cfg = WaveNetConfig(num_layers=L, R=R, S=S, A=A, max_dilation=MAXD)
    ref_w = params_lib.random_reference_weights(cfg, seed=1)
    print(f"flagship {L}L {R}R/{S}S/{A}A maxD={MAXD} b={B}, "
          f"{K} pipelined feeds per measurement", flush=True)
    sizes = ([int(a) for a in sys.argv[1:]] if len(sys.argv) > 1
             else (40, 160, 640))
    for chunk_samples in sizes:
        for tier in ("exact", "latency"):
            measure(tier, chunk_samples, ref_w)
