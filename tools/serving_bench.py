#!/usr/bin/env python
"""Serving-load benchmark: N concurrent desynced streams with Poisson
join/leave churn through the per-row RAGGED feed path (VERDICT r4 #3) —
the measured half of the continuous-batching story.

Scenario: B slots serve streams whose frontends produce DIFFERENT numbers
of frames per tick (uniform in [lo, hi] samples — desynced row clocks from
tick one).  Streams end (Poisson) and their slot is handed to a new stream
mid-tick via `reset_utterances` — no waiting for batchmates.  Every tick is
ONE ragged `feed_device` dispatch (per-tick T padded to one bucket size so
the whole run uses a single cached executable).

Methodology (tunnel-proof, see CLAUDE.md): conditioning pre-staged on
device, dispatches pipelined in groups of G ticks with a tail-only fetch;
per-tick latency = group time / G, percentiles across groups.  The
separately-reported sync-tick number includes one tunnel RTT per tick and
is NOT a property of the chip.

Run: stdbuf -oL python tools/serving_bench.py
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

L, R, S, A, MAXD = 20, 64, 256, 256, 512      # flagship
B = 8                                         # serving slots
BUCKET = 64                                   # per-tick T (padded)
LO, HI = 24, 60                               # frames per stream per tick
TICKS = 48
GROUP = 8                                     # ticks per timed group
P_LEAVE = 0.08                                # per-stream per-tick hazard


def main():
    print("devices:", jax.devices(), flush=True)
    from nv_wavenet_tpu.config import WaveNetConfig
    cfg = WaveNetConfig(num_layers=L, R=R, S=S, A=A, max_dilation=MAXD)
    ref_w = params_lib.random_reference_weights(cfg, seed=1)
    eng = WaveNetInfer(num_layers=L, max_dilation=MAXD, R=R, S=S, A=A,
                       max_batch=B, implementation=Impl.PERSISTENT,
                       chunk_size=64)
    eng.set_reference_weights(ref_w)

    rng = np.random.RandomState(0)
    # pre-computed schedule: per-tick lengths + churn (slot resets)
    lengths = rng.randint(LO, HI + 1, size=(TICKS, B))
    churn = rng.uniform(size=(TICKS, B)) < P_LEAVE       # reset AFTER tick
    # pre-staged device conditioning, one buffer per tick
    conds = jax.random.uniform(jax.random.PRNGKey(0),
                               (TICKS + 2, BUCKET, L, B, 2 * R), jnp.float32,
                               -0.5, 0.5)
    conds = [jnp.asarray(conds[i]) for i in range(TICKS + 2)]

    eng.begin_stream(B)
    # force immediate desync + compile the ragged executable
    y = eng.feed_device(conds[0], lengths=lengths[0])
    np.asarray(y)
    np.asarray(eng.feed_device(conds[1], lengths=lengths[1]))

    # --- pipelined groups: per-tick latency distribution ---
    group_ms, resets, total_samples = [], 0, 0
    t_all0 = time.time()
    for g0 in range(0, TICKS, GROUP):
        t0 = time.time()
        last = None
        for i in range(g0, min(g0 + GROUP, TICKS)):
            last = eng.feed_device(conds[2 + i], lengths=lengths[i])
            total_samples += int(lengths[i].sum())
            rows = np.nonzero(churn[i])[0]
            if len(rows):
                eng.reset_utterances(rows)   # mid-desync slot handover
                resets += len(rows)
        np.asarray(last[-1])                 # tail fetch forces the group
        group_ms.append((time.time() - t0) / GROUP * 1e3)
    wall = time.time() - t_all0

    # --- sync ticks (per-tick fetch; tunnel RTT included — honesty row) ---
    sync = []
    for i in range(6):
        t0 = time.time()
        np.asarray(eng.feed_device(conds[i], lengths=lengths[i])[-1])
        sync.append((time.time() - t0) * 1e3)

    g = np.asarray(group_ms)
    avg_chunk = lengths.mean()
    audio_ms = avg_chunk / 16.0
    print(f"\nflagship {L}L b={B} slots, {TICKS} ticks, chunk {LO}-{HI} "
          f"samples/stream/tick (bucket {BUCKET}), {resets} slot handovers "
          f"(Poisson p={P_LEAVE})")
    print(f"per-tick on-chip latency: p50 {np.percentile(g, 50):.2f}  "
          f"p90 {np.percentile(g, 90):.2f}  max {g.max():.2f} ms "
          f"(avg audio/tick {audio_ms:.1f} ms -> "
          f"{audio_ms / np.percentile(g, 50):.2f}x realtime/stream)")
    print(f"aggregate throughput: {total_samples / wall / 1e3:.1f} kHz "
          f"({total_samples} samples / {wall * 1e3:.0f} ms, churn included)")
    print(f"sync-tick (incl. tunnel RTT): median {np.median(sync):.1f} ms")
    print(json_line(np.percentile(g, 50), total_samples / wall / 1e3))


def json_line(p50, khz):
    import json
    return json.dumps({"metric": "serving_churn_p50_tick_ms", "value":
                       round(float(p50), 3), "aggregate_khz":
                       round(float(khz), 1)})


if __name__ == "__main__":
    main()
