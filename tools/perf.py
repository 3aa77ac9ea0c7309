#!/usr/bin/env python
"""Performance harness — CLI parity with the reference's `nv_wavenet_perf`
(`/root/reference/nv_wavenet_perf.cu:203-254`): measures the audio sample
rate in kHz (= num_samples / elapsed_ms per utterance) for a configurable
model/batch, sweeping implementation modes.

Flags (reference mapping):
  -l num_layers      (default 20)
  -r residual chans  (default 64)
  -s skip chans      (default 128)
  -a out chans       (default 256)
  -b batch size      (default 1)
  -c chunk size      (TPU analog of the reference's batch_size_per_block
                      knob: sizes the per-grid-step conditioning chunk)
  -n num samples     (default 16384)
  -d max dilation    (default 512)
  -m mode            auto | persistent | manyblock (single/dual map to
                      persistent; reference `Implementation` enum parity)
  -p precision       32 | 16 (16 = bfloat16 weights, fp32 accumulation)
  -t iterations      timing repetitions (default 3; steady-state
                      average over back-to-back runs reported)

Output: the reference's `Sample rate: X kHz` line plus a JSON record.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-l", "--layers", type=int, default=20)
    ap.add_argument("-r", "--r_chans", type=int, default=64)
    ap.add_argument("-s", "--s_chans", type=int, default=128)
    ap.add_argument("-a", "--a_chans", type=int, default=256)
    ap.add_argument("-b", "--batch", type=int, default=1)
    ap.add_argument("-c", "--chunk", type=int, default=256)
    ap.add_argument("-n", "--samples", type=int, default=16384)
    ap.add_argument("-d", "--max_dilation", type=int, default=512)
    ap.add_argument("-m", "--mode", default="auto",
                    choices=["auto", "single", "dual", "persistent",
                             "manyblock"])
    ap.add_argument("-p", "--precision", type=int, default=32,
                    choices=[16, 32])
    ap.add_argument("-t", "--iters", type=int, default=3)
    ap.add_argument("--sampling", default="sample",
                    choices=["sample", "argmax"])
    args = ap.parse_args()

    import jax.numpy as jnp
    from nv_wavenet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer

    impl = {"auto": Impl.AUTO, "single": Impl.SINGLE_BLOCK,
            "dual": Impl.DUAL_BLOCK, "persistent": Impl.PERSISTENT,
            "manyblock": Impl.MANYBLOCK}[args.mode]
    wdt = jnp.bfloat16 if args.precision == 16 else jnp.float32

    print(f"Config: layers={args.layers} R={args.r_chans} S={args.s_chans} "
          f"A={args.a_chans} batch={args.batch} samples={args.samples} "
          f"max_dilation={args.max_dilation} chunk={args.chunk} "
          f"mode={args.mode} precision=fp{args.precision}", flush=True)

    from nv_wavenet_tpu.models import params as params_lib

    eng = WaveNetInfer(num_layers=args.layers, max_dilation=args.max_dilation,
                       R=args.r_chans, S=args.s_chans, A=args.a_chans,
                       max_batch=args.batch, implementation=impl,
                       chunk_size=args.chunk, weight_dtype=wdt)
    print(f"Resolved implementation: {eng._resolve_impl(args.batch).name}",
          flush=True)
    ref_w = params_lib.random_reference_weights(eng.cfg, seed=1)
    eng.set_reference_weights(ref_w)

    # inputs generated ON DEVICE (set_inputs takes them as-is): over a
    # tunneled TPU a host-side flagship cond tensor is GBs of upload
    import jax
    T = args.samples
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cond = jax.random.uniform(k1, (T, args.layers, args.batch,
                                   2 * args.r_chans), jnp.float32, -0.5, 0.5)
    sel = jax.random.uniform(k2, (T, args.batch), jnp.float32)
    eng.set_inputs(cond, sel)

    # warmup/compile (tail fetch forces execution; a full host fetch of y is
    # deliberately avoided — tunnel bandwidth varies wildly, see bench.py)
    tail = np.asarray(eng.run_device(T, args.batch, mode=args.sampling)[-1])
    assert tail.shape == (args.batch,)

    # timed: back-to-back device runs, one tiny forced fetch per run
    t0 = time.time()
    tails = [eng.run_device(T, args.batch, mode=args.sampling)[-1]
             for _ in range(args.iters)]
    for tl in tails:
        np.asarray(tl)
    rate = args.iters * T / (time.time() - t0) / 1e3

    print(f"Sample rate: {rate:.2f} kHz", flush=True)
    print(json.dumps({"khz_per_utterance": round(rate, 2),
                      "khz_total": round(rate * args.batch, 1),
                      "batch": args.batch, "mode": args.mode,
                      "precision": args.precision}), flush=True)


if __name__ == "__main__":
    main()
