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
  -m mode            auto | persistent | manyblock | fused | fused_pack |
                      fused_fast (single/dual map to persistent; reference
                      `Implementation` enum parity; fused* = persistent
                      through the collapsed-chain kernel, _pack = tight
                      R-lane gate packing, _fast = single-pass MXU matmuls)
  -p precision       32 | 16 (16 = bfloat16 weights, fp32 accumulation)
  --compute 32|16    compute dtype (16 = bf16 activations+matmul inputs)
  --fast_math        fp32 storage, single-pass DEFAULT-precision matmuls
                     (the --use_fast_math analog; not bit-exact)
  --fused            collapsed-chain fast decode (ops/fused_chain.py):
                     dependent chain ~L+5 instead of 2L+3 matmuls/step;
                     distribution-contract accuracy, not bit-exact
  --stream_quant int8  MANYBLOCK: int8 streamed weight stacks (per-channel
                     scales, deterministic dequantize)
  -t iterations      timing repetitions (default 3; steady-state
                      average over back-to-back runs reported)
  -f device index    default-placement device (reference -f parity)
  --sweep            sweep mode x batch x chunk (the reference's documented
                     tuning workflow, `README.md:58-66`): ranked table +
                     best-config JSON.  --sweep_batches / --sweep_chunks /
                     --sweep_modes narrow the space.

Output: the reference's `Sample rate: X kHz` line plus a JSON record.
"""
import argparse
import json
import time

import numpy as np


# sweepable mode space: the reference's Implementation sweep plus this
# framework's fast-decode tiers, so the documented "sweep for the best
# rate" workflow (`README.md:58-66`) can actually surface the fastest
# configuration (fused+fast_math) rather than only the exact kernels
SWEEP_MODES_ALL = ("persistent", "manyblock", "fused", "fused_pack",
                   "fused_fast", "speculative")


def build_engine(args, impl, batch, chunk, mode=None):
    import jax.numpy as jnp

    from nv_wavenet_tpu.engine.wavenet_infer import WaveNetInfer

    wdt = jnp.bfloat16 if args.precision == 16 else jnp.float32
    cdt = jnp.bfloat16 if args.compute == 16 else jnp.float32
    # mode "fused*" = PERSISTENT through the collapsed-chain kernel;
    # "fused_pack" adds tight R-lane gate packing, "fused_fast" single-pass
    # MXU matmuls (the measured-fastest tier, BASELINE.md fast-tier table)
    fused = args.fused or (mode or "").startswith("fused")
    return WaveNetInfer(num_layers=args.layers, max_dilation=args.max_dilation,
                        R=args.r_chans, S=args.s_chans, A=args.a_chans,
                        max_batch=batch, implementation=impl,
                        chunk_size=chunk, weight_dtype=wdt,
                        compute_dtype=cdt,
                        fast_math=args.fast_math or mode == "fused_fast",
                        stream_group_size=args.stream_gs,
                        stream_prefetch=args.stream_prefetch,
                        stream_quant=args.stream_quant,
                        fuse_chain=fused,
                        fuse_pack=args.fused_pack or mode == "fused_pack")


def device_inputs(args, T, batch):
    """Inputs generated ON DEVICE (set_inputs takes them as-is): over a
    tunneled TPU a host-side flagship cond tensor is GBs of upload."""
    import jax
    import jax.numpy as jnp
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cond = jax.random.uniform(k1, (T, args.layers, batch,
                                   2 * args.r_chans), jnp.float32, -0.5, 0.5)
    sel = jax.random.uniform(k2, (T, batch), jnp.float32)
    return cond, sel


def measure(eng, T, batch, iters, sampling, mode=None, spec_window=256,
            spec_adaptive=False):
    """Tunnel-proof rate measurement: back-to-back device runs, one tiny
    forced tail fetch per run (see bench.py / CLAUDE.md)."""
    if mode == "speculative":
        if sampling != "sample":
            # ValueError (not SystemExit) so --sweep's per-config exception
            # net reports it as FAILED and keeps sweeping
            raise ValueError(
                f"-m speculative measures sampling mode 'sample' only "
                f"(speculative decode drafts/verifies sampled trajectories; "
                f"--sampling {sampling} would be mislabeled)")
        return measure_speculative(eng, T, batch, iters, spec_window,
                                   adaptive=spec_adaptive)
    # warmup/compile (tail fetch forces execution; a full host fetch of y is
    # deliberately avoided — tunnel bandwidth varies wildly)
    tail = np.asarray(eng.run_device(T, batch, mode=sampling)[-1])
    assert tail.shape == (batch,)
    t0 = time.time()
    tails = [eng.run_device(T, batch, mode=sampling)[-1]
             for _ in range(iters)]
    for tl in tails:
        np.asarray(tl)
    return iters * T / (time.time() - t0) / 1e3


def measure_speculative(eng, T, batch, iters, window, adaptive=False):
    """Speculative exact decode: same tail-fetch methodology; also reports
    the measured average committed run length (T / rounds).  adaptive=True
    measures the SELF-GOVERNING tier (probe + on-device branch pick,
    ops/speculative.make_adaptive_generator) and reports which branch the
    cost model chose."""
    y, rounds = eng._run_speculative_device(T, batch, window, adaptive)
    np.asarray(y[-1])
    tag = (f"adaptive branch="
           f"{ {0: f'window {window}', 1: f'window {window // 2}', 2: 'exact-fallback', -1: 'too-short'}.get(eng.spec_branch, '?')}, "
           if adaptive else "")
    print(f"  speculative window={window}: {tag}{int(rounds)} rounds, "
          f"avg committed run {T / max(int(rounds), 1):.1f} samples",
          flush=True)
    t0 = time.time()
    outs = [eng._run_speculative_device(T, batch, window, adaptive)
            for _ in range(iters)]
    for y, _ in outs:
        np.asarray(y[-1])
    return iters * T / (time.time() - t0) / 1e3


def run_single(args, impl_map):
    from nv_wavenet_tpu.models import params as params_lib

    impl = impl_map[args.mode]
    print(f"Config: layers={args.layers} R={args.r_chans} S={args.s_chans} "
          f"A={args.a_chans} batch={args.batch} samples={args.samples} "
          f"max_dilation={args.max_dilation} chunk={args.chunk} "
          f"mode={args.mode} precision=fp{args.precision} "
          f"compute=fp{args.compute} fast_math={args.fast_math}", flush=True)
    eng = build_engine(args, impl, args.batch, args.chunk, mode=args.mode)
    print(f"Resolved implementation: {eng._resolve_impl(args.batch).name}",
          flush=True)
    eng.set_reference_weights(
        params_lib.random_reference_weights(eng.cfg, seed=1))
    cond, sel = device_inputs(args, args.samples, args.batch)
    eng.set_inputs(cond, sel)
    rate = measure(eng, args.samples, args.batch, args.iters, args.sampling,
                   mode=args.mode, spec_window=args.spec_window,
                   spec_adaptive=args.spec_adaptive)
    print(f"Sample rate: {rate:.2f} kHz", flush=True)
    print(json.dumps({"khz_per_utterance": round(rate, 2),
                      "khz_total": round(rate * args.batch, 1),
                      "batch": args.batch, "mode": args.mode,
                      "precision": args.precision, "compute": args.compute,
                      "fast_math": args.fast_math}), flush=True)


def run_sweep(args, impl_map):
    """The reference's tuning workflow ('sweep -b/-c/-m for best rate',
    `README.md:58-66`, `nv_wavenet_perf.cu:203-254`) as one command: measure
    every (mode, batch, chunk), print a ranked table and the best config."""
    from nv_wavenet_tpu.models import params as params_lib

    batches = [int(b) for b in args.sweep_batches.split(",")]
    chunks = [int(c) for c in args.sweep_chunks.split(",")]
    modes = (list(SWEEP_MODES_ALL) if args.sweep_modes == "all"
             else args.sweep_modes.split(","))
    T = args.samples
    print(f"Sweep: layers={args.layers} R={args.r_chans} S={args.s_chans} "
          f"A={args.a_chans} maxD={args.max_dilation} T={T} "
          f"precision=fp{args.precision} compute=fp{args.compute} "
          f"fast_math={args.fast_math}", flush=True)
    print(f"  modes={modes} batches={batches} chunks={chunks}", flush=True)

    rows = []
    ref_w = None
    for batch in batches:
        cond, sel = device_inputs(args, T, batch)
        for mode in modes:
            for chunk in chunks:
                eng = build_engine(args, impl_map[mode], batch, chunk,
                                   mode=mode)
                if ref_w is None:
                    ref_w = params_lib.random_reference_weights(eng.cfg,
                                                                seed=1)
                resolved = eng._resolve_impl(batch).name
                eng.set_reference_weights(ref_w)
                eng.set_inputs(cond, sel)
                try:
                    rate = measure(eng, T, batch, args.iters, args.sampling,
                                   mode=mode, spec_window=args.spec_window,
                                   spec_adaptive=args.spec_adaptive)
                except Exception as e:   # report, keep sweeping (ref parity:
                    # unsupported configs print and continue)
                    print(f"  mode={mode:10s} b={batch:<3d} c={chunk:<4d} "
                          f"FAILED: {type(e).__name__}", flush=True)
                    continue
                row = {"mode": mode, "resolved": resolved, "batch": batch,
                       "chunk": chunk, "khz_per_utterance": round(rate, 2),
                       "khz_total": round(rate * batch, 1)}
                rows.append(row)
                print(f"  mode={mode:10s} b={batch:<3d} c={chunk:<4d} "
                      f"-> {rate:8.2f} kHz/utt  {rate * batch:9.1f} kHz total"
                      f"  [{resolved}]", flush=True)

    rows.sort(key=lambda r: -r["khz_total"])
    print("\nRanked by total throughput:", flush=True)
    for r in rows[:10]:
        print(f"  {r['khz_total']:9.1f} kHz total  "
              f"{r['khz_per_utterance']:8.2f} kHz/utt  "
              f"mode={r['mode']} b={r['batch']} c={r['chunk']}", flush=True)
    if rows:
        best = rows[0]
        best_utt = max(rows, key=lambda r: r["khz_per_utterance"])
        print(f"\nBest total: {json.dumps(best)}", flush=True)
        print(f"Best per-utterance: {json.dumps(best_utt)}", flush=True)


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
                             "manyblock", "fused", "fused_pack",
                             "fused_fast", "speculative"])
    ap.add_argument("--spec_adaptive", action="store_true",
                    help="mode speculative: measure the SELF-GOVERNING "
                         "adaptive tier (on-device probe picks window / "
                         "window/2 / exact-kernel fallback; "
                         "ops/speculative.make_adaptive_generator)")
    ap.add_argument("--spec_window", type=int, default=256,
                    help="speculative exact decode: draft window K (mode "
                         "speculative — bit-exact contract output drafted "
                         "by the fused fast kernel, ops/speculative.py); "
                         "256 is the measured b=1 flagship optimum")
    ap.add_argument("-p", "--precision", type=int, default=32,
                    choices=[16, 32])
    ap.add_argument("--compute", type=int, default=32, choices=[16, 32])
    ap.add_argument("--fast_math", action="store_true")
    ap.add_argument("--fused_pack", action="store_true",
                    help="with --fused: tight R-lane gate packing (for "
                         "R<128 halves the dependent chain matmuls' K "
                         "extent and the G stack's VMEM)")
    ap.add_argument("--fused", action="store_true",
                    help="collapsed-chain fast decode (ops/fused_chain.py): "
                         "~L+5 dependent matmuls/step instead of 2L+3; "
                         "distribution-contract accuracy, not bit-exact")
    ap.add_argument("--stream_gs", type=int, default=8,
                    help="MANYBLOCK: layers per weight-DMA group")
    ap.add_argument("--stream_prefetch", action="store_true",
                    help="MANYBLOCK: prefetch next step's first group")
    ap.add_argument("--stream_quant", choices=["int8"], default=None,
                    help="MANYBLOCK: int8 storage of the streamed weight "
                         "stacks (per-channel scales, deterministic "
                         "dequantize; halves HBM weight traffic vs bf16)")
    ap.add_argument("-t", "--iters", type=int, default=3)
    ap.add_argument("-f", "--device", type=int, default=0,
                    help="device index (reference -f parity): pins default "
                         "placement to jax.devices()[f]")
    ap.add_argument("--sampling", default="sample",
                    choices=["sample", "argmax"])
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--sweep_batches", default="1,8,16,64")
    ap.add_argument("--sweep_chunks", default="64,256")
    ap.add_argument("--sweep_modes",
                    default="persistent,manyblock,fused_fast",
                    help="comma list from "
                         "persistent,manyblock,fused,fused_pack,fused_fast "
                         "or 'all' (fused_* = collapsed-chain fast tiers; "
                         "the default includes the measured-fastest one)")
    args = ap.parse_args()

    from nv_wavenet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.device is not None:
        import jax
        jax.config.update("jax_default_device", jax.devices()[args.device])

    from nv_wavenet_tpu.engine.wavenet_infer import Impl

    impl_map = {"auto": Impl.AUTO, "single": Impl.SINGLE_BLOCK,
                "dual": Impl.DUAL_BLOCK, "persistent": Impl.PERSISTENT,
                "manyblock": Impl.MANYBLOCK, "fused": Impl.PERSISTENT,
                "fused_pack": Impl.PERSISTENT, "fused_fast": Impl.PERSISTENT,
                "speculative": Impl.PERSISTENT}
    if args.sweep:
        run_sweep(args, impl_map)
    else:
        run_single(args, impl_map)


if __name__ == "__main__":
    main()
