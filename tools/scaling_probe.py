"""Multi-chip scaling-efficiency harness: utterances/sec vs mesh size.

The BASELINE target is "~linear utterances/sec scaling at 1 chip -> 1 host
-> pod slice, batch data-parallel, no cross-chip traffic in the sample
loop" (BASELINE.md, mirroring the reference's one-block-group-per-
utterance batch parallelism, `nv_wavenet_singleblock.cuh:264`).  This tool
measures that curve on whatever devices the backend exposes: each mesh
size n runs the SAME per-chip workload (batch = per_chip_batch * n,
weights replicated, utterance batch sharded on the 'data' axis), so ideal
scaling holds per-utterance kHz constant while total samples/sec grows
linearly with n.

On a v5e pod slice this measures real ICI-mesh scaling.  For harness
validation without a pod, run on the CPU backend with virtual devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_probe.py --mesh_sizes 1,2,4,8 -n 64 ...

(unit smoke test: tests/test_scaling_probe.py).  Timing uses the
tunnel-proof pattern: inputs upload once in set_inputs (device-resident
after that), the timed region dispatches back-to-back runs and
force-fetches only each run's final time-slice.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def measure_mesh_size(cfg, n, per_chip_batch, chunk, T, iters, interpret):
    from nv_wavenet_tpu.engine.wavenet_infer import WaveNetInfer
    from nv_wavenet_tpu.models import params as params_lib
    from nv_wavenet_tpu.parallel import mesh as mesh_lib

    B = per_chip_batch * n
    mesh = mesh_lib.data_mesh(n) if n > 1 else None
    eng = WaveNetInfer(num_layers=cfg.num_layers,
                       max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                       A=cfg.A, max_batch=B, chunk_size=chunk,
                       interpret=interpret, mesh=mesh)
    eng.set_reference_weights(params_lib.random_reference_weights(cfg, seed=1))
    rng = np.random.RandomState(0)
    cond = rng.uniform(-0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)
    eng.set_inputs(cond, sel)           # one upload; device-resident after

    np.asarray(eng.run_device(T, B)[-1])            # warmup/compile
    t0 = time.time()
    tails = [eng.run_device(T, B)[-1] for _ in range(iters)]
    for tl in tails:
        np.asarray(tl)
    dt = (time.time() - t0) / iters
    khz_utt = T / dt / 1e3
    return {"mesh_size": n, "batch": B, "khz_per_utt": round(khz_utt, 2),
            "khz_total": round(khz_utt * B, 1),
            "samples_per_sec_per_chip": round(khz_utt * B * 1e3 / n, 0)}


def hlo_collective_census(cfg, n, per_chip_batch, chunk):
    """Compile the sharded generator for an n-device mesh and count
    collective ops in the optimized HLO.  The scaling claim's structural
    basis is that the sample loop is communication-free (weights replicated,
    batch sharded, per-chip state) — on a virtual CPU mesh the TIMING is
    contention-noise, but the compiled module is the same program XLA would
    run on a pod, so a zero census here transfers to real ICI."""
    import jax
    import jax.numpy as jnp

    from nv_wavenet_tpu.models import params as params_lib
    from nv_wavenet_tpu.ops import persistent
    from nv_wavenet_tpu.parallel import mesh as mesh_lib

    B = per_chip_batch * n
    T = chunk          # one grid step suffices (the generator requires
    mesh = mesh_lib.data_mesh(n)  # T % chunk == 0; collectives would appear
    gen = mesh_lib.make_sharded_persistent_generator(  # at any grid size)
        cfg, mesh, per_chip_batch, chunk, interpret=True, prefold_cond=True)
    shapes = {k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
              for k, v in params_lib.to_canonical(
                  params_lib.random_reference_weights(cfg, seed=0),
                  cfg).items()}
    ring = persistent.init_ring(cfg, B)
    args = (shapes, jax.ShapeDtypeStruct((3,), jnp.int32),
            jax.ShapeDtypeStruct((T, cfg.num_layers, B, 2 * cfg.R),
                                 jnp.float32),
            jax.ShapeDtypeStruct((T, B), jnp.float32),
            jax.ShapeDtypeStruct(ring.shape, ring.dtype),
            jax.ShapeDtypeStruct((2, B), jnp.int32))
    txt = gen.lower(*args).compile().as_text()
    census = {op: txt.count(op) for op in
              ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")}
    return census


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-l", "--layers", type=int, default=20)
    ap.add_argument("-r", "--r_chans", type=int, default=64)
    ap.add_argument("-s", "--s_chans", type=int, default=256)
    ap.add_argument("-a", "--a_chans", type=int, default=256)
    ap.add_argument("-d", "--max_dilation", type=int, default=512)
    ap.add_argument("-b", "--per_chip_batch", type=int, default=16)
    ap.add_argument("-c", "--chunk", type=int, default=256)
    ap.add_argument("-n", "--samples", type=int, default=4096)
    ap.add_argument("-t", "--iters", type=int, default=3)
    ap.add_argument("--mesh_sizes", default=None,
                    help="comma list; default 1..n_devices in powers of 2")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="run on N virtual CPU devices (harness/sharding "
                         "validation without a pod; this machine's "
                         "sitecustomize ignores JAX_PLATFORMS, so the "
                         "switch must happen in-process)")
    args = ap.parse_args(argv)

    if args.cpu:
        if "--xla_force_host_platform_device_count" not in os.environ.get(
                "XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.cpu}")
        import jax
        jax.config.update("jax_platforms", "cpu")

    from nv_wavenet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from nv_wavenet_tpu.config import WaveNetConfig

    n_dev = len(jax.devices())
    if args.mesh_sizes:
        sizes = [int(s) for s in args.mesh_sizes.split(",")]
    else:
        sizes, n = [], 1
        while n <= n_dev:
            sizes.append(n)
            n *= 2
    cfg = WaveNetConfig(num_layers=args.layers, R=args.r_chans,
                        S=args.s_chans, A=args.a_chans,
                        max_dilation=args.max_dilation)
    interpret = args.interpret or jax.default_backend() == "cpu"

    rows = []
    for n in sizes:
        assert n <= n_dev, f"mesh size {n} > {n_dev} visible devices"
        rec = measure_mesh_size(cfg, n, args.per_chip_batch, args.chunk,
                                args.samples, args.iters, interpret)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    base = rows[0]
    census = hlo_collective_census(cfg, max(sizes), args.per_chip_batch,
                                   args.chunk)
    summary = {
        "scaling": rows,
        # linear-scaling efficiency at the largest mesh: total throughput
        # relative to mesh_size x the smallest mesh's total.  On virtual CPU
        # meshes all "devices" share the host's cores, so this measures core
        # contention, not ICI scaling — the structural evidence there is the
        # collective census (zero = each chip's sample loop is independent)
        "efficiency": round(
            (rows[-1]["khz_total"] / rows[-1]["mesh_size"])
            / (base["khz_total"] / base["mesh_size"]), 3),
        "hlo_collectives": census,
    }
    print(json.dumps(summary), flush=True)
    assert not any(census.values()), (
        f"collectives appeared in the sharded sample loop: {census}")
    return summary


if __name__ == "__main__":
    main()
