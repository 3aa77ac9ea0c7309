"""Microbenchmark: the per-stage cost of a chain of DEPENDENT small matmuls
inside a Pallas TPU kernel — the "speed of light" for this workload.

Both generation tiers are bound by dependent-matmul chains (exact: 2L+3
stages, fused: ~L+5 stages; docs/DESIGN.md).  This probe strips away all
WaveNet math and measures the irreducible cost of `x -> matmul -> gate -> x`
at flagship shapes ([B,R] @ [R,2R], R=64), so the kernels' measured
ns/stage can be compared against the hardware floor rather than an assumed
constant (the `stage_ns=200` in utils/profiling.StepCost).

Variants:
  * precision HIGHEST (6-pass exact fp32) vs DEFAULT (single-pass bf16-in)
    — how much of the 200 ns is the multi-pass fp32 decomposition,
  * gate on/off — how much is the VPU tanh*sigmoid between matmuls,
  * batch sweep — where per-stage cost starts growing with B,
  * groups=2 — two INDEPENDENT chains interleaved in the same loop body:
    if stages are latency-bound (MXU idle between dependent issues), the
    second chain rides free and aggregate stage throughput ~doubles.

Tunnel-proof: weights/state generated on device, K pipelined dispatches,
tail-element fetch (see bench.py docstring).
"""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nv_wavenet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()


def make_chain(B, R, D, T, precision, gate=True, groups=1):
    """Kernel: T steps, each a chain of D dependent [B,R]@[R,2R] matmuls
    (optionally gated tanh*sigmoid between stages, like the WaveNet layer
    chain).  groups>1 advances that many independent chains per step."""

    def kernel(w_ref, x_ref, o_ref):
        def stage(x, d):
            z = jnp.dot(x, w_ref[d], preferred_element_type=jnp.float32,
                        precision=precision)
            if gate:
                return jnp.tanh(z[:, :R]) * jax.nn.sigmoid(z[:, R:])
            return z[:, :R] + z[:, R:]

        def step(t, xs):
            return tuple(
                # fold t in (free VPU add) so the loop cannot be hoisted
                stage_chain(x + (t == -1).astype(jnp.float32)) for x in xs)

        def stage_chain(x):
            for d in range(D):
                x = stage(x, d)
            return x

        xs = tuple(x_ref[g] for g in range(groups))
        xs = jax.lax.fori_loop(0, T, step, xs)
        for g in range(groups):
            o_ref[g] = xs[g]

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((D, R, 2 * R), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((groups, B, R), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((groups, B, R), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((groups, B, R), jnp.float32),
        interpret=os.environ.get("PROBE_INTERPRET") == "1",
    )


def measure(label, B=16, R=64, D=43, T=16384, precision="highest", gate=True,
            groups=1, iters=3):
    # T sized so one run is >= ~100 ms of chain compute: with ~40 ms of
    # tunnel RTT per forced fetch, short runs over-report ns/stage badly
    # (the round-4 first cut used T=2048 and read ~3x high)
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    run = jax.jit(make_chain(B, R, D, T, prec, gate, groups))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    # scale keeps the gateless chain from blowing up/underflowing fast
    w = jax.random.uniform(k1, (D, R, 2 * R), jnp.float32, -0.15, 0.15)
    x = jax.random.uniform(k2, (groups, B, R), jnp.float32, -1.0, 1.0)
    np.asarray(run(w, x)[0, 0, 0])                      # compile + warm
    t0 = time.time()
    outs = [run(w, x) for _ in range(iters)]
    # the device executes dispatches in order, so fetching only the LAST
    # run's output forces all of them with ONE tunnel round trip (~40 ms),
    # amortized over iters*T*D stages (~19 ns/stage at the defaults)
    np.asarray(outs[-1][0, 0, 0])
    dt = (time.time() - t0) / iters
    ns = dt / (T * D) * 1e9
    agg = ns / groups
    print(f"{label:46s}: {ns:7.1f} ns/stage"
          + (f"  ({agg:6.1f} ns/stage aggregate over {groups} chains)"
             if groups > 1 else ""), flush=True)
    return ns


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    print(f"chain microbench: [B,64] @ [64,128] dependent stages, D=43/step")
    measure("HIGHEST + gate (exact-kernel analog)", precision="highest")
    measure("HIGHEST, no gate", precision="highest", gate=False)
    measure("DEFAULT + gate (fast-tier analog)", precision="default")
    measure("DEFAULT, no gate", precision="default", gate=False)
    print("batch sweep (DEFAULT + gate):", flush=True)
    for B in (1, 16, 64, 128):
        measure(f"  B={B}", B=B, precision="default")
    print("batch sweep (HIGHEST + gate):", flush=True)
    for B in (1, 16, 64, 128):
        measure(f"  B={B}", B=B, precision="highest")
    print("independent-chain interleave (latency hiding):", flush=True)
    measure("DEFAULT + gate, groups=2", precision="default", groups=2)
    measure("DEFAULT + gate, groups=4", precision="default", groups=4)
    measure("HIGHEST + gate, groups=2", precision="highest", groups=2)
    measure("R=128 DEFAULT + gate", R=128, precision="default")
