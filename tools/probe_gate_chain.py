#!/usr/bin/env python
"""Dependent-chain latency of the gated activation: native tanh/sigmoid vs
the bit-identical exact_math lowering — quantifies what the canonical
transcendental library costs the exact kernel's per-sample chain.

History (round 5): the first adoption (Horner + Newton + unconditional FMA
guards) cost +73 ns/layer-stage over the native gate and regressed the
headline 117 -> 102.7 kHz.  Two fixes, both measured here: (1) the FMA
guards are backend-conditional (value identity; only XLA:CPU contracts) —
53 ns/layer back; (2) polynomials evaluate in Estrin form and the Newton
reciprocal became one degree-9 polynomial — roughly halves the remaining
dependent depth.

Method (same dependent-chain trick as tools/probe_stage.py): a fori_loop of
N iterations whose body feeds its output back into its input, so the loop
time is N * (stage latency); subtracting a near-empty loop removes loop
overhead.  Run on TPU.
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

from nv_wavenet_tpu.ops import exact_math as em

B, R = 16, 64
N = 20000


def timed(name, body, reps=3):
    @jax.jit
    def run(z0):
        def step(i, z):
            out = body(z)
            # keep magnitude bounded, dependence intact
            return out * jnp.float32(0.25) + z * jnp.float32(0.5)
        return jax.lax.fori_loop(0, N, step, z0)

    z0 = jnp.asarray(np.random.RandomState(0).uniform(-2, 2, (B, 2 * R))
                     .astype(np.float32))
    np.asarray(run(z0))  # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        np.asarray(run(z0))
        best = min(best, time.time() - t0)
    ns = best / N * 1e9
    print(f"  {name:34s} {ns:8.1f} ns/iter", flush=True)
    return ns


def gate_native(z):
    h = jnp.tanh(z[:, :R]) * jax.nn.sigmoid(z[:, R:])
    return jnp.concatenate([h, h], axis=1)


def gate_exact(z):
    h = em.tanh(z[:, :R]) * em.sigmoid(z[:, R:])
    return jnp.concatenate([h, h], axis=1)


def softmax_native(z):
    e = jnp.exp(z - jnp.max(z, axis=-1, keepdims=True))
    return z * jnp.float32(0.9) + e * jnp.float32(0.01)


def softmax_exact(z):
    e, cum = em.softmax_cumsum(z)
    return z * jnp.float32(0.9) + (e + cum) * jnp.float32(0.005)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    base = timed("identity (loop overhead)", lambda z: z)
    nat = timed("native tanh*sigmoid", gate_native)
    exa = timed("exact_math tanh*sigmoid", gate_exact)
    sn = timed("native stable softmax e", softmax_native)
    se = timed("exact softmax_cumsum", softmax_exact)
    print(f"\n  native gate:          {nat - base:7.1f} ns")
    print(f"  exact gate:           {exa - base:7.1f} ns  "
          f"(delta {exa - nat:+.1f} ns/layer-stage)")
    print(f"  native softmax-e:     {sn - base:7.1f} ns")
    print(f"  exact softmax+cumsum: {se - base:7.1f} ns")
    print(f"  20-layer chain delta estimate: {(exa - nat) * 20 / 1e3:.2f} us/step")
