"""TPU probe for the exact-math design: determines whether XLA:TPU and
Mosaic contract elementwise mul+add into FMA (XLA:CPU does — measured), and
cross-checks the exact_math implementations numpy-vs-TPU bit-for-bit.

Run on the real chip:  python tools/probe_exact_math_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from nv_wavenet_tpu.ops import exact_math as em  # noqa: E402


def bits(x):
    return np.asarray(x).view(np.int32)


def report(name, got, ref):
    n = int(np.sum(bits(got) != bits(ref)))
    print(f"{name}: {n}/{ref.size} mismatches vs numpy-separate")
    return n


def main():
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    n = 131072
    a = rng.uniform(-2, 2, n).astype(np.float32)
    b = rng.uniform(-2, 2, n).astype(np.float32)
    c = rng.uniform(-2, 2, n).astype(np.float32)

    sep = a * b + c
    fma = np.float32(a.astype(np.float64) * b.astype(np.float64)
                     + c.astype(np.float64))
    print("numpy separate vs fma64 differ at:",
          int(np.sum(bits(sep) != bits(fma))), "of", n)

    # 1) plain mul+add, XLA:TPU
    f = jax.jit(lambda a, b, c: a * b + c)
    x = np.asarray(f(a, b, c))
    report("XLA:TPU plain mul+add", x, sep)
    print("   (vs fma:", int(np.sum(bits(x) != bits(fma))), ")")

    # 2) barrier mul+add, XLA:TPU
    f2 = jax.jit(lambda a, b, c: jax.lax.optimization_barrier(a * b) + c)
    x2 = np.asarray(f2(a, b, c))
    report("XLA:TPU barrier mul+add", x2, sep)

    # 3) plain + barrier inside Pallas (2D shapes: TPU wants >=2D)
    a2, b2, c2 = (v.reshape(1024, 128) for v in (a, b, c))

    def kern_plain(ar, br, cr, orr):
        orr[...] = ar[...] * br[...] + cr[...]

    def kern_bar(ar, br, cr, orr):
        orr[...] = jax.lax.optimization_barrier(ar[...] * br[...]) + cr[...]

    for name, kern in [("plain", kern_plain), ("barrier", kern_bar)]:
        try:
            f3 = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32))
            x3 = np.asarray(f3(a2, b2, c2)).reshape(-1)
            report(f"Mosaic {name} mul+add", x3, sep)
            print("   (vs fma:", int(np.sum(bits(x3) != bits(fma))), ")")
        except Exception as e:  # noqa: BLE001
            print(f"Mosaic {name} mul+add FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")

    # 4) full exact_math functions: XLA:TPU and Mosaic vs numpy twins
    x_in = np.concatenate([
        rng.uniform(-90, 90, n // 2), rng.uniform(-4, 4, n // 4),
        rng.uniform(-0.6, 0.6, n // 4)]).astype(np.float32)
    x2d = x_in.reshape(-1, 128)
    for name, fn_np, fn_j in [("exp", em.exp_np, em.exp),
                              ("tanh", em.tanh_np, em.tanh),
                              ("sigmoid", em.sigmoid_np, em.sigmoid)]:
        ref = fn_np(x_in)
        got = np.asarray(jax.jit(fn_j)(jnp.asarray(x_in)))
        report(f"XLA:TPU exact_{name}", got, ref)
        try:
            fk = pl.pallas_call(
                lambda xr, orr, fn=fn_j: orr.__setitem__(..., fn(xr[...])),
                out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.float32))
            gk = np.asarray(fk(x2d)).reshape(-1)
            report(f"Mosaic  exact_{name}", gk, ref)
        except Exception as e:  # noqa: BLE001
            print(f"Mosaic exact_{name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")

    # 4b) canonical sampler: XLA:TPU and Mosaic vs numpy twin
    za = rng.uniform(-8, 8, (4096, 256)).astype(np.float32)
    sel = rng.uniform(0, 1, (4096, 1)).astype(np.float32)
    y_np = em.sample_from_logits_np(za, sel, 128)
    y_t = np.asarray(jax.jit(
        lambda z, s: em.sample_from_logits(z, s, 128))(za, sel))
    print("XLA:TPU sampler:", int(np.sum(y_np != y_t)), "mismatches")
    try:
        fk = pl.pallas_call(
            lambda zr, sr, orr: orr.__setitem__(
                ..., em.sample_from_logits(zr[...], sr[...], 128)[:, None]),
            out_shape=jax.ShapeDtypeStruct((4096, 1), jnp.int32))
        y_k = np.asarray(fk(za, sel))[:, 0]
        print("Mosaic  sampler:", int(np.sum(y_np != y_k)), "mismatches")
    except Exception as e:  # noqa: BLE001
        print(f"Mosaic sampler FAILED: {type(e).__name__}: {str(e)[:300]}")

    # 5) basic-op identity on TPU (div / floor / bitcast+shift path)
    d_np = a / np.abs(b)
    d_tpu = np.asarray(jax.jit(lambda a, b: a / jnp.abs(b))(a, b))
    report("XLA:TPU divide", d_tpu, d_np)
    big = (a * np.float32(64.0))
    fl_np = np.floor(big)
    fl_tpu = np.asarray(jax.jit(jnp.floor)(big))
    report("XLA:TPU floor", fl_tpu, fl_np)
    ki = np.clip(fl_np, -126, 127).astype(np.int32)
    sc_np = ((ki + np.int32(127)) << np.int32(23)).view(np.float32)

    def scale_j(k):
        return jax.lax.bitcast_convert_type(
            jax.lax.shift_left(k + jnp.int32(127), jnp.int32(23)),
            jnp.float32)

    sc_tpu = np.asarray(jax.jit(scale_j)(ki))
    report("XLA:TPU 2^k bit construction", sc_tpu, sc_np)
    try:
        fk = pl.pallas_call(
            lambda kr, orr: orr.__setitem__(..., scale_j(kr[...])),
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32))
        sck = np.asarray(fk(ki.reshape(1024, 128))).reshape(-1)
        report("Mosaic  2^k bit construction", sck, sc_np)
    except Exception as e:  # noqa: BLE001
        print(f"Mosaic 2^k FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
