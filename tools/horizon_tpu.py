"""Exactness-horizon measurement: integer-mismatch counts between compute
paths at production scale (flagship geometry, T=16384 x B=16 = 262,144
draws), updating the docs/DESIGN.md horizon table.

Round-4 status quo: transcendental lowerings + TPU's non-correctly-rounded
fp32 divide flipped ~1e-5/sample beyond ~16k draws.  Round 5 ships ONE
bit-identical polynomial library (ops/exact_math.py) and a division-free
canonical sampler across golden + C++ + scan + kernel + scorer; this tool
verifies the contract now holds at the full 262,144-draw horizon on real
hardware:

  pairings: TPU Pallas kernel (Mosaic)  vs  C++ oracle (host CPU)
            TPU XLA scan               vs  C++ oracle
            TPU kernel                 vs  TPU scan

Tunnel-proof: conditioning/selectors are never transferred — both sides
generate them independently from the same jax.random keys (threefry is
bit-deterministic across backends; the range transform is exactness-safe:
uniform(0,1) then a single exactly-rounded subtract).  Runs chunked with
carried state (4 x 4096), which also exercises ragged-boundary exactness at
scale.  Reference contract being beaten: `nv_wavenet_test.cu:302-304`
verifies 128 draws; this verifies 2048x that.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from nv_wavenet_tpu.config import WaveNetConfig            # noqa: E402
from nv_wavenet_tpu.models import params as params_lib     # noqa: E402
from nv_wavenet_tpu.ops import persistent, scan_generate   # noqa: E402
from nv_wavenet_tpu.utils import native                    # noqa: E402


def chunk_inputs(seed, i, T_c, L, B, R, backend):
    """Chunk i's (cond, sel) on the given backend — identical bits on CPU
    and TPU (threefry + exactly-rounded range shift).  ALL key ops happen
    inside the backend context: shipping a TPU-resident key to the CPU
    backend wedges in the cross-backend transfer over the tunnel."""
    dev = jax.local_devices(backend=backend)[0]
    with jax.default_device(dev):
        k = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        k1, k2 = jax.random.split(k)
        cond = jax.random.uniform(k1, (T_c, L, B, 2 * R), jnp.float32
                                  ) - jnp.float32(0.5)
        sel = jax.random.uniform(k2, (T_c, B), jnp.float32)
        return jax.block_until_ready(cond), jax.block_until_ready(sel)


def main():
    print("devices:", jax.devices())
    cfg = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=512)
    B, T, T_c = 16, 16384, 4096
    L, R = cfg.num_layers, cfg.R
    n_chunks = T // T_c
    print(f"flagship {cfg.num_layers}L {R}R/{cfg.S}S/{cfg.A}A maxD="
          f"{cfg.max_dilation}, B={B}, T={T} -> {T * B} draws")

    ref_w = params_lib.random_reference_weights(cfg, seed=1)
    canon = params_lib.to_canonical(ref_w, cfg)
    params = {k: jnp.asarray(v) for k, v in canon.items()}
    base_key = 42

    # cross-backend input identity: the whole tool rests on CPU and TPU
    # producing the same input bits from the same key
    ch, sh = chunk_inputs(base_key, 0, 8, L, B, R, "cpu")
    ct, st_ = chunk_inputs(base_key, 0, 8, L, B, R, "tpu")
    assert np.array_equal(np.asarray(ch), np.asarray(ct))
    assert np.array_equal(np.asarray(sh), np.asarray(st_))
    print("cross-backend input identity OK")

    # --- C++ oracle (host), chunked with carried state ---
    assert native.available()
    oracle = native.NativeGolden(cfg)
    oracle.set_canonical_params(canon)
    y_cpp = []
    t0 = time.time()
    for i in range(n_chunks):
        cond_h, sel_h = chunk_inputs(base_key, i, T_c, L, B, R, "cpu")
        y_cpp.append(oracle.run(np.asarray(cond_h), np.asarray(sel_h),
                                reset=(i == 0)))
    y_cpp = np.concatenate(y_cpp, axis=1)                   # [B, T]
    print(f"C++ oracle: {time.time() - t0:.1f}s")

    # --- TPU Pallas kernel, chunked with carried ring/y_state ---
    gen = jax.jit(persistent.make_persistent_generator(cfg, B, 256))
    ring = persistent.init_ring(cfg, B)
    ys = jnp.full((2, B), cfg.silence_bin, jnp.int32)
    y_kern = []
    t0 = time.time()
    for i in range(n_chunks):
        cond_d, sel_d = chunk_inputs(base_key, i, T_c, L, B, R, "tpu")
        y, ring, ys = gen(params, np.array([i * T_c]), cond_d, sel_d,
                          ring, ys)
        y_kern.append(np.asarray(y).T)                      # [B, T_c]
    y_kern = np.concatenate(y_kern, axis=1)
    print(f"TPU kernel: {time.time() - t0:.1f}s (incl. compile)")

    # --- TPU XLA scan, chunked with carried GenState ---
    st = scan_generate.init_state(cfg, B)
    y_scan = []
    t0 = time.time()
    for i in range(n_chunks):
        cond_d, sel_d = chunk_inputs(base_key, i, T_c, L, B, R, "tpu")
        st, y, _ = scan_generate.generate(params, st, cond_d, sel_d, cfg)
        y_scan.append(np.asarray(y))                        # [B, T_c]
    y_scan = np.concatenate(y_scan, axis=1)
    print(f"TPU scan: {time.time() - t0:.1f}s (incl. compile)")

    draws = T * B
    rows = [("TPU kernel (Mosaic) vs C++ oracle", y_kern, y_cpp),
            ("TPU scan (XLA)      vs C++ oracle", y_scan, y_cpp),
            ("TPU kernel          vs TPU scan  ", y_kern, y_scan)]
    print(f"\n=== horizon table ({draws} draws) ===")
    worst = 0
    for name, a, b in rows:
        n = int(np.sum(a != b))
        worst = max(worst, n)
        print(f"{name}: {n}/{draws} mismatches")
        if n:
            idx = np.argwhere(a != b)[:5]
            for bi, ti in idx:
                print(f"   first diffs: b={bi} t={ti} "
                      f"{a[bi, ti]} vs {b[bi, ti]}")
    print("HORIZON CHECK " + ("PASSED: exact at 262,144 draws on all "
                              "pairings" if worst == 0 else "FAILED"))
    return 0 if worst == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
