#!/usr/bin/env python
"""Hardware low-precision contract check: runs the teacher-forced
distribution comparison (tests/test_low_precision.py methodology) COMPILED on
the real TPU, where fast_math / bf16 matmul precision actually differ from
fp32 (on CPU interpret, DEFAULT precision is exact fp32, so the CPU test only
bounds plumbing for fast_math).

Prints TV-distance stats for: bf16 weights, bf16 compute, fast_math — each vs
the fp32 kernel run — plus the exact-match check for bf16 weight storage.
Mirrors the reference's half-precision bar (`nv_wavenet_test.cu:296-298`:
p@1e-3 under T_data=half).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from nv_wavenet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from nv_wavenet_tpu.config import WaveNetConfig
    from nv_wavenet_tpu.ops import persistent
    from tests.test_low_precision import hot_case

    # flagship geometry, modest T*B (exactness is verified to 16k draws;
    # the distribution contract needs ~2k vectors)
    cfg = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=512)
    B, T, chunk = 8, 256, 64
    params, cond, sel, _ = hot_case(cfg, B, T, seed=7)

    def kernel_run(mode, sel_arr, **kw):
        gen = persistent.make_persistent_generator(cfg, B, chunk, mode=mode,
                                                   **kw)
        ring = persistent.init_ring(cfg, B)
        ys = jnp.full((2, B), cfg.silence_bin, jnp.int32)
        return gen(params, np.array([0]), jnp.asarray(cond),
                   jnp.asarray(sel_arr), ring, ys, n_valid=T)

    # fp32 free run -> forced trajectory
    out = kernel_run("sample", sel)
    forced = np.asarray(out[0]).astype(np.float32)          # [T, B]
    print("fp32 free run done", flush=True)

    def probs(**kw):
        out = kernel_run("forced", forced, **kw)
        p = np.asarray(out[-1], np.float64)
        return p / p.sum(-1, keepdims=True)

    p32 = probs()
    print("fp32 forced probs done", flush=True)

    def fused_probs(**kw):
        from nv_wavenet_tpu.ops import fused_chain
        gen = fused_chain.make_fused_generator(cfg, B, chunk, mode="forced",
                                               **kw)
        ring = persistent.init_ring(cfg, B)
        ys = jnp.full((2, B), cfg.silence_bin, jnp.int32)
        out = gen(params, np.array([0]), jnp.asarray(cond),
                  jnp.asarray(forced), ring, ys, n_valid=T)
        p = np.asarray(out[-1], np.float64)
        return p / p.sum(-1, keepdims=True)

    results = {}
    for label, pf, kw in [
            ("bf16_weights", probs, dict(weight_dtype=jnp.bfloat16)),
            ("bf16_compute", probs, dict(compute_dtype=jnp.bfloat16)),
            ("fast_math", probs, dict(fast_math=True)),
            # collapsed-chain fast decode (ops/fused_chain.py): fp32 fold,
            # and the fast variants it is designed to pair with
            ("fused_fp32", fused_probs, {}),
            ("fused_bf16_weights", fused_probs,
             dict(weight_dtype=jnp.bfloat16)),
            ("fused_fast_math", fused_probs, dict(fast_math=True)),
            ("fused_bf16_compute", fused_probs,
             dict(compute_dtype=jnp.bfloat16)),
            # tight R-lane gate packing (fuse_pack): same fold, smaller
            # chain K extent — TV must stay at reassociation level
            ("fused_pack_fp32", fused_probs, dict(pack_gates=True)),
            ("fused_pack_fast_math", fused_probs,
             dict(pack_gates=True, fast_math=True)),
            # int8 streamed stacks (MANYBLOCK tier): deterministic, so the
            # TV here is pure quantization error
            ("int8_stream", probs,
             dict(stream_weights=True, stream_quant=True))]:
        p = pf(**kw)
        t = 0.5 * np.abs(p - p32).sum(-1)
        results[label] = {"mean_tv": round(float(t.mean()), 5),
                          "p99_tv": round(float(np.percentile(t, 99)), 5),
                          "max_tv": round(float(t.max()), 5),
                          "max_elem": round(float(np.abs(p - p32).max()), 5)}
        print(f"{label}: {results[label]}", flush=True)

    # bf16 weight storage determinism on hardware: kernel free-run in bf16
    # weights twice -> identical sequences
    y1 = np.asarray(kernel_run("sample", sel,
                               weight_dtype=jnp.bfloat16)[0])
    y2 = np.asarray(kernel_run("sample", sel,
                               weight_dtype=jnp.bfloat16)[0])
    results["bf16_weights_deterministic"] = bool(np.array_equal(y1, y2))
    ok = (all(r["max_tv"] < 0.2 for r in results.values()
              if isinstance(r, dict))
          and results["bf16_weights_deterministic"])
    results["pass"] = bool(ok)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
