#!/usr/bin/env python
"""Run the BASELINE.json config ladder on the real TPU and record measured
numbers (appended to BASELINE.md by hand; printed as JSON lines here).

Configs (BASELINE.json):
 1. 20L 32R/128S/256A maxD=128 batch=1 fp32  — exact vs golden + kHz
 2. 24L 64R/128S/256A batch=8 argmax          — bit-match vs golden + kHz
 3. 30L 64R/256S/256A bf16 weights batch=16   — stochastic sampling kHz
 4. 40L 128R/256S/256A batch=64 manyblock     — HBM-streaming kHz
 5. flagship 20L 64R/256S/256A maxD=512 b=16  — headline (bench.py config)

Usage: python tools/baseline_sweep.py [--samples N] [--skip-golden]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_config(name, cfg, batch, T, chunk, impl, mode, weight_dtype,
               check_golden_samples=0, compute_dtype=None, fast_math=False,
               fuse_chain=False, fuse_pack=False):
    import jax
    import jax.numpy as jnp

    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer
    from nv_wavenet_tpu.models import params as params_lib
    from nv_wavenet_tpu.models.golden import WaveNetGolden

    eng = WaveNetInfer(num_layers=cfg.num_layers, max_dilation=cfg.max_dilation,
                       R=cfg.R, S=cfg.S, A=cfg.A, max_batch=batch,
                       implementation=impl, chunk_size=chunk,
                       fuse_pack=fuse_pack,
                       weight_dtype=weight_dtype,
                       compute_dtype=compute_dtype or jnp.float32,
                       fast_math=fast_math, fuse_chain=fuse_chain)
    ref_w = params_lib.random_reference_weights(cfg, seed=1)
    eng.set_reference_weights(ref_w)
    # conditioning generated ON DEVICE (production conditioning comes from
    # the on-device cond network; avoids host->device transfer of GBs)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cond = jax.random.uniform(k1, (T, cfg.num_layers, batch, 2 * cfg.R),
                              jnp.float32, -0.5, 0.5)
    sel = jax.random.uniform(k2, (T, batch), jnp.float32)
    eng.set_inputs(cond, sel)

    exact = None
    if check_golden_samples:
        n = check_golden_samples
        cond_h, sel_h = np.asarray(cond[:n]), np.asarray(sel[:n])
        golden = WaveNetGolden(cfg, batch, n)
        golden.set_reference_weights(ref_w)
        golden.set_inputs(cond_h, sel_h)
        y_gold = golden.run(n, batch, mode=mode)
        eng.set_inputs(cond_h, sel_h)
        y_eng = eng.run(n, batch, mode=mode)
        exact = bool(np.array_equal(y_gold, y_eng))
        eng.set_inputs(cond, sel)

    # warmup/compile; timed region uses back-to-back device runs with a tiny
    # tail fetch per run (tunnel-proof pattern, see bench.py docstring)
    np.asarray(eng.run_device(T, batch, mode=mode)[-1])
    iters = 3
    t0 = time.time()
    tails = [eng.run_device(T, batch, mode=mode)[-1] for _ in range(iters)]
    for tl in tails:
        np.asarray(tl)
    best = iters * T / (time.time() - t0) / 1e3
    rec = {"config": name, "impl": eng._resolve_impl(batch).name,
           "khz_per_utt": round(best, 2), "khz_total": round(best * batch, 1),
           "batch": batch, "samples": T,
           "weight_dtype": str(np.dtype(weight_dtype).name
                               if weight_dtype == np.float32 else "bfloat16"),
           "compute": ("fp32" if compute_dtype is None
                       else str(np.dtype(compute_dtype).name)
                       .replace("bfloat16", "bf16")
                       .replace("float32", "fp32")),
           "fast_math": fast_math, "fused": fuse_chain}
    if exact is not None:
        rec["exact_match_vs_golden"] = exact
    print(json.dumps(rec), flush=True)
    return rec


def run_speculative_row(name, cfg, batch, T, window,
                        check_golden_samples=0):
    """Speculative exact decode row: same tunnel-proof timing; the golden
    check asserts the defining BIT-MATCH property on a prefix."""
    import jax
    import jax.numpy as jnp

    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer
    from nv_wavenet_tpu.models import params as params_lib
    from nv_wavenet_tpu.models.golden import WaveNetGolden

    eng = WaveNetInfer(num_layers=cfg.num_layers,
                       max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                       A=cfg.A, max_batch=batch,
                       implementation=Impl.PERSISTENT, chunk_size=256)
    ref_w = params_lib.random_reference_weights(cfg, seed=1)
    eng.set_reference_weights(ref_w)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cond = jax.random.uniform(k1, (T, cfg.num_layers, batch, 2 * cfg.R),
                              jnp.float32, -0.5, 0.5)
    sel = jax.random.uniform(k2, (T, batch), jnp.float32)
    eng.set_inputs(cond, sel)

    exact = None
    if check_golden_samples:
        n = check_golden_samples
        cond_h, sel_h = np.asarray(cond[:n]), np.asarray(sel[:n])
        golden = WaveNetGolden(cfg, batch, n)
        golden.set_reference_weights(ref_w)
        golden.set_inputs(cond_h, sel_h)
        y_gold = golden.run(n, batch)
        eng.set_inputs(cond_h, sel_h)
        exact = bool(np.array_equal(eng.run_speculative(n, batch, window),
                                    y_gold))
        eng.set_inputs(cond, sel)

    y, rounds = eng._run_speculative_device(T, batch, window)
    np.asarray(y[-1])
    avg_run = T / max(int(rounds), 1)
    iters = 3
    t0 = time.time()
    outs = [eng._run_speculative_device(T, batch, window)
            for _ in range(iters)]
    for y, _ in outs:
        np.asarray(y[-1])
    best = iters * T / (time.time() - t0) / 1e3
    rec = {"config": name, "impl": "SPECULATIVE", "khz_per_utt":
           round(best, 2), "khz_total": round(best * batch, 1),
           "batch": batch, "samples": T, "weight_dtype": "float32",
           "compute": "fp32", "fast_math": False, "fused": False,
           "spec_window": window, "avg_committed_run": round(avg_run, 1)}
    if exact is not None:
        rec["exact_match_vs_golden"] = exact
    print(json.dumps(rec), flush=True)
    return rec


def main():
    from nv_wavenet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=8192)
    ap.add_argument("--skip-golden", action="store_true")
    # 512-sample exact-match window: long enough that any float-association
    # divergence between implementations would be caught (~8k draws/config)
    args = ap.parse_args()

    import jax.numpy as jnp

    from nv_wavenet_tpu.config import WaveNetConfig
    from nv_wavenet_tpu.engine.wavenet_infer import Impl

    T = args.samples
    g = 0 if args.skip_golden else 512
    recs = []
    recs.append(run_config(
        "1_20L_32R_128S_fp32_b1",
        WaveNetConfig(num_layers=20, R=32, S=128, A=256, max_dilation=128),
        1, T, 256, Impl.PERSISTENT, "sample", jnp.float32,
        check_golden_samples=g))
    recs.append(run_config(
        "2_24L_64R_128S_argmax_b8",
        WaveNetConfig(num_layers=24, R=64, S=128, A=256, max_dilation=128),
        8, T, 256, Impl.PERSISTENT, "argmax", jnp.float32,
        check_golden_samples=g))
    recs.append(run_config(
        "3_30L_64R_256S_bf16_b16",
        WaveNetConfig(num_layers=30, R=64, S=256, A=256, max_dilation=128),
        16, T, 256, Impl.PERSISTENT, "sample", jnp.bfloat16))
    recs.append(run_config(
        "4_40L_128R_256S_manyblock_b64",
        WaveNetConfig(num_layers=40, R=128, S=256, A=256, max_dilation=128),
        64, max(T // 8, 512), 256, Impl.MANYBLOCK, "sample", jnp.float32))
    recs.append(run_config(
        "5_flagship_20L_64R_256S_maxd512_b16",
        WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=512),
        16, T, 256, Impl.PERSISTENT, "sample", jnp.float32,
        check_golden_samples=g))
    # fast modes on the flagship (distribution-allclose contract,
    # tests/test_low_precision.py + tools/lowprec_tpu.py)
    flagship = WaveNetConfig(num_layers=20, R=64, S=256, A=256,
                             max_dilation=512)
    recs.append(run_config("5b_flagship_bf16_weights", flagship, 16, T, 256,
                           Impl.PERSISTENT, "sample", jnp.bfloat16))
    recs.append(run_config("5c_flagship_bf16_compute", flagship, 16, T, 256,
                           Impl.PERSISTENT, "sample", jnp.bfloat16,
                           compute_dtype=jnp.bfloat16))
    recs.append(run_config("5d_flagship_fast_math", flagship, 16, T, 256,
                           Impl.PERSISTENT, "sample", jnp.float32,
                           fast_math=True))
    # collapsed-chain fast decode tiers (ops/fused_chain.py)
    recs.append(run_config("5e_flagship_fused_fp32", flagship, 16, T, 256,
                           Impl.PERSISTENT, "sample", jnp.float32,
                           fuse_chain=True))
    recs.append(run_config("5f_flagship_fused_fast_math", flagship, 16, T,
                           256, Impl.PERSISTENT, "sample", jnp.float32,
                           fast_math=True, fuse_chain=True))
    recs.append(run_config("5g_flagship_fused_bf16w", flagship, 16, T, 256,
                           Impl.PERSISTENT, "sample", jnp.bfloat16,
                           fuse_chain=True))
    # tight R-lane gate packing (halved chain K extent at R=64)
    recs.append(run_config("5h_flagship_fused_pack_fp32", flagship, 16, T,
                           256, Impl.PERSISTENT, "sample", jnp.float32,
                           fuse_chain=True, fuse_pack=True))
    recs.append(run_config("5i_flagship_fused_pack_fast_math", flagship, 16,
                           T, 256, Impl.PERSISTENT, "sample", jnp.float32,
                           fast_math=True, fuse_chain=True, fuse_pack=True))
    # speculative EXACT decode (ops/speculative.py): bit-exact contract
    # output drafted by the fused fast kernel; latency tier — the whole
    # batch commits in lockstep, so b=1 is its habitat and the b=16 row
    # documents the decay honestly
    recs.append(run_speculative_row("5j_flagship_speculative_b1", flagship,
                                    1, T, 256, check_golden_samples=g))
    recs.append(run_speculative_row("5k_flagship_speculative_b16", flagship,
                                    16, T, 64))
    print(json.dumps({"all": recs}, indent=1))


if __name__ == "__main__":
    main()
