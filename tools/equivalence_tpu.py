#!/usr/bin/env python
"""Full-size golden-equivalence matrix on the real TPU — the direct analog of
the reference's `nv_wavenet_test` main (`/root/reference/nv_wavenet_test.cu:331-395`):

  {32R/128S, 64R/128S, 64R/256S, 128R/256S} x {PERSISTENT, MANYBLOCK}
  + A=512 and A=1024 persistent,

each: 20 layers, max_dilation 8, batch 16, 2 iterations re-using uploaded
weights/state, samples generated through uneven chunking (chunk 7 of 8), and
EXACT integer-sequence match against the CPU golden model plus the activation
tolerance ladder via dump mode.

Run: python tools/equivalence_tpu.py  (prints one PASS/FAIL line per config)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rel_close(a, b, tol, atol):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return bool(np.all(np.abs(b - a) <= tol * np.abs(a) + atol))


def run_case(name, cfg, impl, batch=16, samples=8, seed=101):
    from nv_wavenet_tpu.engine.wavenet_infer import WaveNetInfer
    from nv_wavenet_tpu.models import params as params_lib
    from nv_wavenet_tpu.models.golden import WaveNetGolden

    rng = np.random.RandomState(seed)
    ref_w = params_lib.random_reference_weights(cfg, seed=seed)
    cond = rng.uniform(-0.5, 0.5, (samples, cfg.num_layers, batch, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (samples, batch)).astype(np.float32)

    golden = WaveNetGolden(cfg, batch, samples)
    golden.set_reference_weights(ref_w)

    eng = WaveNetInfer(num_layers=cfg.num_layers, max_dilation=cfg.max_dilation,
                       R=cfg.R, S=cfg.S, A=cfg.A, max_batch=batch,
                       implementation=impl, chunk_size=8)
    eng.set_reference_weights(ref_w)

    ok = True
    msgs = []
    for iteration in range(2):  # re-use uploads (`nv_wavenet_test.cu:241`)
        golden.set_inputs(cond, sel)
        y_gold = golden.run(samples, batch)
        eng.set_inputs(cond, sel)
        # uneven chunking: 7 + 1 (`nv_wavenet_test.cu:254`)
        y = eng.run_chunks(7, lambda *_: None, samples, batch)
        if not np.array_equal(y_gold, y):
            ok = False
            msgs.append(f"iter{iteration}: integer mismatch "
                        f"({np.mean(y_gold == y):.3f} agree)")
    # activation ladder via dump mode
    eng.set_inputs(cond, sel)
    eng.run(samples, batch, dump_activations=True)
    golden.set_inputs(cond, sel)
    golden.run(samples, batch)
    for l in range(cfg.num_layers):
        if not rel_close(golden.get_xt_out(l), eng.get_xt_out(l), 1e-2, 3e-4):
            ok = False; msgs.append(f"xt[{l}]")
        if not rel_close(golden.get_skip_out(l), eng.get_skip_out(l), 1e-2, 3e-4):
            ok = False; msgs.append(f"skip[{l}]")
    if not rel_close(golden.get_zs(), eng.get_zs(), 1e-4, 2e-5):
        ok = False; msgs.append("zs")
    if not rel_close(golden.get_za(), eng.get_za(), 1e-4, 2e-5):
        ok = False; msgs.append("za")
    if not rel_close(golden.get_p(), eng.get_p(), 1e-3, 1e-5):
        ok = False; msgs.append("p")

    print(f"{'PASS' if ok else 'FAIL'}  {name:36s} impl={impl.name:10s} "
          f"{'' if ok else '; '.join(msgs)}", flush=True)
    return ok


def run_int8_case(name, cfg, batch=16, samples=8, seed=103):
    """Full-size int8 weight-streaming exactness (`stream_quant="int8"`):
    the MANYBLOCK kernel's in-kernel dequantize is exactly rounded, so its
    integer outputs must BIT-MATCH the scan generator fed the
    quantize->dequantize round-tripped weights — the exactness contract
    carried to the int8 tier at full model size, compiled on hardware.
    The value oracle is shared with the hardware self-test
    (utils/oracles.py) so the two checks cannot drift."""
    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer
    from nv_wavenet_tpu.models import params as params_lib
    from nv_wavenet_tpu.utils.oracles import int8_dequant_scan_oracle

    rng = np.random.RandomState(seed)
    ref_w = params_lib.random_reference_weights(cfg, seed=seed)
    cond = rng.uniform(-0.5, 0.5, (samples, cfg.num_layers, batch, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (samples, batch)).astype(np.float32)

    eng = WaveNetInfer(num_layers=cfg.num_layers,
                       max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                       A=cfg.A, max_batch=batch,
                       implementation=Impl.MANYBLOCK, chunk_size=8,
                       stream_quant="int8")
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, sel)
    y = eng.run_chunks(7, lambda *_: None, samples, batch)

    y_scan = int8_dequant_scan_oracle(cfg, ref_w, cond, sel)
    ok = bool(np.array_equal(y, y_scan))
    msg = "" if ok else f"agreement {np.mean(y == y_scan):.3f}"
    print(f"{'PASS' if ok else 'FAIL'}  {name:36s} impl=INT8STREAM {msg}",
          flush=True)
    return ok


def main():
    from nv_wavenet_tpu.config import WaveNetConfig
    from nv_wavenet_tpu.engine.wavenet_infer import Impl

    L, D = 20, 8
    matrix = [
        ("32R_128S_256A", WaveNetConfig(num_layers=L, R=32, S=128, A=256,
                                        max_dilation=D), Impl.PERSISTENT),
        ("32R_128S_256A", WaveNetConfig(num_layers=L, R=32, S=128, A=256,
                                        max_dilation=D), Impl.MANYBLOCK),
        ("64R_128S_256A", WaveNetConfig(num_layers=L, R=64, S=128, A=256,
                                        max_dilation=D), Impl.PERSISTENT),
        ("64R_128S_256A", WaveNetConfig(num_layers=L, R=64, S=128, A=256,
                                        max_dilation=D), Impl.MANYBLOCK),
        ("64R_256S_256A", WaveNetConfig(num_layers=L, R=64, S=256, A=256,
                                        max_dilation=D), Impl.PERSISTENT),
        ("64R_256S_256A", WaveNetConfig(num_layers=L, R=64, S=256, A=256,
                                        max_dilation=D), Impl.MANYBLOCK),
        ("128R_256S_256A", WaveNetConfig(num_layers=L, R=128, S=256, A=256,
                                         max_dilation=D), Impl.PERSISTENT),
        ("128R_256S_256A", WaveNetConfig(num_layers=L, R=128, S=256, A=256,
                                         max_dilation=D), Impl.MANYBLOCK),
        ("64R_256S_512A", WaveNetConfig(num_layers=L, R=64, S=256, A=512,
                                        max_dilation=D), Impl.PERSISTENT),
        ("64R_256S_1024A", WaveNetConfig(num_layers=L, R=64, S=256, A=1024,
                                         max_dilation=D), Impl.PERSISTENT),
        # beyond the reference: its CUDA kernels reject R=256 outright
        # ("Only R=32,64 and 128 currently supported", nv_wavenet_perf.cu);
        # VMEM has no register-file cliff, so the same kernel just works
        ("256R_256S_256A", WaveNetConfig(num_layers=L, R=256, S=256, A=256,
                                         max_dilation=D), Impl.PERSISTENT),
    ]
    results = [run_case(n, c, i) for n, c, i in matrix]
    # int8 weight-streaming exactness rows (deterministic quantized tier)
    results += [
        run_int8_case("64R_256S_256A_int8",
                      WaveNetConfig(num_layers=L, R=64, S=256, A=256,
                                    max_dilation=D)),
        run_int8_case("128R_256S_256A_int8",
                      WaveNetConfig(num_layers=L, R=128, S=256, A=256,
                                    max_dilation=D)),
    ]
    print(f"{sum(results)}/{len(results)} configs passed", flush=True)
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
