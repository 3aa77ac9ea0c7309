"""HBM-streaming (MANYBLOCK) Pallas kernel tests.

The stream_weights=True variant of the fused kernel keeps the per-layer
dil/rs weight stacks in HBM and double-buffers their per-layer DMA (layer
l+1 copies while layer l computes) — the TPU-native replacement for the
reference's manyblock launch (`/root/reference/nv_wavenet_persistent.cuh:
521-568`, `README.md:17`: "for models too large for register-file
residency").  Contract: bit-identical to the VMEM-resident kernel (the DMA
moves the same bytes; math order is unchanged), hence exact-match vs golden.

Runs in interpreter mode on CPU; hardware rates are recorded by
tools/baseline_sweep.py (BASELINE config 4 forced-streaming row).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.models.golden import WaveNetGolden
from nv_wavenet_tpu.ops import persistent

from tests.test_golden_vs_scan import make_case


def run_stream(cfg, params, cond, sel, batch, chunk, t0=0, ring=None,
               y_state=None, **kw):
    T = cond.shape[0]
    pad = (-T) % chunk
    if pad:
        cond = np.concatenate([cond, np.zeros((pad,) + cond.shape[1:],
                                              cond.dtype)])
        sel = np.concatenate([sel, np.zeros((pad, batch), sel.dtype)])
    gen = persistent.make_persistent_generator(
        cfg, batch, chunk, interpret=True, stream_weights=True, **kw)
    if ring is None:
        ring = persistent.init_ring(cfg, batch)
    if y_state is None:
        y_state = jnp.full((2, batch), cfg.silence_bin, jnp.int32)
    out = gen(params, np.array([t0]), jnp.asarray(cond), jnp.asarray(sel),
              ring, y_state, n_valid=T)
    return np.asarray(out[0])[:T].T, out[1], out[2]


CONFIGS = [
    (WaveNetConfig(num_layers=8, R=32, S=128, A=256, max_dilation=8), 2, 16, 8),
    (WaveNetConfig(num_layers=10, R=64, S=128, A=256, max_dilation=4), 2, 8, 8),
    (WaveNetConfig(num_layers=6, R=64, S=256, A=256, max_dilation=8), 3, 8, 8),
]


@pytest.mark.parametrize("cfg,batch,samples,chunk", CONFIGS)
def test_streaming_kernel_matches_golden(cfg, batch, samples, chunk):
    ref_w, cond, sel = make_case(cfg, batch, samples, seed=53)
    golden = WaveNetGolden(cfg, max_batch=batch, max_samples=samples)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    y_gold = golden.run(samples, batch)
    params = {k: jnp.asarray(v)
              for k, v in params_lib.to_canonical(ref_w, cfg).items()}
    y, _, _ = run_stream(cfg, params, cond, sel, batch, chunk)
    assert np.array_equal(y_gold, y)


def test_streaming_equals_resident_kernel_bitwise():
    """Same bytes, same math order: the streamed-weights kernel must emit the
    IDENTICAL integer sequence as the VMEM-resident kernel."""
    from tests.test_persistent_kernel import run_kernel

    cfg = WaveNetConfig(num_layers=8, R=32, S=128, A=256, max_dilation=8)
    B, T, chunk = 2, 24, 8
    ref_w, cond, sel = make_case(cfg, B, T, seed=59)
    params = {k: jnp.asarray(v)
              for k, v in params_lib.to_canonical(ref_w, cfg).items()}
    y_res, _, _, _ = run_kernel(cfg, params, cond, sel, B, chunk)
    y_str, _, _ = run_stream(cfg, params, cond, sel, B, chunk)
    assert np.array_equal(y_res, y_str)


def test_streaming_state_carries_across_calls():
    """Chunked run_partial parity under weight streaming: carried ring +
    y_state across two calls equals one full run (ragged split)."""
    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=4)
    B, chunk = 2, 8
    ref_w, cond, sel = make_case(cfg, B, 19, seed=61)
    params = {k: jnp.asarray(v)
              for k, v in params_lib.to_canonical(ref_w, cfg).items()}
    y_full, _, _ = run_stream(cfg, params, cond, sel, B, chunk)
    y1, ring, ys = run_stream(cfg, params, cond[:11], sel[:11], B, chunk)
    y2, _, _ = run_stream(cfg, params, cond[11:], sel[11:], B, chunk,
                          t0=11, ring=ring, y_state=ys)
    assert np.array_equal(y_full, np.concatenate([y1, y2], axis=1))


def test_streaming_bf16_weights_match_resident_bf16():
    """bf16 weight storage halves the streamed bytes; it must remain
    bit-identical to the resident kernel under the same bf16 cast."""
    from tests.test_persistent_kernel import run_kernel

    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=4)
    B, T, chunk = 2, 16, 8
    ref_w, cond, sel = make_case(cfg, B, T, seed=67)
    params = {k: jnp.asarray(v)
              for k, v in params_lib.to_canonical(ref_w, cfg).items()}
    y_str, _, _ = run_stream(cfg, params, cond, sel, B, chunk,
                             weight_dtype=jnp.bfloat16)
    gen = persistent.make_persistent_generator(
        cfg, B, chunk, weight_dtype=jnp.bfloat16, interpret=True)
    ring = persistent.init_ring(cfg, B)
    ys = jnp.full((2, B), cfg.silence_bin, jnp.int32)
    out = gen(params, np.array([0]), jnp.asarray(cond), jnp.asarray(sel),
              ring, ys, n_valid=T)
    y_res = np.asarray(out[0]).T
    assert np.array_equal(y_str, y_res)


def test_engine_manyblock_uses_streaming_kernel_and_matches_golden():
    """Engine MANYBLOCK resolves to the streaming kernel (sample/argmax
    modes) and still exact-matches the golden model through the public API,
    including ragged run_chunks."""
    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=4)
    B, T = 2, 15
    ref_w, cond, sel = make_case(cfg, B, T, seed=71)
    golden = WaveNetGolden(cfg, max_batch=B, max_samples=T)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    y_gold = golden.run(T, B)

    eng = WaveNetInfer(num_layers=6, max_dilation=4, R=32, S=128, A=256,
                       max_batch=B, implementation=Impl.MANYBLOCK,
                       chunk_size=8, interpret=True)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, sel)
    y = eng.run_chunks(7, lambda yc, off, n: None, T, B)
    assert np.array_equal(y_gold, y)
    # the cached generator is the streaming variant (key:
    # (tag, batch, chunk, mode, dump, stream, group_size, prefetch))
    assert any(k[5] for k in eng._gen_cache), "expected stream=True in cache"


def test_stream_vmem_estimate_excludes_layer_weight_stacks():
    """The MANYBLOCK VMEM plan keeps only two double-buffered per-layer
    weight tiles resident (that is its point): vs the resident plan it must
    save approximately the full dil/rs stack footprint.  (The conditioning
    stream still scales with L in both plans — it is an activation input.)"""
    big = WaveNetConfig(num_layers=40, R=128, S=256, A=256, max_dilation=512)
    e_stream = persistent.estimate_vmem_bytes(big, 64, 64, stream=True)
    e_resident = persistent.estimate_vmem_bytes(big, 64, 64, stream=False)
    # 40L fp32 stacks ~18.3 MB resident vs 2 double-buffered 8-layer group
    # tiles ~7.3 MB -> ~11 MB saved (saving grows with L; buffers don't)
    assert e_resident - e_stream > 10 * 1024 * 1024
    huge = WaveNetConfig(num_layers=80, R=128, S=256, A=256, max_dilation=512)
    assert (persistent.estimate_vmem_bytes(huge, 64, 64, stream=False)
            - persistent.estimate_vmem_bytes(huge, 64, 64, stream=True)
            > 25 * 1024 * 1024)


@pytest.mark.parametrize("gs,prefetch", [(1, False), (3, False), (8, True),
                                         (4, True)])
def test_streaming_variants_exact(gs, prefetch):
    """Group size and next-step group-0 prefetch are pure scheduling knobs:
    every variant must stay bit-identical to the golden model, including
    carried state across a ragged call split (where DMA start/wait pairing
    across steps is most delicate)."""
    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=4)
    B, chunk = 2, 8
    ref_w, cond, sel = make_case(cfg, B, 19, seed=73)
    golden = WaveNetGolden(cfg, max_batch=B, max_samples=19)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    y_gold = golden.run(19, B)
    params = {k: jnp.asarray(v)
              for k, v in params_lib.to_canonical(ref_w, cfg).items()}
    kw = dict(stream_group_size=gs, stream_prefetch=prefetch)
    y1, ring, ys = run_stream(cfg, params, cond[:11], sel[:11], B, chunk, **kw)
    y2, _, _ = run_stream(cfg, params, cond[11:], sel[11:], B, chunk,
                          t0=11, ring=ring, y_state=ys, **kw)
    assert np.array_equal(y_gold, np.concatenate([y1, y2], axis=1))


def test_int8_streamed_kernel_matches_dequantized_scan_exactly():
    """stream_quant=int8: per-channel scales, int8 HBM stacks, in-kernel
    exactly-rounded dequantize (w = q*s) — the integer outputs must BIT-MATCH
    the scan generator fed the same quantize->dequantize round-tripped
    weights (the bf16-weights determinism contract carried to int8)."""
    from nv_wavenet_tpu.ops import scan_generate

    cfg = WaveNetConfig(num_layers=8, R=32, S=128, A=256, max_dilation=8)
    B, T = 2, 24
    ref_w, cond, sel = make_case(cfg, B, T, seed=71)
    params = {k: jnp.asarray(v)
              for k, v in params_lib.to_canonical(ref_w, cfg).items()}

    y_q, _, _ = run_stream(cfg, params, cond, sel, B, 8, stream_quant=True)

    params_dq = persistent.dequantize_stream_params(params)
    st = scan_generate.init_state(cfg, B)
    _, y_scan, _ = scan_generate.generate(params_dq, st, jnp.asarray(cond),
                                          jnp.asarray(sel), cfg)
    assert np.array_equal(np.asarray(y_scan), y_q), (
        f"int8-stream/scan agreement "
        f"{np.mean(np.asarray(y_scan) == y_q):.3f}")
    # and quantization is a real change (not a no-op passthrough)
    assert not np.allclose(np.asarray(params_dq["dil_w"]),
                           np.asarray(params["dil_w"]))


def test_int8_stream_distribution_close_to_fp32():
    """int8 streamed weights stay distribution-close to fp32 on the hot
    case (teacher-forced TV bound, the low-precision contract methodology)."""
    from tests.test_low_precision import (CFG, free_run_forced, hot_case,
                                          scan_forced_probs, tv)

    B, T = 4, 64
    params, cond, sel, _ = hot_case(CFG, B, T, seed=7)
    forced = free_run_forced(CFG, params, cond, sel)[:T]
    p32 = scan_forced_probs(CFG, params, cond, sel, forced, jnp.float32)[:T]

    params_dq = persistent.dequantize_stream_params(params)
    p_q = scan_forced_probs(CFG, params_dq, cond, sel, forced, jnp.float32)[:T]
    t = tv(p32, p_q)
    msg = f"int8 mean TV {t.mean():.4f} max {t.max():.4f}"
    assert t.mean() < 0.05 and t.max() < 0.4, msg


def test_engine_stream_quant_int8():
    """WaveNetInfer(stream_quant='int8') on a forced-MANYBLOCK run matches
    the golden model fed the dequantized weights exactly (through the
    engine's prefold/chunking machinery), and prng mode stays self-
    consistent between kernel and scan paths."""
    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=4)
    B, T = 2, 24
    ref_w, cond, sel = make_case(cfg, B, T, seed=83)

    eng = WaveNetInfer(num_layers=cfg.num_layers,
                       max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                       A=cfg.A, max_batch=B, implementation=Impl.MANYBLOCK,
                       chunk_size=8, stream_quant="int8")
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, sel)
    y = eng.run(T, B)

    from nv_wavenet_tpu.ops import scan_generate
    params = {k: jnp.asarray(v)
              for k, v in params_lib.to_canonical(ref_w, cfg).items()}
    params_dq = persistent.dequantize_stream_params(params)
    st = scan_generate.init_state(cfg, B)
    _, y_scan, _ = scan_generate.generate(params_dq, st, jnp.asarray(cond),
                                          jnp.asarray(sel), cfg)
    assert np.array_equal(y, np.asarray(y_scan))


def test_stream_vmem_estimate_scales_with_group_size():
    """The double-buffered weight tiles in the streaming plan must be sized
    by the CONFIGURED stream_group_size (a larger group allocates
    proportionally larger scratch): planning with the default while the
    kernel allocates gs=16 buffers would undersize the budget check."""
    big = WaveNetConfig(num_layers=40, R=128, S=256, A=256, max_dilation=512)
    e8 = persistent.estimate_vmem_bytes(big, 64, 64, stream=True,
                                        stream_group_size=8)
    e16 = persistent.estimate_vmem_bytes(big, 64, 64, stream=True,
                                         stream_group_size=16)
    e1 = persistent.estimate_vmem_bytes(big, 64, 64, stream=True,
                                        stream_group_size=1)
    assert e1 < e8 < e16
    # the delta is the weight-buffer term itself: 2 x (gs extra layers)
    per_layer = (2 * persistent._padded_bytes((2 * big.R, 2 * big.R), 4)
                 + 2 * persistent._padded_bytes((big.R, big.R + big.S), 4))
    assert e16 - e8 == 8 * per_layer
