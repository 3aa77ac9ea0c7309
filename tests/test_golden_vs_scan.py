"""Equivalence: XLA scan generator vs the numpy golden model.

This is the TPU-build analog of the reference's golden-model equivalence test
(`nv_wavenet_test.cu:44-329`): identical random weights and inputs into both
implementations, per-layer activations compared on the reference's tolerance
ladder (Xt/skip @1e-2 rel, Zs/Za @1e-4, p @1e-3), and the sampled integer
sequence must match EXACTLY (`nv_wavenet_test.cu:302-304`).
"""

import numpy as np
import pytest

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.models.golden import WaveNetGolden
from nv_wavenet_tpu.ops import scan_generate


def rel_close(a, b, tol, atol=None):
    """Relative-error comparison in the spirit of the reference's
    `matrix_compare` (`matrix.cpp:131-152`), made two-sided, with an absolute
    floor for near-zero values (numpy and XLA use different matmul summation
    orders, so tiny activations accumulate absolute drift over the
    recurrence)."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    if atol is None:
        atol = tol * 1e-2
    return bool(np.all(np.abs(b - a) <= tol * np.abs(a) + atol))


def make_case(cfg, batch, samples, seed):
    rng = np.random.RandomState(seed + 1000)
    ref_w = params_lib.random_reference_weights(cfg, seed=seed)
    cond = (rng.uniform(-1, 1, size=(samples, cfg.num_layers, batch, 2 * cfg.R))
            .astype(np.float32) * 0.5)
    selectors = rng.uniform(0, 1, size=(samples, batch)).astype(np.float32)
    return ref_w, cond, selectors


CONFIGS = [
    (WaveNetConfig(num_layers=20, R=32, S=128, A=256, max_dilation=8), 4, 16),
    (WaveNetConfig(num_layers=20, R=64, S=128, A=256, max_dilation=8), 2, 12),
    (WaveNetConfig(num_layers=10, R=64, S=256, A=256, max_dilation=8), 2, 12),
    (WaveNetConfig(num_layers=12, R=32, S=128, A=256, max_dilation=2), 1, 20),
]


@pytest.mark.parametrize("cfg,batch,samples", CONFIGS)
def test_scan_matches_golden(cfg, batch, samples):
    ref_w, cond, selectors = make_case(cfg, batch, samples, seed=42)

    golden = WaveNetGolden(cfg, max_batch=batch, max_samples=samples)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, selectors)
    y_gold = golden.run(samples, batch)

    params = params_lib.to_canonical(ref_w, cfg)
    params_lib.validate_canonical(params, cfg)
    state = scan_generate.init_state(cfg, batch)
    final_state, y_scan, aux = scan_generate.generate(
        params, state, cond, selectors, cfg, dump=True)
    y_scan = np.asarray(y_scan)

    # exact integer sequence match (the reference contract)
    assert np.array_equal(y_gold, y_scan), (
        f"sample mismatch: golden {y_gold} vs scan {y_scan}")

    # per-layer tolerance ladder on last-sample activations
    for l in range(cfg.num_layers):
        assert rel_close(golden.get_xt_out(l), np.asarray(aux["xt"][l]), 1e-2,
                         atol=3e-4)
        assert rel_close(golden.get_skip_out(l), np.asarray(aux["skip"][l]),
                         1e-2, atol=3e-4)
    assert rel_close(golden.get_zs(), np.asarray(aux["zs"]), 1e-4, atol=2e-5)
    assert rel_close(golden.get_za(), np.asarray(aux["za"]), 1e-4, atol=2e-5)
    assert rel_close(golden.get_p(), np.asarray(aux["p"]), 1e-3)


def test_argmax_mode_matches():
    cfg = WaveNetConfig(num_layers=8, R=32, S=128, A=256, max_dilation=8)
    ref_w, cond, selectors = make_case(cfg, 2, 10, seed=7)
    golden = WaveNetGolden(cfg, max_batch=2, max_samples=10)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, selectors)
    y_gold = golden.run(10, 2, mode="argmax")

    params = params_lib.to_canonical(ref_w, cfg)
    state = scan_generate.init_state(cfg, 2)
    _, y_scan, _ = scan_generate.generate(params, state, cond, selectors, cfg,
                                          mode="argmax")
    assert np.array_equal(y_gold, np.asarray(y_scan))


def test_chunked_run_matches_full_run():
    """run_partial semantics: generation state carries across chunk boundaries
    (reference: uneven chunking test, `nv_wavenet_test.cu:254` chunk=7 of 8)."""
    cfg = WaveNetConfig(num_layers=10, R=32, S=128, A=256, max_dilation=8)
    ref_w, cond, selectors = make_case(cfg, 2, 15, seed=3)
    params = params_lib.to_canonical(ref_w, cfg)

    state = scan_generate.init_state(cfg, 2)
    _, y_full, _ = scan_generate.generate(params, state, cond, selectors, cfg)

    # chunk 7 + 7 + 1
    state = scan_generate.init_state(cfg, 2)
    ys = []
    for lo, hi in [(0, 7), (7, 14), (14, 15)]:
        state, y, _ = scan_generate.generate(params, state, cond[lo:hi],
                                             selectors[lo:hi], cfg)
        ys.append(np.asarray(y))
    y_chunked = np.concatenate(ys, axis=1)
    assert np.array_equal(np.asarray(y_full), y_chunked)


def test_horizon_65536_draws_exact():
    """Past-the-old-horizon exactness (VERDICT r4 #1 done-criterion): with
    the bit-identical transcendental library (`ops/exact_math.py`) the
    exact-match contract is structural at ANY horizon, so this CPU leg runs
    4x the old 16k transcendental horizon — 65,536 draws — across numpy
    golden, XLA scan, and (when built) the C++ oracle, and requires ZERO
    mismatches.  Pre-library, cross-lowering exp/tanh/sigmoid gaps flipped
    ~1e-5/sample here (docs/DESIGN.md); any flip now is a regression, not
    the documented limit.  Hardware twin: tools/horizon_tpu.py (262,144
    draws, flagship geometry, kernel+scan vs C++ oracle, 0 mismatches)."""
    from nv_wavenet_tpu.utils import native

    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    B, T = 16, 4096
    rng = np.random.RandomState(123)
    ref_w = params_lib.random_reference_weights(cfg, seed=321)
    cond = rng.uniform(-0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)

    golden = WaveNetGolden(cfg, max_batch=B, max_samples=T)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    y_gold = golden.run(T, B)

    params = params_lib.to_canonical(ref_w, cfg)
    state = scan_generate.init_state(cfg, B)
    _, y_scan, _ = scan_generate.generate(params, state, cond, sel, cfg)
    n_mismatch = int(np.sum(np.asarray(y_scan) != y_gold))
    assert n_mismatch == 0, (
        f"{n_mismatch}/{T * B} scan-vs-golden mismatches past the old "
        f"horizon — transcendental library regression")

    if native.available():
        nat = native.NativeGolden(cfg)
        nat.set_canonical_params(params)
        n_native = int(np.sum(nat.run(cond, sel) != y_gold))
        assert n_native == 0, (
            f"{n_native}/{T * B} C++-vs-golden mismatches past the old "
            f"horizon")


def test_golden_silence_warmup():
    """With zero conditioning and zero weights the logits are uniform; the
    selector 0.5 lands in the middle bin region — sanity shape test."""
    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    golden = WaveNetGolden(cfg, max_batch=1, max_samples=4)
    cond = np.zeros((4, 4, 1, 64), np.float32)
    sel = np.full((4, 1), 0.5, np.float32)
    golden.set_inputs(cond, sel)
    y = golden.run(4, 1)
    assert y.shape == (1, 4)
    assert np.all(y >= 0) and np.all(y < 256)
