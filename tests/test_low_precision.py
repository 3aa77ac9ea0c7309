"""Low-precision correctness contract (BASELINE.md: "bf16
distribution-allclose") — the TPU analog of the reference's half-precision
equivalence bar (`/root/reference/nv_wavenet_test.cu:296-298` checks p@1e-3
under T_data=half; conversions `nv_wavenet_conversions.cuh:45-86`).

Methodology: probability-distribution comparison on a TEACHER-FORCED
trajectory.  Free-running sequences diverge after the first differing sample
(integer agreement says nothing about closeness), so both precisions are
driven through the identical symbol sequence (the fp32 free run's output) and
the per-step output distributions p_t are compared directly:

  * element bound: max |p_lp - p_fp32| per step,
  * total-variation bound: TV = 0.5 * sum_a |p_lp - p_fp32| over >= 1k steps
    (mean / p99 / max).

Weights are "hot" (Xavier-scale + sharpened output stack: p_max ~ 0.85, like
a trained vocoder) — with the reference test's tiny 0.5/R weights the output
distribution is near-uniform and any precision passes vacuously.

Bounds are ~3x the measured bf16 deltas (mean TV 0.005-0.007, max ~0.06 on
this case); a math/order bug puts TV near 1.

Additionally, bf16 WEIGHT storage (fp32 compute) is deterministic — the cast
is exactly rounded and the math order is canonical — so the Pallas kernel and
the XLA scan generator must produce IDENTICAL integer sequences, the same
exact-match contract as fp32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.ops import persistent, scan_generate


def hot_case(cfg: WaveNetConfig, batch: int, samples: int, seed: int):
    """Random weights at trained-model-like scale: Xavier body + sharpened
    output stack so the softmax is peaked (p_max ~0.85) and precision
    differences are visible in the distribution."""
    rng = np.random.RandomState(seed + 2000)
    ref_w = params_lib.random_reference_weights(
        cfg, seed=seed, scale=1.0 / np.sqrt(cfg.R))
    ref_w["Wzs"] = (ref_w["Wzs"] * 6.0).astype(np.float32)
    ref_w["Wza"] = (ref_w["Wza"] * 6.0).astype(np.float32)
    cond = rng.uniform(-1, 1, (samples, cfg.num_layers, batch, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (samples, batch)).astype(np.float32)
    params = {k: jnp.asarray(v)
              for k, v in params_lib.to_canonical(ref_w, cfg).items()}
    return params, cond, sel, ref_w


def softmax64(za: np.ndarray) -> np.ndarray:
    za = np.asarray(za, np.float64)
    e = np.exp(za - za.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def tv(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    return 0.5 * np.abs(p - q).sum(-1)


def scan_forced_probs(cfg, params, cond, sel, forced, compute_dtype):
    """Per-step [T, B, A] probabilities from the scan generator driven
    through the forced symbol trajectory."""
    B = sel.shape[1]
    dt = jnp.float32 if compute_dtype == jnp.float32 else compute_dtype
    st = scan_generate.init_state(cfg, B, dt)
    _, _, za = scan_generate.generate(
        params, st, jnp.asarray(cond), jnp.asarray(sel), cfg,
        compute_dtype=compute_dtype, forced_y=jnp.asarray(forced),
        return_za=True)
    return softmax64(np.asarray(za))


def free_run_forced(cfg, params, cond, sel):
    """fp32 free-running sample sequence -> the forced trajectory [T, B]."""
    st = scan_generate.init_state(cfg, sel.shape[1])
    _, y, _ = scan_generate.generate(params, st, jnp.asarray(cond),
                                     jnp.asarray(sel), cfg)
    return np.asarray(y).T.astype(np.int32)


def kernel_forced_probs(cfg, params, cond, forced, batch, **gen_kw):
    """Per-step probabilities from the PERSISTENT KERNEL via its native
    teacher-forcing mode (mode="forced": the selector stream carries the
    ground-truth symbols, the kernel emits the per-step p sequence)."""
    T = cond.shape[0]
    chunk = 8
    assert T % chunk == 0
    gen = persistent.make_persistent_generator(
        cfg, batch, chunk, mode="forced", interpret=True, **gen_kw)
    ring = persistent.init_ring(cfg, batch)
    y_state = jnp.full((2, batch), cfg.silence_bin, jnp.int32)
    out = gen(params, np.array([0]), jnp.asarray(cond),
              jnp.asarray(forced.astype(np.float32)), ring, y_state,
              n_valid=T)
    y = np.asarray(out[0])
    assert np.array_equal(y, forced), "forced mode must echo the symbols"
    p = np.asarray(out[-1], np.float64)
    # renormalize in float64 like softmax64 (kernel p is fp32-normalized)
    return p / p.sum(-1, keepdims=True)


CFG = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=8)


@pytest.fixture(scope="module")
def forced_case():
    B, T = 8, 256                           # T*B = 2048 distribution samples
    params, cond, sel, _ = hot_case(CFG, B, T, seed=7)
    forced = free_run_forced(CFG, params, cond, sel)
    p32 = scan_forced_probs(CFG, params, cond, sel, forced, jnp.float32)
    return params, cond, sel, forced, p32


def assert_distribution_allclose(p_lp, p32, mean_bound, p99_bound, max_bound,
                                 label):
    t = tv(p32, p_lp)
    msg = (f"{label}: mean TV {t.mean():.5f} p99 {np.percentile(t, 99):.5f} "
           f"max {t.max():.5f}")
    assert t.mean() < mean_bound, msg
    assert np.percentile(t, 99) < p99_bound, msg
    assert t.max() < max_bound, msg
    # per-step probability vectors allclose (element bound)
    assert np.abs(p_lp - p32).max() < max_bound, msg


def test_bf16_weights_distribution_vs_fp32(forced_case):
    """bf16 weight storage (fp32 compute): TV(p_bf16, p_fp32) bounded over
    2048 teacher-forced steps."""
    params, cond, sel, forced, p32 = forced_case
    params_bf = {k: jnp.asarray(v, jnp.bfloat16).astype(jnp.float32)
                 for k, v in params.items()}
    p_bf = scan_forced_probs(CFG, params_bf, cond, sel, forced, jnp.float32)
    assert_distribution_allclose(p_bf, p32, 0.02, 0.08, 0.15, "bf16 weights")
    # positive control: the deltas are real, not a no-op comparison
    assert tv(p32, p_bf).max() > 0


def test_bf16_compute_distribution_vs_fp32(forced_case):
    """compute_dtype=bfloat16 (bf16 activations + single-pass MXU matmuls,
    fp32 accumulation): distribution-allclose vs the fp32 golden path."""
    params, cond, sel, forced, p32 = forced_case
    p_bfc = scan_forced_probs(CFG, params, cond, sel, forced, jnp.bfloat16)
    assert_distribution_allclose(p_bfc, p32, 0.025, 0.10, 0.20, "bf16 compute")


def test_kernel_bf16_compute_distribution_vs_fp32(forced_case):
    """The PALLAS KERNEL's compute_dtype=bfloat16 path meets the same
    distribution contract (64 forced steps x 8 utterances; the kernel driver
    is validated by an fp32 self-check against the scan probabilities)."""
    params, cond, sel, forced, p32 = forced_case
    T = 64
    p_k32 = kernel_forced_probs(CFG, params, cond[:T], forced[:T], 8)
    # driver sanity: fp32 kernel == fp32 scan probabilities (same math order)
    assert np.abs(p_k32 - p32[:T]).max() < 1e-5
    p_kbf = kernel_forced_probs(CFG, params, cond[:T], forced[:T], 8,
                                compute_dtype=jnp.bfloat16)
    assert_distribution_allclose(p_kbf, p32[:T], 0.025, 0.10, 0.20,
                                 "kernel bf16 compute")


def test_kernel_fast_math_distribution_vs_fp32(forced_case):
    """fast_math (fp32 storage, DEFAULT-precision matmuls — the
    --use_fast_math analog): same distribution contract.  On CPU interpret
    DEFAULT == exact fp32, so this bounds plumbing here and precision on TPU
    (tools/lowprec_tpu.py runs the same contract compiled on hardware)."""
    params, cond, sel, forced, p32 = forced_case
    T = 64
    p_fm = kernel_forced_probs(CFG, params, cond[:T], forced[:T], 8,
                               fast_math=True)
    assert_distribution_allclose(p_fm, p32[:T], 0.025, 0.10, 0.20,
                                 "kernel fast_math")


def test_bf16_weights_kernel_scan_exact_match():
    """bf16 WEIGHT storage is deterministic: the exactly-rounded cast plus
    the canonical fp32 math order means the Pallas kernel and the XLA scan
    must emit IDENTICAL integer sequences (the fp32 exact-match contract,
    carried to bf16 weights)."""
    cfg = CFG
    B, T = 4, 48
    params, cond, sel, _ = hot_case(cfg, B, T, seed=31)

    # scan path: engine-MANYBLOCK-style pre-cast to bf16 (upcast inside)
    params_bf = {k: v.astype(jnp.bfloat16) for k, v in params.items()}
    st = scan_generate.init_state(cfg, B)
    _, y_scan, _ = scan_generate.generate(params_bf, st, jnp.asarray(cond),
                                          jnp.asarray(sel), cfg)
    y_scan = np.asarray(y_scan)

    # kernel path: weight_dtype=bfloat16 (cast at upload, upcast in-kernel)
    gen = persistent.make_persistent_generator(
        cfg, B, 8, weight_dtype=jnp.bfloat16, interpret=True)
    ring = persistent.init_ring(cfg, B)
    ys = jnp.full((2, B), cfg.silence_bin, jnp.int32)
    out = gen(params, np.array([0]), jnp.asarray(cond), jnp.asarray(sel),
              ring, ys, n_valid=T)
    y_kern = np.asarray(out[0]).T
    assert np.array_equal(y_scan, y_kern), (
        f"bf16-weights kernel/scan diverged: "
        f"{np.mean(y_scan == y_kern):.3f} agreement")


def test_kernel_forced_mode_matches_golden_oracle():
    """Three-way oracle check of teacher forcing: the numpy golden's
    mode='forced' per-step probabilities must match the kernel's forced-mode
    p sequence (fp32, same canonical order) and the scan's forced logits —
    plus the forced runs must echo the forced symbols and leave state such
    that a subsequent free run continues exactly."""
    from nv_wavenet_tpu.models.golden import WaveNetGolden

    cfg = CFG
    B, T = 4, 24
    params, cond, sel, ref_w = hot_case(cfg, B, T, seed=47)
    forced = free_run_forced(cfg, params, cond, sel)        # [T, B]

    golden = WaveNetGolden(cfg, B, T)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    y_g = golden.run(T, B, mode="forced", forced_y=forced.T)
    assert np.array_equal(y_g, forced.T)
    p_gold = golden.get_p_seq().astype(np.float64)
    p_gold = p_gold / p_gold.sum(-1, keepdims=True)

    p_kern = kernel_forced_probs(cfg, params, cond, forced, B)
    assert np.abs(p_kern - p_gold).max() < 1e-5
    p_scan = scan_forced_probs(cfg, params, cond, sel, forced, jnp.float32)
    assert np.abs(p_scan[:T] - p_gold).max() < 1e-5
