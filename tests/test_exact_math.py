"""Cross-implementation bit-identity and accuracy of the canonical
transcendental library (ops/exact_math.py, csrc/exact_math.h).

The exact-match contract rests on these three functions (plus the canonical
sampler) producing IDENTICAL fp32 bits in every implementation: numpy twin,
XLA (CPU here; XLA:TPU and Mosaic verified on hardware by
tools/probe_exact_math_tpu.py — all 0/131072 mismatches), and the C++
oracle.  Accuracy vs float64 references must stay libm-class so adopting
the canonical lowering costs no model quality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nv_wavenet_tpu.ops import exact_math as em
from nv_wavenet_tpu.utils import native


def _bits(x):
    return np.asarray(x, np.float32).view(np.int32)


@pytest.fixture(scope="module")
def dense_inputs():
    rng = np.random.RandomState(0)
    return np.concatenate([
        rng.uniform(-95, 95, 200000),          # full clamped range
        rng.uniform(-8, 8, 100000),            # realistic preactivations
        rng.uniform(-0.6, 0.6, 100000),        # tanh branch boundary
        rng.uniform(-0.01, 0.01, 50000),       # small-x polynomial branch
        # NOTE: denormal inputs (|x| < 2^-126) are outside the canonical
        # domain — backends disagree on flush-to-zero at the hardware level
        # (XLA:CPU flushes, numpy does not); the compute path never produces
        # them (verified by the equivalence suites).
        np.array([0.0, -0.0, 1.0, -1.0, 0.5, -0.5, np.nextafter(0.5, 0.0),
                  np.nextafter(0.5, 1.0), 87.9, -86.9, -87.0, 88.0, 200.0,
                  -200.0, 50.0, -50.0, 1e-20, -1e-20, 2e-38, -2e-38]),
    ]).astype(np.float32)


FNS = [("exp", em.exp_np, em.exp),
       ("tanh", em.tanh_np, em.tanh),
       ("sigmoid", em.sigmoid_np, em.sigmoid)]


@pytest.mark.parametrize("name,fn_np,fn_jnp", FNS)
def test_numpy_vs_xla_bit_identical(dense_inputs, name, fn_np, fn_jnp):
    a = fn_np(dense_inputs)
    b = np.asarray(jax.jit(fn_jnp)(jnp.asarray(dense_inputs)))
    mism = int(np.sum(_bits(a) != _bits(b)))
    assert mism == 0, f"{name}: {mism} numpy-vs-XLA mismatches"


@pytest.mark.parametrize("name,fn_np,fn_jnp", FNS)
def test_numpy_vs_cpp_bit_identical(dense_inputs, name, fn_np, fn_jnp):
    if not native.available():
        pytest.skip("native toolchain unavailable")
    a = fn_np(dense_inputs)
    c = native.exact_fn_native(name, dense_inputs)
    mism = int(np.sum(_bits(a) != _bits(c)))
    assert mism == 0, f"{name}: {mism} numpy-vs-C++ mismatches"


def test_accuracy_vs_float64(dense_inputs):
    """Ulp-class accuracy against float64 references, away from the exp
    clamp at |x| = 87/88 (where the canonical value intentionally saturates
    instead of denormalizing)."""
    x = dense_inputs[np.abs(dense_inputs) < 86.0]
    x64 = x.astype(np.float64)

    def max_rel(got, want):
        denom = np.maximum(np.abs(want), 1e-300)
        return np.abs(got.astype(np.float64) - want).max() / 1.0 if False \
            else np.max(np.abs(got.astype(np.float64) - want) / denom)

    r = max_rel(em.exp_np(x), np.exp(x64))
    assert r < 3e-7, f"exp rel err {r}"                      # ~2 ulp
    mask = np.abs(x) > 1e-30                                 # rel err def'd
    r = max_rel(em.tanh_np(x[mask]), np.tanh(x64[mask]))
    assert r < 4.5e-7, f"tanh rel err {r}"                   # ~3 ulp (Estrin
    # tree + degree-9 recip round slightly differently than the round-5a
    # Horner+Newton chain; still libm-class)
    r = max_rel(em.sigmoid_np(x), 1.0 / (1.0 + np.exp(-x64)))
    assert r < 5e-7, f"sigmoid rel err {r}"                  # ~4 ulp
    # tiny-x absolute sanity (tanh(x) ~ x, sigmoid(0) = 0.5)
    assert em.tanh_np(np.float32(0.0)) == 0.0
    # sigmoid(0): the degree-9 recip polynomial is not endpoint-pinned at
    # e = 1, so the canonical value is within 1 ulp of 0.5 (0x3efffffe) —
    # the same 1 ulp on every implementation, which is what the contract
    # needs (the Newton variant it replaced happened to land exactly)
    assert abs(float(em.sigmoid_np(np.float32(0.0))) - 0.5) <= 2 ** -24
    assert em.exp_np(np.float32(0.0)) == np.float32(1.0)


def test_sampler_bit_identical_and_semantics():
    """sample_from_logits: numpy twin == XLA, correct inverse-CDF semantics
    vs a float64 reference away from boundaries, silence fallback on scan
    failure."""
    rng = np.random.RandomState(1)
    za = rng.uniform(-6, 6, (4096, 256)).astype(np.float32)
    sel = rng.uniform(0, 1, (4096, 1)).astype(np.float32)
    y_np = em.sample_from_logits_np(za, sel, 128)
    y_x = np.asarray(jax.jit(
        lambda z, s: em.sample_from_logits(z, s, 128))(za, sel))
    assert np.array_equal(y_np, y_x)

    # semantics: matches float64 normalized inverse-CDF except within ~1e-5
    # of a CDF boundary
    p64 = np.exp(za.astype(np.float64)
                 - za.max(-1, keepdims=True).astype(np.float64))
    p64 /= p64.sum(-1, keepdims=True)
    cdf = np.cumsum(p64, axis=-1)
    idx64 = np.sum(cdf <= sel, axis=-1)
    near = np.min(np.abs(cdf - sel), axis=-1) < 1e-5
    agree = (y_np == idx64) | near
    assert agree.all(), f"{np.sum(~agree)} semantic disagreements"

    # fallback: a selector of exactly 1.0 - eps with mass concentrated at
    # bin 0 can round sel*sum == sum -> scan failure -> silence_bin
    za1 = np.zeros((1, 256), np.float32)
    sel1 = np.array([[np.float32(1.0) - np.float32(2 ** -25)]], np.float32)
    y1 = em.sample_from_logits_np(za1, sel1, 77)
    assert y1[0] in (255, 77)


def test_cumsum_fixed_tree_matches_legacy():
    """The tree in exact_math is the same association as the legacy helpers
    in models/golden.py and ops/scan_generate.py."""
    from nv_wavenet_tpu.models.golden import cumsum_fixed_tree as cum_gold
    rng = np.random.RandomState(2)
    x = rng.uniform(0, 1, (64, 256)).astype(np.float32)
    a = em.fixed_tree_cumsum_np(x)
    b = cum_gold(x)
    c = np.asarray(jax.jit(em.fixed_tree_cumsum)(jnp.asarray(x)))
    assert np.array_equal(_bits(a), _bits(b))
    assert np.array_equal(_bits(a), _bits(c))


def test_exp_monotone_nondecreasing_on_grid():
    """No range-reduction seams: exp must be monotone over a dense grid
    crossing many k boundaries (a wrong k/r split shows up as a sawtooth)."""
    x = np.linspace(-20, 20, 2000001).astype(np.float32)
    y = em.exp_np(x)
    assert np.all(np.diff(y) >= 0)
    xt = np.linspace(-9, 9, 1000001).astype(np.float32)
    yt = em.tanh_np(xt)
    assert np.all(np.diff(yt) >= 0)
    # sigmoid is ~4 ulp accurate, which permits 1-ulp local dips — require
    # monotone up to rounding (diff >= -4 ulp of the local value)
    xs = np.linspace(-30, 30, 1000001).astype(np.float32)
    ys = em.sigmoid_np(xs)
    tol = 4 * np.spacing(ys[:-1])
    assert np.all(np.diff(ys) >= -tol)
