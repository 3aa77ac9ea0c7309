"""Math-primitive tests — the analog of the reference's `math_test.cu`
(`/root/reference/math_test.cu`): the GEMM primitive is checked bit-exactly
on integer-valued inputs (`math_test.cu:126-138,283-293`), and the fused
softmax+select is checked against an independent CPU cumsum scan including
the scan-failure fallback (`math_test.cu:354-401`, `softmax.cuh:150-189`).

Here the "primitives" are the framework's canonical formulations shared by
the scan generator and the Pallas kernel: HIGHEST-precision MXU dot, one-hot
embedding GEMM, stable softmax, inverse-CDF selection (count of cumsum <=
sel) with fallback to the silence bin, and the kernel's cumsum-via-
triangular-matmul trick.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nv_wavenet_tpu.models.golden import select_sample
from nv_wavenet_tpu.ops import exact_math as em
from nv_wavenet_tpu.ops.scan_generate import embed_lookup, select_from_logits

HI = jax.lax.Precision.HIGHEST


def _softmax(za):
    """Canonical normalized p (tolerance-governed output path)."""
    e, cum = em.softmax_cumsum_np(np.asarray(za, np.float32))
    return em.softmax_p_np(e, cum)


def test_gemm_bit_exact_on_integer_inputs():
    """Integer-valued fp32 matmul must be bit-exact vs. the naive float64
    accumulation (every product and partial sum is exactly representable) —
    the reference's exact-== GEMM check (`math_test.cu:126-138`)."""
    rng = np.random.RandomState(0)
    a = rng.randint(-8, 8, size=(16, 96)).astype(np.float32)
    b = rng.randint(-8, 8, size=(96, 48)).astype(np.float32)
    got = np.asarray(jnp.dot(a, b, precision=HI,
                             preferred_element_type=jnp.float32))
    want = (a.astype(np.float64) @ b.astype(np.float64)).astype(np.float32)
    assert (got == want).all()


def test_gemm_float_inputs_match_numpy_fp32_tolerance():
    rng = np.random.RandomState(1)
    a = rng.uniform(-1, 1, (8, 128)).astype(np.float32)
    b = rng.uniform(-1, 1, (128, 64)).astype(np.float32)
    got = np.asarray(jnp.dot(a, b, precision=HI,
                             preferred_element_type=jnp.float32))
    np.testing.assert_allclose(got, a @ b, rtol=1e-6, atol=1e-6)


def test_onehot_embedding_equals_gather_add_exactly():
    """The one-hot GEMM formulation sums exactly two nonzero products, so it
    must equal the golden model's gather+add bit-for-bit (zeros are exact)."""
    rng = np.random.RandomState(2)
    A, R, B = 64, 32, 8
    table = rng.uniform(-1, 1, (2 * A, R)).astype(np.float32)
    y_prev = rng.randint(0, A, B)
    y_cur = rng.randint(0, A, B)
    got = np.asarray(embed_lookup(jnp.asarray(table), jnp.asarray(y_prev),
                                  jnp.asarray(y_cur), A, tanh_embed=False,
                                  precision=HI))
    want = table[y_prev] + table[A + y_cur]
    assert (got == want).all()


def test_softmax_matches_reference_formulation():
    rng = np.random.RandomState(3)
    za = rng.uniform(-5, 5, (4, 256)).astype(np.float32)
    p = _softmax(za)
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-6)
    # max-subtracted stability: huge logits don't overflow exp
    big = (za + np.float32(3e38 / 2)).astype(np.float32)
    p2 = _softmax(big)
    assert np.isfinite(p2).all()
    e64 = np.exp(big.astype(np.float64) - big.max(-1, keepdims=True))
    want = (e64 / e64.sum(-1, keepdims=True)).astype(np.float32)
    np.testing.assert_allclose(p2, want, rtol=1e-4, atol=1e-7)


# both canonical sampler entry points take LOGITS: the numpy golden's
# select_sample and the scan generator's select_from_logits (both delegate
# to exact_math's unnormalized-sum comparison)
SELECT_FORMULATIONS = [select_sample,
                       lambda za, s, f: np.asarray(
                           select_from_logits(jnp.asarray(za),
                                              jnp.asarray(s), f))]


@pytest.mark.parametrize("formulation", SELECT_FORMULATIONS)
def test_select_basic_and_edges(formulation):
    A, fallback = 16, 8
    za = np.zeros((1, A), np.float32)          # uniform p = 1/A
    # sel in the middle of bin k selects k
    for k in range(A):
        sel = np.array([(k + 0.5) / A], np.float32)
        assert formulation(za, sel, fallback)[0] == k
    # sel = 0 selects bin 0 (first bin with positive mass)
    assert formulation(za, np.zeros(1, np.float32), fallback)[0] == 0
    # mass concentrated in the last bin
    zq = np.full((1, A), -60.0, np.float32)
    zq[0, -1] = 60.0
    assert formulation(zq, np.array([0.3], np.float32), fallback)[0] == A - 1


@pytest.mark.parametrize("formulation", SELECT_FORMULATIONS)
def test_select_scan_failure_falls_back_to_silence(formulation):
    """The reference's sampler can 'fail the scan' and emit bin 128
    (`softmax.cuh:155`).  The canonical unnormalized comparison makes that
    structurally impossible for in-domain selectors — sel*sum always rounds
    strictly below the final cumsum entry for sel <= 1-2^-24 (an improvement
    over the old normalized form, where total fp32 mass < sel failed) — so
    the defensive fallback branch is exercised with an out-of-domain
    selector, and the in-domain worst case must select the last bin."""
    A, fallback = 16, 8
    za = np.zeros((1, A), np.float32)
    # out-of-domain selector: thr = 1.5*sum > every cumsum entry -> fallback
    assert formulation(za, np.array([1.5], np.float32), fallback)[0] \
        == fallback
    # in-domain worst case: sel = 1 - 2^-24 picks the last bin, not fallback
    sel = np.array([np.nextafter(np.float32(1.0), np.float32(0.0))],
                   np.float32)
    assert formulation(za, sel, fallback)[0] == A - 1


def test_cumsum_fixed_tree_bit_identical_across_impls():
    """All implementations share ONE prefix-sum float association (the
    Hillis-Steele fixed tree), so the cumulative sums are bit-identical —
    the structural guarantee behind the exact-integer-match contract (a
    sequential cumsum vs. a matmul tree differ by ~1 ulp, flipping a sample
    whenever a selector lands in the gap)."""
    from nv_wavenet_tpu.models.golden import cumsum_fixed_tree as cum_np
    from nv_wavenet_tpu.ops.scan_generate import cumsum_fixed_tree as cum_jnp

    rng = np.random.RandomState(4)
    for A in (16, 256, 1024):
        p = _softmax(rng.uniform(-4, 4, (16, A)).astype(np.float32))
        a = cum_np(p)
        b = np.asarray(cum_jnp(jnp.asarray(p)))
        assert (a == b).all(), f"A={A}: numpy vs jnp fixed-tree cumsum differ"
        # prefix property: close to the sequential sum, ends near 1
        np.testing.assert_allclose(a, np.cumsum(p, axis=-1), rtol=1e-5,
                                   atol=1e-6)
        # odd lane count also folds correctly
    p = _softmax(rng.uniform(-4, 4, (4, 37)).astype(np.float32))
    assert (cum_np(p) == np.asarray(cum_jnp(jnp.asarray(p)))).all()


def test_gated_activation_range():
    rng = np.random.RandomState(5)
    z = rng.uniform(-10, 10, (8, 128)).astype(np.float32)
    h = np.tanh(z[:, :64]) * (1.0 / (1.0 + np.exp(-z[:, 64:])))
    assert (np.abs(h) <= 1.0).all()
