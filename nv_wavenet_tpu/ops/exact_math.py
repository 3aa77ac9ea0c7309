"""Bit-identical fp32 transcendentals (exp / tanh / sigmoid) and the
canonical softmax+sampler — ONE lowering shared by every implementation of
the compute path.

Why this exists: the exact-match contract (reference:
`/root/reference/nv_wavenet_test.cu:302-304`) requires every implementation
to produce the same fp32 values.  Measured on this hardware
(tools/probe_exact_math_tpu.py):

  * add/sub/mul/min/max/floor/select/int-shift/bitcast round IDENTICALLY on
    numpy, g++ (-ffp-contract=off), XLA:CPU, XLA:TPU and Mosaic/Pallas;
  * transcendental LOWERINGS (exp/tanh/sigmoid) differ per backend by ~1 ulp
    — which the 20-layer autoregressive chain amplifies into ~1e-5/sample
    integer flips beyond ~16k draws (docs/DESIGN.md);
  * fp32 DIVISION is not correctly rounded on TPU (differs from numpy/libm
    on ~35% of operands by 1 ulp) — so a bit-identical library must also be
    division-free on the contract path;
  * XLA:CPU (alone) contracts `a*b + c` into an FMA; XLA:TPU and Mosaic do
    not.  Every product that could feed an add below is therefore wrapped in
    `_g` = min(x, FLT_MAX): a VALUE-IDENTITY for all finite inputs (our
    ranges never overflow) that structurally breaks the fma pattern, fuses
    freely, and lowers on every backend (Mosaic rejects
    lax.optimization_barrier).

Three implementations, kept in lockstep by tests/test_exact_math.py's dense
cross-identity checks:
  * the jnp functions below (used under XLA:CPU, XLA:TPU AND inside Pallas
    kernels — Mosaic lowers the same basic ops to the same VPU arithmetic),
  * the numpy twins (`*_np`, used by models/golden.py; the `_g` guard is an
    identity so numpy simply omits it),
  * the C++ twin (`csrc/exact_math.h`, used by the native oracle; compiled
    with -ffp-contract=off so GCC cannot contract either).

Algorithms (classical, constants from tools/gen_exact_math_coeffs.py):
  exp:  Cody-Waite range reduction x = k*ln2 + r (fdlibm float ln2 split,
        k*LN2_HI exact for |k| <= 2^11), degree-6 polynomial for e^r on
        r in [-ln2/2, ln2/2] (rel err ~1e-8), scale by 2^k built from
        integer exponent bits ((k+127) << 23 bitcast to f32).  Input clamped
        to [-87, 88]: no overflow and no denormals at either end.
  recip_1p: 1/(1+e) for e in [0, 1] WITHOUT division — degree-6 polynomial
        seed (rel err ~1e-5) + one Newton step y*(2 - d*y): rel err ~2e-7.
  tanh: |x| < 0.5: odd polynomial x + x^3 q(x^2) (rel err ~3e-9);
        |x| >= 0.5: 1 - 2 e2 * recip_1p(e2), e2 = exp(-2|x|), sign restored.
  sigmoid: e = exp(-|x|); r = recip_1p(e); x >= 0 -> r, x < 0 -> e*r.
  sampler: stable-softmax inverse-CDF with the UNNORMALIZED-sum comparison
        (the reference's own semantics, `/root/reference/softmax.cuh:
        150-189`): e = exp(za - max), fixed-tree prefix sum, pick the first
        bin with sel * sum < cum — no division anywhere on the sampling
        path.  Normalized p (dump / forced / p_seq outputs) divides by the
        tree sum; division is deterministic per backend, and p is a
        tolerance-governed output, not part of the integer contract.

Accuracy vs true values: exp/tanh <= ~2 ulp, sigmoid <= ~4 ulp (checked
against float64 in tests/test_exact_math.py) — libm-class, so adopting these
as THE canonical lowering costs no model quality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# fp32 constants, exact by construction (see tools/gen_exact_math_coeffs.py)
LOG2E = np.float32(float.fromhex("0x1.715476p+0"))
LN2_HI = np.float32(float.fromhex("0x1.62e400p-1"))   # 12 trailing zero bits
LN2_LO = np.float32(float.fromhex("0x1.7f7d1cp-20"))
EXP_LO = np.float32(-87.0)
EXP_HI = np.float32(88.0)
FLT_MAX = np.float32(3.4028234663852886e38)

# e^r on [-ln2/2, ln2/2], Horner order c6 -> c0 (c0 = 1 exactly)
EXP_C = tuple(np.float32(float.fromhex(h)) for h in (
    "0x1.6d7536p-10",   # c6
    "0x1.123d86p-7",    # c5
    "0x1.5554acp-5",    # c4
    "0x1.55547cp-3",    # c3
    "0x1.000000p-1",    # c2
    "0x1.000000p+0",    # c1
    "0x1.000000p+0",    # c0
))

# q(u) with tanh(x) = x + x^3 * q(x^2), u in [0, 0.25], Horner d5 -> d0
TANH_Q = tuple(np.float32(float.fromhex(h)) for h in (
    "0x1.5f814ep-9",    # d5
    "-0x1.1a8ffap-7",   # d4
    "0x1.65d0fap-6",    # d3
    "-0x1.ba1802p-5",   # d2
    "0x1.11110cp-3",    # d1
    "-0x1.555556p-2",   # d0
))

# seed for 1/(1+e) on [0, 1], Horner r6 -> r0
RECIP_C = tuple(np.float32(float.fromhex(h)) for h in (
    "0x1.2e9e8cp-4",    # r6
    "-0x1.5133a0p-2",   # r5
    "0x1.59c714p-1",    # r4
    "-0x1.d06c3cp-1",   # r3
    "0x1.f9069ap-1",    # r2
    "-0x1.ff99c6p-1",   # r1
    "0x1.ffff06p-1",    # r0
))

TANH_SMALL = np.float32(0.5)
ONE = np.float32(1.0)
HALF = np.float32(0.5)
TWO = np.float32(2.0)
NEG2 = np.float32(-2.0)


# ---------------------------------------------------------------------------
# jnp implementations — identical lowering under XLA:CPU, XLA:TPU and Mosaic
# (Pallas): every op below is an exactly-rounded basic fp32/int32 op.
# ---------------------------------------------------------------------------

def _g(x: jax.Array) -> jax.Array:
    """Anti-FMA guard: value-identity min against FLT_MAX that structurally
    breaks XLA:CPU's mul+add -> fma contraction (see module docstring).
    Wrap every product whose result may feed an add/sub."""
    return jnp.minimum(x, FLT_MAX)


def exp(x: jax.Array) -> jax.Array:
    """Canonical fp32 e^x (input clamped to [-87, 88])."""
    x = jnp.minimum(jnp.maximum(x, EXP_LO), EXP_HI)
    k = jnp.floor(_g(x * LOG2E) + HALF)
    r = (x - _g(k * LN2_HI)) - _g(k * LN2_LO)
    p = EXP_C[0]
    for c in EXP_C[1:]:
        p = _g(p * r) + c
    ki = k.astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(ki + jnp.int32(127), jnp.int32(23)), jnp.float32)
    return _g(p * scale)


def _recip_1p(e: jax.Array) -> jax.Array:
    """1/(1 + e) for e in [0, 1], division-free (poly seed + one Newton)."""
    y = RECIP_C[0]
    for c in RECIP_C[1:]:
        y = _g(y * e) + c
    d = ONE + e
    return _g(y * (TWO - _g(d * y)))


def tanh(x: jax.Array) -> jax.Array:
    """Canonical fp32 tanh."""
    s = jnp.abs(x)
    # large branch: 1 - 2 e2 * recip_1p(e2), e2 = exp(-2|x|); -2|x| and
    # e2+e2 are exact
    e2 = exp(s * NEG2)
    tb = ONE - _g((e2 + e2) * _recip_1p(e2))
    tb = jnp.where(x < 0, -tb, tb)
    # small branch: odd polynomial (association fixed: x + (x*u)*q)
    u = x * x
    q = TANH_Q[0]
    for d in TANH_Q[1:]:
        q = _g(q * u) + d
    ts = x + _g(_g(x * u) * q)
    return jnp.where(s < TANH_SMALL, ts, tb)


def sigmoid(x: jax.Array) -> jax.Array:
    """Canonical fp32 logistic sigmoid."""
    e = exp(-jnp.abs(x))
    r = _recip_1p(e)
    return jnp.where(x >= 0, r, _g(e * r))


def fixed_tree_cumsum(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum over the last axis with a FIXED association tree
    (Hillis-Steele: log2(A) rounds of shift-and-add).  Every implementation
    performs the IDENTICAL sequence of fp32 adds, so prefix sums are
    bit-identical across platforms (a sequential cumsum or an MXU
    triangular-matmul reduce associates differently by ~1 ulp, flipping a
    sampled integer whenever a selector lands in the gap)."""
    A = x.shape[-1]
    k = 1
    while k < A:
        x = x + jnp.pad(x[..., :-k], [(0, 0)] * (x.ndim - 1) + [(k, 0)])
        k *= 2
    return x


def softmax_cumsum(za: jax.Array):
    """Canonical stable-softmax pieces: (e, cum) with e = exp(za - max) and
    cum its fixed-tree prefix sum; the row sum is cum[..., -1:].  Shared by
    the sampler (`select_from_cumsum`) and the normalized-p output
    (`softmax_p`)."""
    m = jnp.max(za, axis=-1, keepdims=True)
    e = exp(za - m)
    return e, fixed_tree_cumsum(e)


def softmax_p(e: jax.Array, cum: jax.Array) -> jax.Array:
    """Normalized probabilities from `softmax_cumsum` parts.  Uses native
    division: p is a tolerance-governed OUTPUT (dump mode / p_seq), not part
    of the integer exact-match contract (TPU divide is ~1 ulp off
    correctly-rounded; see module docstring)."""
    return e / cum[..., -1:]


def select_from_cumsum(cum: jax.Array, sel: jax.Array, A: int,
                       silence_bin: int) -> jax.Array:
    """Inverse-CDF pick over the UNNORMALIZED fixed-tree prefix sum: first
    bin with sel * sum < cum, fallback to silence_bin when the scan fails
    (the reference's comparison and fallback semantics,
    `/root/reference/softmax.cuh:150-189` + `:155`).  cum: [..., A];
    sel: [..., 1] uniforms in [0, 1)."""
    thr = sel * cum[..., -1:]
    idx = jnp.sum((cum <= thr).astype(jnp.int32), axis=-1)
    return jnp.where(idx < A, idx, silence_bin).astype(jnp.int32)


def sample_from_logits(za: jax.Array, sel: jax.Array,
                       silence_bin: int) -> jax.Array:
    """The full canonical sampler: za [..., A] logits, sel [..., 1] uniforms
    -> sampled bins [...] int32.  Division-free; bit-identical across numpy /
    C++ / XLA / Mosaic by construction."""
    _, cum = softmax_cumsum(za)
    return select_from_cumsum(cum, sel, za.shape[-1], silence_bin)


# ---------------------------------------------------------------------------
# numpy twins (models/golden.py) — the same ops through numpy's IEEE fp32;
# numpy never contracts, so the `_g` guards (value identities) are omitted.
# ---------------------------------------------------------------------------

def exp_np(x: np.ndarray) -> np.ndarray:
    x = np.minimum(np.maximum(np.asarray(x, np.float32), EXP_LO), EXP_HI)
    k = np.floor(x * LOG2E + HALF)
    r = (x - k * LN2_HI) - k * LN2_LO
    p = np.full_like(r, EXP_C[0])
    for c in EXP_C[1:]:
        p = p * r + c
    ki = k.astype(np.int32)
    scale = ((ki + np.int32(127)) << np.int32(23)).view(np.float32)
    return p * scale


def _recip_1p_np(e: np.ndarray) -> np.ndarray:
    y = np.full_like(e, RECIP_C[0])
    for c in RECIP_C[1:]:
        y = y * e + c
    d = ONE + e
    return y * (TWO - d * y)


def tanh_np(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    s = np.abs(x)
    e2 = exp_np(s * NEG2)
    tb = ONE - (e2 + e2) * _recip_1p_np(e2)
    tb = np.where(x < 0, -tb, tb).astype(np.float32)
    u = x * x
    q = np.full_like(u, TANH_Q[0])
    for d in TANH_Q[1:]:
        q = q * u + d
    ts = x + (x * u) * q
    return np.where(s < TANH_SMALL, ts, tb).astype(np.float32)


def sigmoid_np(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    e = exp_np(-np.abs(x))
    r = _recip_1p_np(e)
    return np.where(x >= 0, r, e * r).astype(np.float32)


def fixed_tree_cumsum_np(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    A = x.shape[-1]
    k = 1
    while k < A:
        sh = np.zeros_like(x)
        sh[..., k:] = x[..., :-k]
        x = x + sh
        k *= 2
    return x


def softmax_cumsum_np(za: np.ndarray):
    m = np.max(za, axis=-1, keepdims=True)
    e = exp_np(za - m)
    return e, fixed_tree_cumsum_np(e)


def softmax_p_np(e: np.ndarray, cum: np.ndarray) -> np.ndarray:
    return e / cum[..., -1:]


def select_from_cumsum_np(cum: np.ndarray, sel: np.ndarray, A: int,
                          silence_bin: int) -> np.ndarray:
    thr = np.asarray(sel, np.float32) * cum[..., -1:]
    idx = np.sum(cum <= thr, axis=-1)
    return np.where(idx < A, idx, silence_bin).astype(np.int32)


def sample_from_logits_np(za: np.ndarray, sel: np.ndarray,
                          silence_bin: int) -> np.ndarray:
    _, cum = softmax_cumsum_np(za)
    return select_from_cumsum_np(cum, sel, za.shape[-1], silence_bin)
