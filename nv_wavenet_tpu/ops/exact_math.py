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
  * XLA:CPU contracts `a*b + c` into an FMA, and XLA:TPU (which runs under
    --xla_allow_excess_precision in this environment) can carry an
    UNROUNDED product into a consuming multiply in some fusion contexts —
    measured as exactly 1/262,144 scan-vs-oracle flips that appeared with
    the Estrin rewrite's mul->mul power chains (r2 = r*r feeding
    r4 = r2*r2; Horner had no such seams) and vanished when the program
    shape changed.  EVERY product below — whether it feeds an add or
    another multiply — is therefore wrapped in `_g` = min(x, FLT_MAX): a
    VALUE-IDENTITY for all finite inputs (our ranges never overflow) that
    forces the product to a rounded fp32 value, fuses freely, and lowers
    on every backend (Mosaic rejects lax.optimization_barrier).

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
  recip_1p: 1/(1+e) for e in [0, 1] WITHOUT division — one degree-9
        polynomial (rel err ~1.2e-7, below the fp32 evaluation floor).
  tanh: |x| < 0.5: odd polynomial x + x^3 q(x^2) (rel err ~3e-9);
        |x| >= 0.5: 1 - 2 e2 * recip_1p(e2), e2 = exp(-2|x|), sign restored.
  sigmoid: e = exp(-|x|); r = recip_1p(e); x >= 0 -> r, x < 0 -> e*r.

  All polynomials evaluate in ESTRIN form with ONE documented association
  (the inline comments below are normative): the library sits on the
  kernel's per-layer dependent chain, where Horner's serial mul+add string
  is pure latency — Estrin's tree halves the dependent depth (exp 12 -> 5
  ops, recip 15 -> 7; measured on-chain via tools/probe_gate_chain.py, a
  ~6% headline recovery).  The tree is part of the canonical lowering:
  all three implementations perform the IDENTICAL op sequence.
  sampler: stable-softmax inverse-CDF with the UNNORMALIZED-sum comparison
        (the reference's own semantics, `/root/reference/softmax.cuh:
        150-189`): e = exp(za - max), fixed-tree prefix sum, pick the first
        bin with sel * sum < cum — no division anywhere on the sampling
        path.  Normalized p (dump / forced / p_seq outputs) divides by the
        tree sum; division is deterministic per backend, and p is a
        tolerance-governed output, not part of the integer contract.

Accuracy vs true values: exp <= ~2 ulp, tanh ~3 ulp, sigmoid <= ~4 ulp (checked
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

# e^r on [-ln2/2, ln2/2], ASCENDING order E0..E6 (E0 = E1 = 1 exactly)
EXP_C = tuple(np.float32(float.fromhex(h)) for h in (
    "0x1.000000p+0",    # E0
    "0x1.000000p+0",    # E1
    "0x1.000000p-1",    # E2
    "0x1.55547cp-3",    # E3
    "0x1.5554acp-5",    # E4
    "0x1.123d86p-7",    # E5
    "0x1.6d7536p-10",   # E6
))

# q(u) with tanh(x) = x + x^3 * q(x^2), u in [0, 0.25], ASCENDING D0..D5
TANH_Q = tuple(np.float32(float.fromhex(h)) for h in (
    "-0x1.555556p-2",   # D0
    "0x1.11110cp-3",    # D1
    "-0x1.ba1802p-5",   # D2
    "0x1.65d0fap-6",    # D3
    "-0x1.1a8ffap-7",   # D4
    "0x1.5f814ep-9",    # D5
))

# 1/(1+e) on [0, 1], degree 9, ASCENDING R0..R9 (single polynomial — no
# Newton step; rel err ~1.2e-7 with fp32 coefficients)
RECIP_C = tuple(np.float32(float.fromhex(h)) for h in (
    "0x1.fffffep-1",    # R0
    "-0x1.fffef8p-1",   # R1
    "0x1.ffdbfcp-1",    # R2
    "-0x1.fe110ap-1",   # R3
    "0x1.f22c3cp-1",    # R4
    "-0x1.c4ffa4p-1",   # R5
    "0x1.5ccfdap-1",    # R6
    "-0x1.90ca58p-2",   # R7
    "0x1.235bd0p-3",    # R8
    "-0x1.874680p-6",   # R9
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

_MOSAIC_NO_GUARD = False


class mosaic_guards_off:
    """Trace-time context: elide the `_g` anti-FMA guards while a PALLAS
    KERNEL BODY traces (Mosaic lowering) on a non-CPU backend.  Kernel
    builders (ops/persistent.py, ops/fused_chain.py) wrap their body
    functions in this; everything else keeps guards.

    Why the split (measured, round 5):
      * Mosaic never contracts mul+add — evidence: plain-mul+add probe
        0/131072 (tools/probe_exact_math_tpu.py) AND the full 20-layer
        flagship kernel vs the C++ oracle 0/262144 WITH guards elided
        (tools/horizon_tpu.py).  Eliding there takes ~50 ns/layer of pure
        VPU latency off the kernel's dependent chain (tools/
        probe_gate_chain.py) — a measured ~5% headline recovery.
      * XLA:TPU DOES contract in rare fusion contexts: a blanket
        backend-level elision produced exactly 1/262144 scan-vs-oracle
        mismatches (the standalone probe shows 0 — the contraction appears
        only inside larger fusions).  So the scan generator and the
        time-parallel scorer keep guards; they are throughput-bound, not
        chain-latency-bound, and the guard cost vanishes there.
      * XLA:CPU always contracts (35822/131072 on the probe): guards stay,
        and this context is a NO-OP on the cpu backend — interpret-mode
        kernels run their "Mosaic" body as XLA:CPU ops and need them.
    """

    def __enter__(self):
        global _MOSAIC_NO_GUARD
        self._old = _MOSAIC_NO_GUARD
        if jax.default_backend() != "cpu":
            _MOSAIC_NO_GUARD = True

    def __exit__(self, *exc):
        global _MOSAIC_NO_GUARD
        _MOSAIC_NO_GUARD = self._old


def _g(x: jax.Array) -> jax.Array:
    """Anti-fusion guard around every product: `lax.optimization_barrier`
    pins the product to its separately-rounded fp32 value on the XLA
    backends (see module docstring — XLA:CPU contracts mul+add eagerly;
    XLA:TPU was measured re-lowering ONE value per 262k draws in some
    fused program shapes, which a min(x, FLT_MAX) value-identity guard did
    NOT stop).  Elided only inside Mosaic kernel bodies
    (`mosaic_guards_off` above): Mosaic both rejects the barrier and was
    measured exactly-rounded guard-free at 262k draws."""
    if _MOSAIC_NO_GUARD:
        return x
    return jax.lax.optimization_barrier(x)


def exp(x: jax.Array) -> jax.Array:
    """Canonical fp32 e^x (input clamped to [-87, 88]).  Normative Estrin
    association: p = E6r2 + (E5r + E4) -> pA; E3r + E2 -> pB; r + 1 -> pC
    (E1 = E0 = 1: the *1 is elided — multiplication by 1.0 is exact);
    p = pA*r4 + (pB*r2 + pC)."""
    x = jnp.minimum(jnp.maximum(x, EXP_LO), EXP_HI)
    k = jnp.floor(_g(x * LOG2E) + HALF)
    r = (x - _g(k * LN2_HI)) - _g(k * LN2_LO)
    r2 = _g(r * r)
    r4 = _g(r2 * r2)
    pA = _g(EXP_C[6] * r2) + (_g(EXP_C[5] * r) + EXP_C[4])
    pB = _g(EXP_C[3] * r) + EXP_C[2]
    pC = r + ONE
    p = _g(pA * r4) + (_g(pB * r2) + pC)
    ki = k.astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(ki + jnp.int32(127), jnp.int32(23)), jnp.float32)
    return _g(p * scale)


def _recip_1p(e: jax.Array) -> jax.Array:
    """1/(1 + e) for e in [0, 1], division-free: one degree-9 polynomial.
    Normative Estrin association: q_i = R_{2i+1} e + R_{2i};
    h0 = q1 e2 + q0; h1 = q3 e2 + q2; y = q4 e8 + (h1 e4 + h0)."""
    e2 = _g(e * e)
    e4 = _g(e2 * e2)
    e8 = _g(e4 * e4)
    q0 = _g(RECIP_C[1] * e) + RECIP_C[0]
    q1 = _g(RECIP_C[3] * e) + RECIP_C[2]
    q2 = _g(RECIP_C[5] * e) + RECIP_C[4]
    q3 = _g(RECIP_C[7] * e) + RECIP_C[6]
    q4 = _g(RECIP_C[9] * e) + RECIP_C[8]
    h0 = _g(q1 * e2) + q0
    h1 = _g(q3 * e2) + q2
    return _g(q4 * e8) + (_g(h1 * e4) + h0)


def tanh(x: jax.Array) -> jax.Array:
    """Canonical fp32 tanh."""
    s = jnp.abs(x)
    # large branch: 1 - 2 e2 * recip_1p(e2), e2 = exp(-2|x|); -2|x| and
    # e2+e2 are exact
    e2 = exp(s * NEG2)
    tb = ONE - _g((e2 + e2) * _recip_1p(e2))
    tb = jnp.where(x < 0, -tb, tb)
    # small branch: odd polynomial x + (x*u)*q(u).  Normative Estrin:
    # a = D5u + D4; b = D3u + D2; c = D1u + D0; q = (a*u2 + b)*u2 + c
    u = _g(x * x)
    u2 = _g(u * u)
    a = _g(TANH_Q[5] * u) + TANH_Q[4]
    b = _g(TANH_Q[3] * u) + TANH_Q[2]
    c = _g(TANH_Q[1] * u) + TANH_Q[0]
    q = _g((_g(a * u2) + b) * u2) + c
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
    r2 = _g(r * r)
    r4 = _g(r2 * r2)
    pA = EXP_C[6] * r2 + (EXP_C[5] * r + EXP_C[4])
    pB = EXP_C[3] * r + EXP_C[2]
    pC = r + ONE
    p = pA * r4 + (pB * r2 + pC)
    ki = k.astype(np.int32)
    scale = ((ki + np.int32(127)) << np.int32(23)).view(np.float32)
    return p * scale


def _recip_1p_np(e: np.ndarray) -> np.ndarray:
    e2 = _g(e * e)
    e4 = _g(e2 * e2)
    e8 = _g(e4 * e4)
    q0 = RECIP_C[1] * e + RECIP_C[0]
    q1 = RECIP_C[3] * e + RECIP_C[2]
    q2 = RECIP_C[5] * e + RECIP_C[4]
    q3 = RECIP_C[7] * e + RECIP_C[6]
    q4 = RECIP_C[9] * e + RECIP_C[8]
    h0 = q1 * e2 + q0
    h1 = q3 * e2 + q2
    return q4 * e8 + (h1 * e4 + h0)


def tanh_np(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    s = np.abs(x)
    e2 = exp_np(s * NEG2)
    tb = ONE - (e2 + e2) * _recip_1p_np(e2)
    tb = np.where(x < 0, -tb, tb).astype(np.float32)
    u = _g(x * x)
    u2 = _g(u * u)
    a = TANH_Q[5] * u + TANH_Q[4]
    b = TANH_Q[3] * u + TANH_Q[2]
    c = TANH_Q[1] * u + TANH_Q[0]
    q = (a * u2 + b) * u2 + c
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
