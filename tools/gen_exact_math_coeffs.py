"""Offline coefficient generator for ops/exact_math.py (the bit-identical
transcendental library).

Fits minimax-flavored polynomials in float64 (Chebyshev-node least squares —
adequate at fp32 target accuracy) and prints the fp32-rounded coefficients as
exact hex floats, to be pasted verbatim into ops/exact_math.py and
csrc/exact_math.h.  Run once; committed so the constants are reproducible.

  exp:  e^r on r in [-ln2/2, ln2/2], degree 6, c0 pinned to 1
  tanh: q(u) with tanh(x) = x + x^3 * q(x^2), u = x^2 in [0, 0.25], degree 5
"""

import numpy as np


def cheb_nodes(a, b, n):
    k = np.arange(n, dtype=np.float64)
    x = np.cos((2 * k + 1) * np.pi / (2 * n))
    return 0.5 * (a + b) + 0.5 * (b - a) * x


def fit(f, a, b, deg, n=2000, weight=None):
    x = cheb_nodes(a, b, n)
    y = f(x)
    V = np.vander(x, deg + 1, increasing=True)
    w = np.ones_like(x) if weight is None else weight(x)
    c, *_ = np.linalg.lstsq(V * w[:, None], y * w, rcond=None)
    return c


def report(name, c, f, a, b):
    x = np.linspace(a, b, 200001)
    approx = np.polyval(c[::-1], x)
    rel = np.abs(approx / f(x) - 1)
    c32 = c.astype(np.float32)
    approx32 = np.polyval(c32[::-1].astype(np.float64), x)
    rel32 = np.abs(approx32 / f(x) - 1)
    print(f"# {name}: max rel err f64-coeffs {rel.max():.3e}, "
          f"f32-coeffs {rel32.max():.3e}")
    for i, v in enumerate(c32):
        print(f"  c{i} = {float(v).hex()}  # {v!r}")
    return c32


def main():
    ln2 = float(np.log(2.0))

    # e^r with c0 pinned exactly to 1 (so exp(0) == 1 bit-exactly):
    # fit (e^r - 1)/r, degree 5, then shift
    c_tail = fit(lambda r: np.expm1(r) / r, -ln2 / 2, ln2 / 2, 5)
    c_exp = np.concatenate([[1.0], c_tail])
    report("exp poly e^r, r in +-ln2/2 (c0=1 exact)", c_exp,
           np.exp, -ln2 / 2, ln2 / 2)

    # tanh(x) = x + x^3 q(x^2): fit q(u) = (tanh(sqrt(u)) - sqrt(u))/u^1.5
    def q(u):
        x = np.sqrt(u)
        return (np.tanh(x) - x) / (x ** 3)

    c_q = fit(q, 1e-12, 0.25, 5)
    # report absolute error of full tanh with f32 coeffs
    x = np.linspace(1e-8, 0.5, 200001)
    c32 = c_q.astype(np.float32)
    approx = x + x ** 3 * np.polyval(c32[::-1].astype(np.float64), x * x)
    rel = np.abs(approx / np.tanh(x) - 1)
    print(f"# tanh small-branch: max rel err (f32 coeffs) {rel.max():.3e}")
    for i, v in enumerate(c32):
        print(f"  d{i} = {float(v).hex()}  # {v!r}")

    # 1/(1+e) on e in [0, 1], degree 9 — replaces the round-2 seed+Newton:
    # a single Estrin-evaluated polynomial has ~6 dependent ops vs the
    # seed(12)+Newton(3) chain's 15 (the library sits on the kernel's
    # per-layer dependent chain; tools/probe_gate_chain.py).  Chebyshev
    # convergence for 1/(1+e) on [0,1] is rho = 3+2*sqrt(2): deg-9 leaves
    # ~2e-8 — below the fp32 rounding floor of the evaluation itself.
    c_r = fit(lambda e: 1.0 / (1.0 + e), 0.0, 1.0, 9)
    report("recip_1p 1/(1+e), e in [0,1], degree 9", c_r,
           lambda e: 1.0 / (1.0 + e), 0.0, 1.0)

    # Cody-Waite ln2 split (fdlibm float constants): ln2_hi has 12 trailing
    # zero mantissa bits so k*ln2_hi is exact for |k| <= 2^11
    hi = np.float32(np.frombuffer(np.uint32(0x3F317200).tobytes(),
                                  np.float32)[0])
    lo = np.float64(ln2) - np.float64(hi)
    lo32 = np.float32(lo)
    print(f"# LN2_HI = {float(hi).hex()} ({hi!r})")
    print(f"# LN2_LO = {float(lo32).hex()} ({lo32!r})")
    print(f"# LOG2E  = {float(np.float32(1 / ln2)).hex()} "
          f"({np.float32(1 / ln2)!r})")


if __name__ == "__main__":
    main()
