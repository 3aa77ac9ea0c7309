// Bit-identical fp32 transcendentals — the C++ twin of
// nv_wavenet_tpu/ops/exact_math.py (see that docstring for the algorithms
// and rationale).  MUST be compiled with -ffp-contract=off (utils/native.py
// build flags): GCC contracting any mul+add below into an FMA would change
// the rounding and break the cross-implementation bit-identity the
// exact-match contract rests on.  Division-free on the contract path: fp32
// division is not correctly rounded on TPU, so tanh/sigmoid use a single
// degree-9 reciprocal polynomial built from exactly-rounded mul/add only.
// All polynomials evaluate in the NORMATIVE Estrin association documented
// in exact_math.py (the tree is part of the canonical lowering — it halves
// the TPU kernel's dependent-chain depth vs Horner).  Every operation here
// matches the numpy and jnp (XLA/Mosaic) implementations bit-for-bit
// (tests/test_exact_math.py).
//
// Constants from tools/gen_exact_math_coeffs.py; keep the three
// implementations in lockstep — any change lands in all of them or none.

#ifndef NVW_EXACT_MATH_H_
#define NVW_EXACT_MATH_H_

#include <cmath>
#include <cstdint>
#include <cstring>

namespace exact_math {

inline float bits_to_float(int32_t b) {
  float f;
  std::memcpy(&f, &b, 4);
  return f;
}

// canonical fp32 e^x, input clamped to [-87, 88]
inline float em_exp(float x) {
  const float kLog2e = 0x1.715476p+0f;
  const float kLn2Hi = 0x1.62e400p-1f;   // 12 trailing zero mantissa bits
  const float kLn2Lo = 0x1.7f7d1cp-20f;
  x = x < -87.0f ? -87.0f : x;
  x = x > 88.0f ? 88.0f : x;
  float k = std::floor(x * kLog2e + 0.5f);
  float r = (x - k * kLn2Hi) - k * kLn2Lo;
  float r2 = r * r;
  float r4 = r2 * r2;
  float pA = 0x1.6d7536p-10f * r2 + (0x1.123d86p-7f * r + 0x1.5554acp-5f);
  float pB = 0x1.55547cp-3f * r + 0.5f;
  float pC = r + 1.0f;
  float p = pA * r4 + (pB * r2 + pC);
  int32_t ki = (int32_t)k;
  float scale = bits_to_float((ki + 127) << 23);
  return p * scale;
}

// 1/(1+e) for e in [0, 1], division-free: one degree-9 polynomial (Estrin)
inline float em_recip_1p(float e) {
  float e2 = e * e;
  float e4 = e2 * e2;
  float e8 = e4 * e4;
  float q0 = -0x1.fffef8p-1f * e + 0x1.fffffep-1f;    // R1 e + R0
  float q1 = -0x1.fe110ap-1f * e + 0x1.ffdbfcp-1f;    // R3 e + R2
  float q2 = -0x1.c4ffa4p-1f * e + 0x1.f22c3cp-1f;    // R5 e + R4
  float q3 = -0x1.90ca58p-2f * e + 0x1.5ccfdap-1f;    // R7 e + R6
  float q4 = -0x1.874680p-6f * e + 0x1.235bd0p-3f;    // R9 e + R8
  float h0 = q1 * e2 + q0;
  float h1 = q3 * e2 + q2;
  return q4 * e8 + (h1 * e4 + h0);
}

// canonical fp32 tanh
inline float em_tanh(float x) {
  float s = std::fabs(x);
  if (s < 0.5f) {
    float u = x * x;
    float u2 = u * u;
    float a = 0x1.5f814ep-9f * u + -0x1.1a8ffap-7f;   // D5 u + D4
    float b = 0x1.65d0fap-6f * u + -0x1.ba1802p-5f;   // D3 u + D2
    float c = 0x1.11110cp-3f * u + -0x1.555556p-2f;   // D1 u + D0
    float q = (a * u2 + b) * u2 + c;
    return x + (x * u) * q;
  }
  float e2 = em_exp(s * -2.0f);
  float tb = 1.0f - (e2 + e2) * em_recip_1p(e2);
  return x < 0.0f ? -tb : tb;
}

// canonical fp32 logistic sigmoid
inline float em_sigmoid(float x) {
  float e = em_exp(-std::fabs(x));
  float r = em_recip_1p(e);
  return x >= 0.0f ? r : e * r;
}

}  // namespace exact_math

#endif  // NVW_EXACT_MATH_H_
