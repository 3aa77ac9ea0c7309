// Bit-identical fp32 transcendentals — the C++ twin of
// nv_wavenet_tpu/ops/exact_math.py (see that docstring for the algorithms
// and rationale).  MUST be compiled with -ffp-contract=off (utils/native.py
// build flags): GCC contracting any mul+add below into an FMA would change
// the rounding and break the cross-implementation bit-identity the
// exact-match contract rests on.  Division-free on the contract path: fp32
// division is not correctly rounded on TPU, so tanh/sigmoid use a
// polynomial-seeded Newton reciprocal built from exactly-rounded mul/add
// only.  Every operation here matches the numpy and jnp (XLA/Mosaic)
// implementations bit-for-bit (tests/test_exact_math.py).
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
  float p = 0x1.6d7536p-10f;             // c6
  p = p * r + 0x1.123d86p-7f;            // c5
  p = p * r + 0x1.5554acp-5f;            // c4
  p = p * r + 0x1.55547cp-3f;            // c3
  p = p * r + 0.5f;                      // c2
  p = p * r + 1.0f;                      // c1
  p = p * r + 1.0f;                      // c0
  int32_t ki = (int32_t)k;
  float scale = bits_to_float((ki + 127) << 23);
  return p * scale;
}

// 1/(1+e) for e in [0, 1], division-free (poly seed + one Newton step)
inline float em_recip_1p(float e) {
  float y = 0x1.2e9e8cp-4f;              // r6
  y = y * e + -0x1.5133a0p-2f;           // r5
  y = y * e + 0x1.59c714p-1f;            // r4
  y = y * e + -0x1.d06c3cp-1f;           // r3
  y = y * e + 0x1.f9069ap-1f;            // r2
  y = y * e + -0x1.ff99c6p-1f;           // r1
  y = y * e + 0x1.ffff06p-1f;            // r0
  float d = 1.0f + e;
  return y * (2.0f - d * y);
}

// canonical fp32 tanh
inline float em_tanh(float x) {
  float s = std::fabs(x);
  if (s < 0.5f) {
    float u = x * x;
    float q = 0x1.5f814ep-9f;            // d5
    q = q * u + -0x1.1a8ffap-7f;         // d4
    q = q * u + 0x1.65d0fap-6f;          // d3
    q = q * u + -0x1.ba1802p-5f;         // d2
    q = q * u + 0x1.11110cp-3f;          // d1
    q = q * u + -0x1.555556p-2f;         // d0
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
