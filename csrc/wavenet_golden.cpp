// Native C++ golden oracle for the TPU WaveNet framework.
//
// Role parity with the reference's pure-C++ golden model
// (/root/reference/nv_wavenet_reference.cpp + matrix.cpp): a dependency-free
// CPU implementation of the autoregressive sample loop that the JAX/Pallas
// compute paths are cross-checked against.  It is written against THIS
// framework's canonical math spec (see nv_wavenet_tpu/models/golden.py):
// row-major [batch, channel] activations, [in, out] weights, fused 2-tap
// dilated GEMM, fused residual+skip GEMM, per-layer dilation FIFOs — not a
// translation of the reference's column-major Matrix code.
//
// Exposed as a C ABI consumed via ctypes (nv_wavenet_tpu/utils/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "exact_math.h"

using exact_math::em_exp;
using exact_math::em_sigmoid;
using exact_math::em_tanh;

namespace {

struct WaveNetCtx {
  int L, R, S, A, max_dilation, tanh_embed;
  std::vector<int> dil;        // per-layer dilation
  std::vector<int> ring_off;   // per-layer FIFO offset
  int ring_size;
  // weights, canonical layout
  std::vector<float> embed;    // [2A, R]
  std::vector<float> dil_w;    // [L, 2R, 2R]
  std::vector<float> dil_b;    // [L, 2R]
  std::vector<float> rs_w;     // [L, R, R+S]
  std::vector<float> rs_b;     // [L, R+S]
  std::vector<float> out_w;    // [S, A]
  std::vector<float> out_b;    // [A]
  std::vector<float> end_w;    // [A, A]
  std::vector<float> end_b;    // [A]
  // generation state (persists across wn_run calls; wn_reset clears)
  std::vector<float> ring;     // [ring_size, B, R]
  std::vector<int> y_prev, y_cur;
  long t = 0;
  int batch_alloc = 0;
  int silence_bin = 128;
};

// y[out_n] += x[in_k] @ W[in_k, out_n]
void matvec_acc(const float* x, const float* w, float* y, int k, int n) {
  for (int i = 0; i < k; i++) {
    float xv = x[i];
    const float* wr = w + (size_t)i * n;
    for (int j = 0; j < n; j++) y[j] += xv * wr[j];
  }
}

}  // namespace

extern "C" {

void* wn_create(int L, int R, int S, int A, int max_dilation, int tanh_embed) {
  auto* c = new WaveNetCtx();
  c->L = L; c->R = R; c->S = S; c->A = A;
  c->max_dilation = max_dilation; c->tanh_embed = tanh_embed;
  int d = 1, off = 0;
  for (int l = 0; l < L; l++) {
    c->dil.push_back(d);
    c->ring_off.push_back(off);
    off += d;
    d *= 2;
    if (d > max_dilation) d = 1;
  }
  c->ring_size = off;
  c->embed.resize((size_t)2 * A * R);
  c->dil_w.resize((size_t)L * 2 * R * 2 * R);
  c->dil_b.resize((size_t)L * 2 * R);
  c->rs_w.resize((size_t)L * R * (R + S));
  c->rs_b.resize((size_t)L * (R + S));
  c->out_w.resize((size_t)S * A);
  c->out_b.resize(A);
  c->end_w.resize((size_t)A * A);
  c->end_b.resize(A);
  return c;
}

void wn_destroy(void* p) { delete static_cast<WaveNetCtx*>(p); }

void wn_set_weights(void* p, const float* embed, const float* dil_w,
                    const float* dil_b, const float* rs_w, const float* rs_b,
                    const float* out_w, const float* out_b,
                    const float* end_w, const float* end_b) {
  auto* c = static_cast<WaveNetCtx*>(p);
  std::memcpy(c->embed.data(), embed, c->embed.size() * 4);
  std::memcpy(c->dil_w.data(), dil_w, c->dil_w.size() * 4);
  std::memcpy(c->dil_b.data(), dil_b, c->dil_b.size() * 4);
  std::memcpy(c->rs_w.data(), rs_w, c->rs_w.size() * 4);
  std::memcpy(c->rs_b.data(), rs_b, c->rs_b.size() * 4);
  std::memcpy(c->out_w.data(), out_w, c->out_w.size() * 4);
  std::memcpy(c->out_b.data(), out_b, c->out_b.size() * 4);
  std::memcpy(c->end_w.data(), end_w, c->end_w.size() * 4);
  std::memcpy(c->end_b.data(), end_b, c->end_b.size() * 4);
}

void wn_reset(void* p, int batch, int silence_bin) {
  ((WaveNetCtx*)p)->silence_bin = silence_bin;
  auto* c = static_cast<WaveNetCtx*>(p);
  c->batch_alloc = batch;
  c->ring.assign((size_t)c->ring_size * batch * c->R, 0.f);
  c->y_prev.assign(batch, silence_bin);
  c->y_cur.assign(batch, silence_bin);
  c->t = 0;
}

// cond: [T, L, B, 2R]; sel: [T, B]; y_out: [B, T]
// mode: 0 = injected-selector sampling, 1 = argmax
void wn_run(void* p, int T, int B, const float* cond, const float* sel,
            int mode, int* y_out) {
  auto* c = static_cast<WaveNetCtx*>(p);
  const int L = c->L, R = c->R, S = c->S, A = c->A;
  std::vector<float> x(R), xprev(R), zp(2 * R), zc(2 * R), z(2 * R), h(R),
      rs(R + S), skip(S), zs(A), za(A), prob(A);

  for (int s = 0; s < T; s++) {
    for (int b = 0; b < B; b++) {
      // embedding: rows [0,A) = prev table, [A,2A) = cur table
      const float* ep = c->embed.data() + (size_t)c->y_prev[b] * R;
      const float* ec = c->embed.data() + (size_t)(A + c->y_cur[b]) * R;
      for (int i = 0; i < R; i++) {
        float v = ep[i] + ec[i];
        x[i] = c->tanh_embed ? em_tanh(v) : v;
      }
      std::fill(skip.begin(), skip.end(), 0.f);

      for (int l = 0; l < L; l++) {
        int slot = c->ring_off[l] + (int)(c->t & (c->dil[l] - 1));
        float* ring_row = c->ring.data() + ((size_t)slot * B + b) * R;
        // read x_{t-d}, then write x_t into the same FIFO slot
        std::memcpy(xprev.data(), ring_row, R * 4);
        std::memcpy(ring_row, x.data(), R * 4);

        // canonical SPLIT dilated GEMM (models/golden.py docstring):
        // z = (x_prev @ Wprev + x @ Wcur) + (Bh + cond) — Wprev = input
        // rows [0, R), Wcur = rows [R, 2R) of the fused [2R, 2R] stack
        const float* cb = cond + (((size_t)s * L + l) * B + b) * 2 * R;
        const float* bb = c->dil_b.data() + (size_t)l * 2 * R;
        const float* wl = c->dil_w.data() + (size_t)l * 2 * R * 2 * R;
        std::fill(zp.begin(), zp.end(), 0.f);
        std::fill(zc.begin(), zc.end(), 0.f);
        matvec_acc(xprev.data(), wl, zp.data(), R, 2 * R);
        matvec_acc(x.data(), wl + (size_t)R * 2 * R, zc.data(), R, 2 * R);
        for (int j = 0; j < 2 * R; j++)
          z[j] = (zp[j] + zc[j]) + (bb[j] + cb[j]);
        // canonical gated activation: the bit-identical polynomial
        // tanh/sigmoid shared by all implementations (csrc/exact_math.h ==
        // ops/exact_math.py); division-free, FMA-free
        for (int j = 0; j < R; j++)
          h[j] = em_tanh(z[j]) * em_sigmoid(z[R + j]);

        std::fill(rs.begin(), rs.end(), 0.f);
        matvec_acc(h.data(), c->rs_w.data() + (size_t)l * R * (R + S),
                   rs.data(), R, R + S);
        const float* rb = c->rs_b.data() + (size_t)l * (R + S);
        for (int j = 0; j < R; j++) x[j] = (rs[j] + rb[j]) + x[j];
        for (int j = 0; j < S; j++) skip[j] = (skip[j] + rs[R + j]) + rb[R + j];
      }
      for (int j = 0; j < S; j++) skip[j] = skip[j] > 0.f ? skip[j] : 0.f;

      for (int j = 0; j < A; j++) zs[j] = c->out_b[j];
      matvec_acc(skip.data(), c->out_w.data(), zs.data(), S, A);
      for (int j = 0; j < A; j++) zs[j] = zs[j] > 0.f ? zs[j] : 0.f;
      for (int j = 0; j < A; j++) za[j] = c->end_b[j];
      matvec_acc(zs.data(), c->end_w.data(), za.data(), A, A);

      int y;
      if (mode == 1) {
        y = 0;
        for (int j = 1; j < A; j++)
          if (za[j] > za[y]) y = j;
      } else {
        // Canonical sampler (ops/exact_math.py::sample_from_logits):
        // stable-softmax inverse-CDF with the UNNORMALIZED-sum comparison
        // (the reference's own semantics, softmax.cuh:150-189) — e =
        // em_exp(za - max), FIXED Hillis-Steele prefix tree (the identical
        // sequence of fp32 adds as the numpy golden and the Pallas
        // kernel), pick the first bin with sel*sum < cum; fallback to the
        // configured silence bin on scan failure (softmax.cuh:155).  No
        // division anywhere (TPU fp32 divide is not correctly rounded).
        float m = za[0];
        for (int j = 1; j < A; j++) m = za[j] > m ? za[j] : m;
        for (int j = 0; j < A; j++) prob[j] = em_exp(za[j] - m);
        for (int k = 1; k < A; k <<= 1)
          for (int j = A - 1; j >= k; j--) prob[j] += prob[j - k];
        float thr = sel[(size_t)s * B + b] * prob[A - 1];
        y = c->silence_bin;
        for (int j = 0; j < A; j++)
          if (thr < prob[j]) { y = j; break; }
      }
      c->y_prev[b] = c->y_cur[b];
      c->y_cur[b] = y;
      y_out[(size_t)b * T + s] = y;
    }
    c->t += 1;
  }
}

int wn_ring_size(void* p) { return static_cast<WaveNetCtx*>(p)->ring_size; }

// Vectorized exports of the canonical transcendentals, for the
// cross-implementation bit-identity tests (tests/test_exact_math.py).
void wn_exact_exp(const float* x, float* y, int n) {
  for (int i = 0; i < n; i++) y[i] = em_exp(x[i]);
}
void wn_exact_tanh(const float* x, float* y, int n) {
  for (int i = 0; i < n; i++) y[i] = em_tanh(x[i]);
}
void wn_exact_sigmoid(const float* x, float* y, int n) {
  for (int i = 0; i < n; i++) y[i] = em_sigmoid(x[i]);
}

}  // extern "C"
