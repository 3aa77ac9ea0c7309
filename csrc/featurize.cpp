// Native C++ feature-extraction pipeline for the TPU WaveNet framework.
//
// Role parity with the reference's data path: the reference delegates
// STFT/mel extraction to the Tacotron2 submodule's torch STFT
// (/root/reference/pytorch/mel2samp_onehot.py:41-42,56-59) and mu-law
// companding to pytorch/utils.py:62-90.  This is the framework's native
// (dependency-free C++) implementation of the same featurization, written
// against the numpy spec in nv_wavenet_tpu/train/data.py so the two can be
// cross-checked numerically:
//
//   * centered reflect-pad hann-window STFT magnitudes,
//   * Slaney-scale triangular mel filterbank (constant energy per channel),
//   * log dynamic-range compression with 1e-5 clip,
//   * mu-law encode/decode.
//
// The DFT is computed as a precomputed-twiddle real DFT (one [n_bins x n_fft]
// cos/sin matrix product per frame).  n_fft=800 (the shipped config) is not a
// power of two; a matrix DFT is simple, exact, vectorizes well under -O3, and
// the data loader is not on the TPU hot path.
//
// Exposed as a C ABI consumed via ctypes (nv_wavenet_tpu/utils/native.py).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <vector>

namespace {

struct FeatCtx {
  int n_fft, hop, win, n_mels;
  double sr, fmin, fmax;
  int n_bins;                 // n_fft/2 + 1
  std::vector<float> window;  // [n_fft] (win-length hann, centered in n_fft)
  std::vector<float> cos_t;   // [n_bins, n_fft]
  std::vector<float> sin_t;   // [n_bins, n_fft]
  std::vector<float> fb;      // [n_mels, n_bins]
};

// Slaney mel scale (linear below 1 kHz, log above) — matches
// train/data.py::_hz_to_mel/_mel_to_hz.
double hz_to_mel(double f) {
  const double f_sp = 200.0 / 3.0, min_log_hz = 1000.0;
  const double logstep = std::log(6.4) / 27.0;
  if (f < min_log_hz) return f / f_sp;
  return min_log_hz / f_sp + std::log(std::max(f, 1e-10) / min_log_hz) / logstep;
}

double mel_to_hz(double m) {
  const double f_sp = 200.0 / 3.0, min_log_hz = 1000.0;
  const double min_log_mel = min_log_hz / f_sp;
  const double logstep = std::log(6.4) / 27.0;
  if (m < min_log_mel) return m * f_sp;
  return min_log_hz * std::exp(logstep * (m - min_log_mel));
}

void build_filterbank(FeatCtx* c) {
  c->fb.assign((size_t)c->n_mels * c->n_bins, 0.0f);
  std::vector<double> hz(c->n_mels + 2);
  double mlo = hz_to_mel(c->fmin), mhi = hz_to_mel(c->fmax);
  for (int i = 0; i < c->n_mels + 2; i++)
    hz[i] = mel_to_hz(mlo + (mhi - mlo) * i / (c->n_mels + 1));
  for (int i = 0; i < c->n_mels; i++) {
    double lo = hz[i], ctr = hz[i + 1], hi = hz[i + 2];
    double norm = 2.0 / (hi - lo);  // Slaney: constant energy per channel
    for (int k = 0; k < c->n_bins; k++) {
      double f = 0.5 * c->sr * k / (c->n_bins - 1);
      double up = (f - lo) / std::max(ctr - lo, 1e-10);
      double down = (hi - f) / std::max(hi - ctr, 1e-10);
      double v = std::min(up, down);
      c->fb[(size_t)i * c->n_bins + k] =
          (float)(v > 0.0 ? v * norm : 0.0);
    }
  }
}

}  // namespace

extern "C" {

void* feat_create(int n_fft, int hop, int win, double sr, int n_mels,
                  double fmin, double fmax) {
  auto* c = new FeatCtx();
  c->n_fft = n_fft; c->hop = hop; c->win = win; c->n_mels = n_mels;
  c->sr = sr; c->fmin = fmin; c->fmax = fmax;
  c->n_bins = n_fft / 2 + 1;
  // periodic hann of length `win` (np.hanning(win+1)[:-1]), zero-padded
  // symmetrically to n_fft — matches train/data.py::stft_magnitude
  c->window.assign(n_fft, 0.0f);
  int off = (n_fft - win) / 2;
  for (int i = 0; i < win; i++)
    c->window[off + i] =
        (float)(0.5 - 0.5 * std::cos(2.0 * M_PI * i / win));
  c->cos_t.resize((size_t)c->n_bins * n_fft);
  c->sin_t.resize((size_t)c->n_bins * n_fft);
  for (int k = 0; k < c->n_bins; k++)
    for (int n = 0; n < n_fft; n++) {
      double ph = 2.0 * M_PI * k * n / n_fft;
      c->cos_t[(size_t)k * n_fft + n] = (float)std::cos(ph);
      c->sin_t[(size_t)k * n_fft + n] = (float)std::sin(ph);
    }
  build_filterbank(c);
  return c;
}

void feat_destroy(void* ctx) { delete (FeatCtx*)ctx; }

int feat_n_bins(void* ctx) { return ((FeatCtx*)ctx)->n_bins; }

// copy the [n_mels, n_bins] filterbank out (for cross-checking)
void feat_filterbank(void* ctx, float* out) {
  auto* c = (FeatCtx*)ctx;
  for (size_t i = 0; i < c->fb.size(); i++) out[i] = c->fb[i];
}

int feat_n_frames(void* ctx, int n_samples) {
  auto* c = (FeatCtx*)ctx;
  int padded = n_samples + 2 * (c->n_fft / 2);
  return 1 + (padded - c->n_fft) / c->hop;
}

// audio [n] in [-1, 1] -> log-mel [frames, n_mels] (row-major).
void feat_mel_spectrogram(void* ctx, const float* audio, int n, float* out) {
  auto* c = (FeatCtx*)ctx;
  int pad = c->n_fft / 2;
  // centered reflect padding (numpy "reflect": no edge duplication, with
  // multiple reflections when the pad exceeds the signal — index folding
  // over the period 2(n-1))
  auto reflect = [n](long i) -> int {
    if (n == 1) return 0;
    long period = 2L * (n - 1);
    i = std::labs(i) % period;
    return (int)(i < n ? i : period - i);
  };
  std::vector<float> x(n + 2 * pad);
  for (int i = 0; i < n + 2 * pad; i++) x[i] = audio[reflect((long)i - pad)];
  int frames = feat_n_frames(ctx, n);
  std::vector<float> wf(c->n_fft);
  std::vector<float> mag(c->n_bins);
  for (int f = 0; f < frames; f++) {
    const float* fr = x.data() + (size_t)f * c->hop;
    for (int i = 0; i < c->n_fft; i++) wf[i] = fr[i] * c->window[i];
    for (int k = 0; k < c->n_bins; k++) {
      const float* ct = c->cos_t.data() + (size_t)k * c->n_fft;
      const float* st = c->sin_t.data() + (size_t)k * c->n_fft;
      double re = 0.0, im = 0.0;
      for (int i = 0; i < c->n_fft; i++) {
        re += (double)wf[i] * ct[i];
        im -= (double)wf[i] * st[i];
      }
      mag[k] = (float)std::sqrt(re * re + im * im);
    }
    float* orow = out + (size_t)f * c->n_mels;
    for (int m = 0; m < c->n_mels; m++) {
      const float* fbr = c->fb.data() + (size_t)m * c->n_bins;
      double acc = 0.0;
      for (int k = 0; k < c->n_bins; k++) acc += (double)mag[k] * fbr[k];
      orow[m] = (float)std::log(std::max(acc, 1e-5));
    }
  }
}

// mu-law codec — matches nv_wavenet_tpu/utils/mu_law.py
void feat_mu_law_encode(const float* x, int n, int mu_quantization, int* out) {
  double mu = mu_quantization - 1.0, lmu = std::log1p(mu);
  for (int i = 0; i < n; i++) {
    double v = x[i];
    double s = (v > 0) - (v < 0);
    double x_mu = s * std::log1p(mu * std::fabs(v)) / lmu;
    out[i] = (int)((x_mu + 1.0) / 2.0 * mu + 0.5);
  }
}

void feat_mu_law_decode(const int* y, int n, int mu_quantization, float* out) {
  double mu = mu_quantization - 1.0;
  for (int i = 0; i < n; i++) {
    double sig = 2.0 * (y[i] / mu) - 1.0;
    double s = (sig > 0) - (sig < 0);
    double mag = (std::pow(1.0 + mu, std::fabs(sig)) - 1.0) / mu;
    out[i] = (float)(s * mag);
  }
}

}  // extern "C"
