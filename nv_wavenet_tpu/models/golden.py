"""Pure-numpy golden model: the CPU-runnable oracle every other implementation
is tested against.

This mirrors the reference's pure-C++ golden model
(`/root/reference/nv_wavenet_reference.cpp`) — same network, same API shape
(setters / run / activation getters), same externally-injected sampling
randomness — re-expressed in numpy with [batch, channels] activations.  It is
deliberately the *naive* implementation: eager, per-sample python loop, full
activation history (no ring buffer), so it is obviously correct and completely
independent of the JAX/Pallas compute paths it validates.

Network per sample t (reference math: `nv_wavenet_reference.cpp:283-302`):
  x0      = [tanh](embed_prev[y_{t-2}] + embed_cur[y_{t-1}])
  layer l: z  = (x_{t-d_l} @ Wprev_l + x_t @ Wcur_l) + (Bh_l + cond[t, l])
           h  = tanh(z[:R]) * sigmoid(z[R:])
           x' = (h @ Wres_l + Bres_l) + x
           sk = (sk + h @ Wskip_l) + Bskip_l     (ReLU after last layer only)
  Zs = relu(sk @ Wzs + Bzs);  Za = Zs @ Wza + Bza;  p = softmax(Za)
  y_t = first bin where selector < cumsum(p)  (fallback: silence_bin)

NOTE on float op order: the SPLIT dilated matmul — two K=R GEMMs summed as
`(z_prev + z_cur) + (Bh + cond)` — defines *this framework's* canonical
summation order (round 4; rounds 1-3 used one concat-GEMM, but the split is
~19% faster on hardware because the prev half leaves the kernel's dependent
chain — see ops/persistent.py prev_prefetch).  The C++ oracle, the XLA scan
generator and the Pallas kernel follow the identical order so integer
outputs can match the golden model exactly.  Relative to the reference C++
oracle this reorders float additions, which is within the reference's own
cross-implementation tolerance ladder (`nv_wavenet_test.cu:259-298`).

NOTE on transcendentals and sampling (round 5): tanh/sigmoid/exp use the
bit-identical polynomial library (ops/exact_math.py — the same fp32 bits on
numpy, C++, XLA and Mosaic), and sampling uses the canonical division-free
UNNORMALIZED-sum comparison (the reference's own semantics,
`softmax.cuh:150-189`): first bin with sel * sum(e) < fixed-tree-cumsum(e).
Together these make the exact-match contract structural at ANY horizon
(previously transcendental lowerings and TPU's non-correctly-rounded fp32
divide flipped ~1e-5/sample beyond ~16k draws).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.ops import exact_math as em

# canonical fixed-association prefix sum (see exact_math.fixed_tree_cumsum)
cumsum_fixed_tree = em.fixed_tree_cumsum_np


def select_sample(za: np.ndarray, sel: np.ndarray, fallback: int) -> np.ndarray:
    """Canonical inverse-CDF draw from LOGITS: first bin where
    sel * sum(e) < fixed-tree-cumsum(e), e = exp(za - max) — mirroring the
    reference's unnormalized-sum comparison (`softmax.cuh:150-189`) with its
    fallback value on scan failure (`softmax.cuh:155`).  Division-free (TPU
    fp32 divide is not correctly rounded; see ops/exact_math.py).

    za: [B, A] logits; sel: [B] uniforms in [0, 1)."""
    return em.sample_from_logits_np(za, np.asarray(sel, np.float32)[:, None],
                                    fallback)


class WaveNetGolden:
    """CPU oracle with API parity to `nvWavenetReference`
    (`nv_wavenet_reference.h:36-101`): set_embeddings / set_layer_weights /
    set_out_weights / set_inputs / run / get_* activation getters."""

    def __init__(self, cfg: WaveNetConfig, max_batch: int, max_samples: int):
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_samples = max_samples
        L, R, S, A = cfg.num_layers, cfg.R, cfg.S, cfg.A
        self._embed_prev = np.zeros((A, R), np.float32)  # row per symbol
        self._embed_cur = np.zeros((A, R), np.float32)
        self._Wdil = np.zeros((L, 2 * R, 2 * R), np.float32)  # [in, out]
        self._Bh = np.zeros((L, 2 * R), np.float32)
        self._Wres = np.zeros((L, R, R), np.float32)
        self._Bres = np.zeros((L, R), np.float32)
        self._Wskip = np.zeros((L, R, S), np.float32)
        self._Bskip = np.zeros((L, S), np.float32)
        self._Wzs = np.zeros((S, A), np.float32)
        self._Bzs = np.zeros((A,), np.float32)
        self._Wza = np.zeros((A, A), np.float32)
        self._Bza = np.zeros((A,), np.float32)
        self._cond: Optional[np.ndarray] = None       # [T, L, B, 2R]
        self._selectors: Optional[np.ndarray] = None  # [T, B]
        # observability state (last generated sample), as in the reference's
        # dumpActivations mode (`nv_wavenet.cuh:424-438`)
        self._xt_out = np.zeros((L, max_batch, R), np.float32)
        self._skip_out = np.zeros((L, max_batch, S), np.float32)
        self._zs = np.zeros((max_batch, A), np.float32)
        self._za = np.zeros((max_batch, A), np.float32)
        self._p = np.zeros((max_batch, A), np.float32)
        self._y_prev = np.full((max_batch,), cfg.silence_bin, np.int32)
        self._y_cur = np.full((max_batch,), cfg.silence_bin, np.int32)

    # -- weight upload (reference math shapes: rows = out channels) ----------

    def set_embeddings(self, embed_prev: np.ndarray, embed_cur: np.ndarray):
        """embed_prev/embed_cur: [R, A], one column per symbol (reference
        Matrix(R, A) layout, `nv_wavenet_reference.cpp:125-126`)."""
        self._embed_prev = np.asarray(embed_prev, np.float32).T.copy()
        self._embed_cur = np.asarray(embed_cur, np.float32).T.copy()

    def set_layer_weights(self, layer: int, Wprev, Wcur, Bh, Wres, Bres,
                          Wskip, Bskip):
        """Shapes: Wprev/Wcur [2R, R], Bh [2R], Wres [R, R], Bres [R],
        Wskip [S, R], Bskip [S] (reference `setLayerWeights`,
        `nv_wavenet_reference.cpp:218-227`)."""
        self._Wdil[layer] = np.concatenate(
            [np.asarray(Wprev, np.float32).T, np.asarray(Wcur, np.float32).T], axis=0)
        self._Bh[layer] = np.asarray(Bh, np.float32)
        self._Wres[layer] = np.asarray(Wres, np.float32).T
        self._Bres[layer] = np.asarray(Bres, np.float32)
        self._Wskip[layer] = np.asarray(Wskip, np.float32).T
        self._Bskip[layer] = np.asarray(Bskip, np.float32)

    def set_out_weights(self, Wzs, Bzs, Wza, Bza):
        """Wzs [A, S], Wza [A, A] (reference `setOutWeights`)."""
        self._Wzs = np.asarray(Wzs, np.float32).T.copy()
        self._Bzs = np.asarray(Bzs, np.float32)
        self._Wza = np.asarray(Wza, np.float32).T.copy()
        self._Bza = np.asarray(Bza, np.float32)

    def set_reference_weights(self, ref: Dict):
        """Convenience: upload a whole `params.random_reference_weights` dict."""
        self.set_embeddings(ref["embed_prev"], ref["embed_cur"])
        for l in range(self.cfg.num_layers):
            self.set_layer_weights(l, ref["Wprev"][l], ref["Wcur"][l], ref["Bh"][l],
                                   ref["Wres"][l], ref["Bres"][l],
                                   ref["Wskip"][l], ref["Bskip"][l])
        self.set_out_weights(ref["Wzs"], ref["Bzs"], ref["Wza"], ref["Bza"])

    def set_canonical_params(self, params: Dict):
        """Upload canonical-layout params (engine API parity: the engine's
        `set_canonical_params`); adapted through the lossless
        `params.from_canonical` inverse."""
        self.set_reference_weights(params_lib.from_canonical(params, self.cfg))

    # -- inputs ---------------------------------------------------------------

    def set_inputs(self, cond: np.ndarray, selectors: np.ndarray):
        """cond: [T, L, B, 2R] external conditioning; selectors: [T, B]
        uniforms in [0, 1) (injected randomness, as in
        `nv_wavenet_reference.cpp:236-247`).  Resets yPrev/yCur to silence."""
        T, L, B, C = cond.shape
        assert L == self.cfg.num_layers and C == 2 * self.cfg.R
        assert selectors.shape == (T, B)
        self._cond = np.asarray(cond, np.float32)
        self._selectors = np.asarray(selectors, np.float32)
        self._y_prev = np.full((B,), self.cfg.silence_bin, np.int32)
        self._y_cur = np.full((B,), self.cfg.silence_bin, np.int32)

    # -- generation -----------------------------------------------------------

    def run(self, num_samples: int, batch_size: int,
            init_sample: int = 0, mode: str = "sample",
            forced_y: "np.ndarray | None" = None) -> np.ndarray:
        """Generate samples [init_sample, init_sample + num_samples).

        Returns y: [batch, num_samples] int32.  `mode`: "sample" uses the
        injected selectors (exact-match contract); "argmax" takes the argmax
        of the logits (deterministic decode); "forced" consumes the
        ground-truth symbols `forced_y` [batch, num_samples] (teacher
        forcing — the oracle for the kernel's mode="forced"; the per-step
        probabilities are kept and readable via `get_p_seq`).  State
        (activation history and yPrev/yCur) persists across calls so chunked
        runs match one full run, mirroring `run_partial` with
        init_sample != 0 (`nv_wavenet.cuh:499-509`).
        """
        cfg = self.cfg
        L, R, S, A = cfg.num_layers, cfg.R, cfg.S, cfg.A
        B = batch_size
        assert self._cond is not None, "set_inputs must be called first"
        dils = cfg.dilations

        if init_sample == 0:
            # full activation history: x input of each layer at each time
            self._hist = np.zeros((self.max_samples, L + 1, B, R), np.float32)

        if mode == "forced":
            assert forced_y is not None and forced_y.shape == (B, num_samples)
            self._p_seq = np.zeros((num_samples, B, A), np.float32)
        y_out = np.zeros((B, num_samples), np.int32)
        for s in range(init_sample, init_sample + num_samples):
            x = self._embed_prev[self._y_prev] + self._embed_cur[self._y_cur]
            if cfg.tanh_embed:
                x = em.tanh_np(x)
            skip = np.zeros((B, S), np.float32)
            for l in range(L):
                self._hist[s, l] = x
                d = dils[l]
                x_prev = (self._hist[s - d, l] if s - d >= 0
                          else np.zeros((B, R), np.float32))
                # canonical split dilated GEMM: (z_prev + z_cur) + (Bh+cond)
                z = ((x_prev @ self._Wdil[l, :R] + x @ self._Wdil[l, R:])
                     + (self._Bh[l] + self._cond[s, l, :B]))
                h = em.tanh_np(z[:, :R]) * em.sigmoid_np(z[:, R:])
                x = (h @ self._Wres[l] + self._Bres[l]) + x
                skip = (skip + h @ self._Wskip[l]) + self._Bskip[l]
                self._xt_out[l, :B] = x
                self._skip_out[l, :B] = skip
            self._hist[s, L] = x
            skip = np.maximum(skip, 0.0)
            self._skip_out[L - 1, :B] = skip
            zs = np.maximum(skip @ self._Wzs + self._Bzs, 0.0)
            za = zs @ self._Wza + self._Bza
            e, cum = em.softmax_cumsum_np(za)
            p = em.softmax_p_np(e, cum)
            self._zs[:B], self._za[:B], self._p[:B] = zs, za, p
            if mode == "argmax":
                y = np.argmax(za, axis=-1).astype(np.int32)
            elif mode == "forced":
                self._p_seq[s - init_sample] = p
                y = forced_y[:, s - init_sample].astype(np.int32)
            else:
                y = em.select_from_cumsum_np(
                    cum, self._selectors[s, :B][:, None], A, cfg.silence_bin)
            self._y_prev = self._y_cur
            self._y_cur = y
            y_out[:, s - init_sample] = y
        return y_out

    # -- activation getters (dump mode parity, `nv_wavenet.cuh:424-438`) ------

    def get_p_seq(self) -> np.ndarray:
        """[T, B, A] per-step probabilities of the last mode='forced' run."""
        assert getattr(self, "_p_seq", None) is not None, (
            "run with mode='forced' first")
        return self._p_seq.copy()

    def get_xt_out(self, layer: int) -> np.ndarray:
        return self._xt_out[layer].copy()

    def get_skip_out(self, layer: int) -> np.ndarray:
        return self._skip_out[layer].copy()

    def get_zs(self) -> np.ndarray:
        return self._zs.copy()

    def get_za(self) -> np.ndarray:
        return self._za.copy()

    def get_p(self) -> np.ndarray:
        return self._p.copy()
