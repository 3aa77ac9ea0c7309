"""NVWaveNet — drop-in user API parity with the reference's Python wrapper
(`/root/reference/pytorch/nv_wavenet.py:55-196`).

Construct from an `export_weights()`-format dict and call
`infer(cond_input, implementation)` with the reference's channels-first
conditioning layout (2R x batch x layers x samples).  Internally this adapts
to the `WaveNetInfer` engine (time-major layout, canonical params).

Differences from the reference wrapper, by design:
  * R/S/A are inferred from the weights instead of validated against
    compile-time constants (`nv_wavenet.py:68-96` asserts against the
    compiled extension; nothing is compiled in ahead here),
  * the engine is cached per (batch, sample_count) instead of re-created and
    re-uploaded per call (`wavenet_infer.cu:105-145`).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer

__all__ = ["NVWaveNet", "Impl", "column_major", "interleave_lists"]


def column_major(x: np.ndarray) -> np.ndarray:
    """Kept for API parity (`nv_wavenet.py:33-49`): the reference flips
    tensors to column-major for its C ABI.  Arrays here carry shape/stride
    metadata, so this is the identity on 1-D and a transpose view otherwise —
    provided only so reference-derived scripts keep working."""
    x = np.asarray(x)
    if x.ndim <= 1:
        return x
    if x.ndim == 3:
        assert x.shape[2] == 1
        x = x[:, :, 0]
    if x.ndim == 2:
        return np.ascontiguousarray(x.T)
    if x.ndim == 4:
        return np.ascontiguousarray(np.transpose(x, (3, 2, 1, 0)))
    raise ValueError(f"unsupported rank {x.ndim}")


def interleave_lists(*lists) -> List:
    """Parity helper (`nv_wavenet.py:30-31`)."""
    return [x for t in zip(*lists) for x in t]


class NVWaveNet:
    def __init__(self, embedding_prev, embedding_curr, conv_out_weight,
                 conv_end_weight, dilate_weights, dilate_biases, max_dilation,
                 res_weights, res_biases, skip_weights, skip_biases,
                 use_embed_tanh, **engine_kwargs):
        """Arguments exactly as produced by `WaveNetTrain.export_weights()`
        (and the reference's `WaveNet.export_weights`,
        `pytorch/wavenet.py:147-188`):

        embedding_prev/curr: [A, R]; conv_out_weight: [A, S];
        conv_end_weight: [A, A]; dilate_weights: list of [2R, R, 2] (tap 0 =
        previous sample); res_weights: list of L-1 [R, R] (a zero layer is
        appended, `nv_wavenet.py:139-141`); skip_weights: list of [S, R].
        """
        def _w(x):
            # reference Conv1d weights carry a trailing kernel dim of 1
            # ([out, in, 1]); the reference wrapper squeezes it in
            # column_major (`nv_wavenet.py:38-41`) — accept both forms
            x = np.asarray(x, np.float32)
            if x.ndim == 3 and x.shape[-1] == 1:
                x = x[:, :, 0]
            return x

        embedding_prev = _w(embedding_prev)
        embedding_curr = _w(embedding_curr)
        conv_out_weight = _w(conv_out_weight)
        conv_end_weight = _w(conv_end_weight)
        res_weights = [_w(w) for w in res_weights]
        skip_weights = [_w(w) for w in skip_weights]
        A, R = embedding_curr.shape
        S = conv_out_weight.shape[1]
        assert conv_out_weight.shape[0] == A, (
            f"conv_out_weight {conv_out_weight.shape} != (A={A}, S)")
        assert conv_end_weight.shape == (A, A)
        L = len(dilate_weights)
        assert len(res_weights) in (L, L - 1)
        assert len(skip_weights) == L

        self.R, self.S, self.A = R, S, A
        self.num_layers = L
        self.max_dilation = max_dilation
        self.use_embed_tanh = bool(use_embed_tanh)
        self._engine_kwargs = engine_kwargs
        self._engines: Dict = {}
        self._infer_calls = 0  # advances the default selector seed per call

        # reference-format weight staging (engine setters take math shapes)
        self._layers = []
        for i in range(L):
            w = np.asarray(dilate_weights[i], np.float32)
            assert w.shape == (2 * R, R, 2), (
                f"dilate weight {w.shape}, expected (2R, R, 2)")
            Wprev, Wcur = w[:, :, 0], w[:, :, 1]
            if i < len(res_weights):
                Wres = np.asarray(res_weights[i], np.float32)
                Bres = np.asarray(res_biases[i], np.float32)
            else:
                Wres = np.zeros((R, R), np.float32)
                Bres = np.zeros((R,), np.float32)
            self._layers.append(dict(
                Wprev=Wprev, Wcur=Wcur,
                Bh=np.asarray(dilate_biases[i], np.float32),
                Wres=Wres, Bres=Bres,
                Wskip=np.asarray(skip_weights[i], np.float32),
                Bskip=np.asarray(skip_biases[i], np.float32)))
        self._embeddings = (embedding_prev.T, embedding_curr.T)  # [R, A]
        # out-layer biases are zero (`pytorch/wavenet_infer.cu:75-82`)
        self._out = (conv_out_weight, np.zeros((A,), np.float32),
                     conv_end_weight, np.zeros((A,), np.float32))

    def _engine(self, batch: int) -> WaveNetInfer:
        if batch not in self._engines:
            eng = WaveNetInfer(num_layers=self.num_layers,
                               max_dilation=self.max_dilation,
                               R=self.R, S=self.S, A=self.A, max_batch=batch,
                               tanh_embed=self.use_embed_tanh,
                               **self._engine_kwargs)
            eng.set_embeddings(*self._embeddings)
            for i, lw in enumerate(self._layers):
                eng.set_layer_weights(i, **lw)
            eng.set_out_weights(*self._out)
            self._engines[batch] = eng
        return self._engines[batch]

    def infer(self, cond_input: np.ndarray,
              implementation: Impl = Impl.AUTO,
              selectors: Optional[np.ndarray] = None,
              mode: str = "sample",
              seed: Optional[int] = None) -> np.ndarray:
        """cond_input: channels x batch x layers x samples (2R, B, L, T) —
        the reference layout (`nv_wavenet.py:172-181`).  Returns int samples
        [batch, sample_count].

        When selectors is None, each call draws a FRESH selector stream
        (advancing an internal counter, like the reference's per-call host
        rand(); pass `seed` for reproducibility)."""
        C, B, L, T = cond_input.shape
        assert (C, L) == (2 * self.R, self.num_layers), (
            f"cond_input is channels x batch x layers x samples; channels & "
            f"layers should be {(2 * self.R, self.num_layers)}, got {(C, L)}")
        eng = self._engine(B)
        eng.implementation = implementation
        cond = np.ascontiguousarray(np.transpose(cond_input, (3, 2, 1, 0)))
        if seed is None:
            seed = self._infer_calls
            self._infer_calls += 1
        eng.set_inputs(cond.astype(np.float32), selectors, seed=seed)
        return eng.run(T, B, mode=mode)
