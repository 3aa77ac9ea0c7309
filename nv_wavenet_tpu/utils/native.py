"""ctypes bindings + on-demand build for the native C++ golden oracle
(csrc/wavenet_golden.cpp).

The reference ships its CPU oracle as C++ compiled by the test Makefile
(`/root/reference/Makefile:46-50`); here the shared library is built lazily
with g++ (cached in build/) and bound via ctypes — no pybind11 dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

from nv_wavenet_tpu.config import WaveNetConfig

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "csrc", "wavenet_golden.cpp")
_LIB = os.path.join(_REPO, "build", "libwavenet_golden.so")

_lib: Optional[ctypes.CDLL] = None


def _build_lib(src: str, lib: str, opt: str) -> str:
    """Build `src` -> `lib`, keyed on a CONTENT hash of the source AND every
    sibling header it includes (not mtimes: on a fresh clone a stale
    committed binary and the source share checkout time, so an mtime check
    would silently load the wrong build).

    -ffp-contract=off is REQUIRED for the exact-match contract: GCC may
    otherwise contract mul+add chains into FMAs, changing the rounding of
    the canonical transcendentals (csrc/exact_math.h) relative to the
    numpy/XLA/Mosaic implementations."""
    import hashlib

    os.makedirs(os.path.dirname(lib), exist_ok=True)
    h = hashlib.sha256(open(src, "rb").read())
    src_dir = os.path.dirname(src)
    for header in sorted(f for f in os.listdir(src_dir) if f.endswith(".h")):
        h.update(open(os.path.join(src_dir, header), "rb").read())
    digest = h.hexdigest()
    stamp = lib + ".sha256"
    up_to_date = (os.path.exists(lib) and os.path.exists(stamp)
                  and open(stamp).read().strip() == digest)
    if not up_to_date:
        subprocess.run(
            ["g++", opt, "-ffp-contract=off", "-shared", "-fPIC",
             "-std=c++17", src, "-o", lib],
            check=True, capture_output=True)
        with open(stamp, "w") as f:
            f.write(digest)
    return lib


def _build() -> str:
    return _build_lib(_SRC, _LIB, "-O2")


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.wn_create.restype = ctypes.c_void_p
        lib.wn_create.argtypes = [ctypes.c_int] * 6
        lib.wn_destroy.argtypes = [ctypes.c_void_p]
        lib.wn_set_weights.argtypes = [ctypes.c_void_p] + [f32p] * 9
        lib.wn_reset.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.wn_run.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                               f32p, f32p, ctypes.c_int, i32p]
        lib.wn_ring_size.restype = ctypes.c_int
        lib.wn_ring_size.argtypes = [ctypes.c_void_p]
        for fn in ("wn_exact_exp", "wn_exact_tanh", "wn_exact_sigmoid"):
            getattr(lib, fn).argtypes = [f32p, f32p, ctypes.c_int]
        _lib = lib
    return _lib


def exact_fn_native(name: str, x: np.ndarray) -> np.ndarray:
    """Apply the C++ canonical transcendental ('exp'|'tanh'|'sigmoid')
    elementwise — the oracle side of tests/test_exact_math.py's
    cross-implementation bit-identity checks."""
    lib = load()
    x = np.ascontiguousarray(x, np.float32).ravel()
    y = np.zeros_like(x)
    getattr(lib, f"wn_exact_{name}")(_fp(x), _fp(y), len(x))
    return y


def available() -> bool:
    try:
        load()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeGolden:
    """C++ oracle with the canonical-params interface; API mirrors
    models/golden.WaveNetGolden.run for cross-checking."""

    def __init__(self, cfg: WaveNetConfig):
        self.cfg = cfg
        self._lib = load()
        self._ctx = self._lib.wn_create(cfg.num_layers, cfg.R, cfg.S, cfg.A,
                                        cfg.max_dilation,
                                        1 if cfg.tanh_embed else 0)
        assert self._lib.wn_ring_size(self._ctx) == cfg.ring_size

    def __del__(self):
        if getattr(self, "_ctx", None):
            self._lib.wn_destroy(self._ctx)
            self._ctx = None

    def set_canonical_params(self, params: Dict):
        p = {k: np.ascontiguousarray(np.asarray(v, np.float32))
             for k, v in params.items()}
        self._p_keepalive = p  # keep buffers alive across the C call
        self._lib.wn_set_weights(
            self._ctx, _fp(p["embed"]), _fp(p["dil_w"]), _fp(p["dil_b"]),
            _fp(p["rs_w"]), _fp(p["rs_b"]), _fp(p["out_w"]), _fp(p["out_b"]),
            _fp(p["end_w"]), _fp(p["end_b"]))

    def run(self, cond: np.ndarray, selectors: np.ndarray,
            mode: str = "sample", reset: bool = True) -> np.ndarray:
        T, L, B, C = cond.shape
        assert L == self.cfg.num_layers and C == 2 * self.cfg.R
        cond = np.ascontiguousarray(cond, np.float32)
        sel = np.ascontiguousarray(selectors, np.float32)
        y = np.zeros((B, T), np.int32)
        if reset:
            self._lib.wn_reset(self._ctx, B, self.cfg.silence_bin)
        self._lib.wn_run(self._ctx, T, B, _fp(cond), _fp(sel),
                         1 if mode == "argmax" else 0,
                         y.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return y


# ---------------------------------------------------------------------------
# Native featurization pipeline (csrc/featurize.cpp): STFT + Slaney mel +
# mu-law, the C++ twin of train/data.py (which replaces the reference's
# Tacotron2-submodule torch STFT, `mel2samp_onehot.py:41-42`).
# ---------------------------------------------------------------------------

_FEAT_SRC = os.path.join(_REPO, "csrc", "featurize.cpp")
_FEAT_LIB = os.path.join(_REPO, "build", "libfeaturize.so")

_feat_lib: Optional[ctypes.CDLL] = None


def _build_feat() -> str:
    return _build_lib(_FEAT_SRC, _FEAT_LIB, "-O3")


def load_feat() -> ctypes.CDLL:
    global _feat_lib
    if _feat_lib is None:
        lib = ctypes.CDLL(_build_feat())
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.feat_create.restype = ctypes.c_void_p
        lib.feat_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_double, ctypes.c_int,
                                    ctypes.c_double, ctypes.c_double]
        lib.feat_destroy.argtypes = [ctypes.c_void_p]
        lib.feat_n_bins.restype = ctypes.c_int
        lib.feat_n_bins.argtypes = [ctypes.c_void_p]
        lib.feat_n_frames.restype = ctypes.c_int
        lib.feat_n_frames.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.feat_filterbank.argtypes = [ctypes.c_void_p, f32p]
        lib.feat_mel_spectrogram.argtypes = [ctypes.c_void_p, f32p,
                                             ctypes.c_int, f32p]
        lib.feat_mu_law_encode.argtypes = [f32p, ctypes.c_int, ctypes.c_int, i32p]
        lib.feat_mu_law_decode.argtypes = [i32p, ctypes.c_int, ctypes.c_int, f32p]
        _feat_lib = lib
    return _feat_lib


def feat_available() -> bool:
    try:
        load_feat()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


class NativeFeaturizer:
    """Native mel-spectrogram + mu-law featurizer; numerically cross-checked
    against train/data.py in tests/test_native_featurize.py."""

    def __init__(self, data_cfg):
        self._lib = load_feat()
        self.cfg = data_cfg
        self._ctx = self._lib.feat_create(
            data_cfg.filter_length, data_cfg.hop_length, data_cfg.win_length,
            float(data_cfg.sampling_rate), data_cfg.n_mel_channels,
            float(data_cfg.mel_fmin), float(data_cfg.mel_fmax))

    def __del__(self):
        if getattr(self, "_ctx", None):
            self._lib.feat_destroy(self._ctx)
            self._ctx = None

    def filterbank(self) -> np.ndarray:
        n_bins = self._lib.feat_n_bins(self._ctx)
        out = np.zeros((self.cfg.n_mel_channels, n_bins), np.float32)
        self._lib.feat_filterbank(self._ctx, _fp(out))
        return out

    def mel_spectrogram(self, audio: np.ndarray) -> np.ndarray:
        audio = np.ascontiguousarray(audio, np.float32)
        frames = self._lib.feat_n_frames(self._ctx, len(audio))
        out = np.zeros((frames, self.cfg.n_mel_channels), np.float32)
        self._lib.feat_mel_spectrogram(self._ctx, _fp(audio), len(audio),
                                       _fp(out))
        return out

    def mu_law_encode(self, audio: np.ndarray, mu: int = 256) -> np.ndarray:
        audio = np.ascontiguousarray(audio, np.float32)
        out = np.zeros(len(audio), np.int32)
        self._lib.feat_mu_law_encode(
            _fp(audio), len(audio), mu,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return out

    def mu_law_decode(self, y: np.ndarray, mu: int = 256) -> np.ndarray:
        y = np.ascontiguousarray(y, np.int32)
        out = np.zeros(len(y), np.float32)
        self._lib.feat_mu_law_decode(
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(y), mu,
            _fp(out))
        return out
