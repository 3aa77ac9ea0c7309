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


def _build() -> str:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True)
    return _LIB


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
        _lib = lib
    return _lib


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
