"""Parameter pytree layout and weight-format adapters.

The reference stores weights as column-major Matrix objects with "math" shapes
(rows = output channels), e.g. Wprev/Wcur are (2R, R), Wskip is (S, R)
(`/root/reference/nv_wavenet_reference.cpp:147-170`).  The TPU-native canonical
layout is chosen for the compute path instead of for a C ABI:

  * activations are [batch, channels] with channels on the TPU lane dimension,
  * weight matrices are [in, out] so every op is `x @ W`,
  * per-layer weights are stacked on a leading layer axis,
  * the two taps of each dilated conv are fused on the input axis so the
    dilated conv is ONE matmul: concat(x_{t-d}, x_t) @ W_dil,
  * residual and skip projections are fused on the output axis so they are ONE
    matmul: h @ W_rs -> [R residual | S skip]
    (replaces the reference's separate res/skip GEMM stages,
    `nv_wavenet.cuh:185-207` and `nv_wavenet_singleblock.cuh:40-64`).

Canonical pytree (all float arrays):
  embed      [2A, R]    rows [0,A) = prev-symbol table, [A,2A) = cur-symbol
  dil_w      [L, 2R, 2R]  in-axis = [x_{t-d} (R) | x_t (R)], out = [tanh R | sigmoid R]
  dil_b      [L, 2R]
  rs_w       [L, R, R+S]  out-axis = [residual R | skip S]
  rs_b       [L, R+S]
  out_w      [S, A]; out_b [A]     (reference Wzs/Bzs)
  end_w      [A, A]; end_b [A]     (reference Wza/Bza)
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from nv_wavenet_tpu.config import WaveNetConfig


def random_reference_weights(cfg: WaveNetConfig, seed: int = 0,
                             scale: float | None = None) -> Dict:
    """Random weights in the *reference* math shapes (rows = out channels),
    mirroring what `nv_wavenet_test.cu:47-48` feeds both implementations
    (Matrix::randomize with mean 0, scale 0.5/R)."""
    rng = np.random.RandomState(seed)
    if scale is None:
        scale = 0.5 / cfg.R
    L, R, S, A = cfg.num_layers, cfg.R, cfg.S, cfg.A

    def rand(*shape):
        return (rng.uniform(-1.0, 1.0, size=shape) * scale).astype(np.float32)

    return {
        "embed_prev": rand(R, A),   # column y = embedding of symbol y
        "embed_cur": rand(R, A),
        "Wprev": [rand(2 * R, R) for _ in range(L)],
        "Wcur": [rand(2 * R, R) for _ in range(L)],
        "Bh": [rand(2 * R) for _ in range(L)],
        "Wres": [rand(R, R) for _ in range(L)],
        "Bres": [rand(R) for _ in range(L)],
        "Wskip": [rand(S, R) for _ in range(L)],
        "Bskip": [rand(S) for _ in range(L)],
        "Wzs": rand(A, S),
        "Bzs": rand(A),
        "Wza": rand(A, A),
        "Bza": rand(A),
    }


def to_canonical(ref: Dict, cfg: WaveNetConfig, dtype=np.float32) -> Dict:
    """Reference math shapes -> canonical stacked [in, out] pytree."""
    L, R, S, A = cfg.num_layers, cfg.R, cfg.S, cfg.A

    embed = np.concatenate(
        [np.asarray(ref["embed_prev"]).T, np.asarray(ref["embed_cur"]).T], axis=0
    )  # [2A, R]

    dil_w = np.stack(
        [
            np.concatenate(
                [np.asarray(ref["Wprev"][l]).T, np.asarray(ref["Wcur"][l]).T], axis=0
            )
            for l in range(L)
        ]
    )  # [L, 2R, 2R]
    dil_b = np.stack([np.asarray(ref["Bh"][l]) for l in range(L)])  # [L, 2R]

    rs_w = np.stack(
        [
            np.concatenate(
                [np.asarray(ref["Wres"][l]).T, np.asarray(ref["Wskip"][l]).T], axis=1
            )
            for l in range(L)
        ]
    )  # [L, R, R+S]
    rs_b = np.stack(
        [
            np.concatenate([np.asarray(ref["Bres"][l]), np.asarray(ref["Bskip"][l])])
            for l in range(L)
        ]
    )  # [L, R+S]

    params = {
        "embed": embed,
        "dil_w": dil_w,
        "dil_b": dil_b,
        "rs_w": rs_w,
        "rs_b": rs_b,
        "out_w": np.asarray(ref["Wzs"]).T,
        "out_b": np.asarray(ref["Bzs"]),
        "end_w": np.asarray(ref["Wza"]).T,
        "end_b": np.asarray(ref["Bza"]),
    }
    return {k: np.asarray(v, dtype=dtype) for k, v in params.items()}


def validate_canonical(params: Dict, cfg: WaveNetConfig) -> None:
    L, R, S, A = cfg.num_layers, cfg.R, cfg.S, cfg.A
    expected = {
        "embed": (2 * A, R),
        "dil_w": (L, 2 * R, 2 * R),
        "dil_b": (L, 2 * R),
        "rs_w": (L, R, R + S),
        "rs_b": (L, R + S),
        "out_w": (S, A),
        "out_b": (A,),
        "end_w": (A, A),
        "end_b": (A,),
    }
    for k, shape in expected.items():
        got = tuple(params[k].shape)
        if got != shape:
            raise ValueError(f"param {k}: expected shape {shape}, got {got}")


def from_canonical(params: Dict, cfg: WaveNetConfig) -> Dict:
    """Canonical stacked [in, out] pytree -> reference math shapes (the
    exact inverse of `to_canonical`; transposes are lossless)."""
    L, R = cfg.num_layers, cfg.R
    p = {k: np.asarray(v, np.float32) for k, v in params.items()}
    A = cfg.A
    return {
        "embed_prev": p["embed"][:A].T,
        "embed_cur": p["embed"][A:].T,
        "Wprev": [p["dil_w"][l][:R].T for l in range(L)],
        "Wcur": [p["dil_w"][l][R:].T for l in range(L)],
        "Bh": [p["dil_b"][l] for l in range(L)],
        "Wres": [p["rs_w"][l][:, :R].T for l in range(L)],
        "Bres": [p["rs_b"][l][:R] for l in range(L)],
        "Wskip": [p["rs_w"][l][:, R:].T for l in range(L)],
        "Bskip": [p["rs_b"][l][R:] for l in range(L)],
        "Wzs": p["out_w"].T,
        "Bzs": p["out_b"],
        "Wza": p["end_w"].T,
        "Bza": p["end_b"],
    }
