"""Mu-law companding codec (numpy and jax variants).

Functional parity with the reference codec (`/root/reference/pytorch/utils.py:62-90`):
encode maps audio in [-1, 1] to integer bins [0, mu), decode maps bins back to
[-1, 1].  The jax variants are jittable and used inside the data pipeline.
"""

from __future__ import annotations

import numpy as np

MAX_WAV_VALUE = 32768.0


def mu_law_encode_np(x: np.ndarray, mu_quantization: int = 256) -> np.ndarray:
    assert np.max(x) <= 1.0 and np.min(x) >= -1.0
    mu = mu_quantization - 1.0
    x_mu = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    return ((x_mu + 1) / 2 * mu + 0.5).astype(np.int64)


def mu_law_decode_np(x: np.ndarray, mu_quantization: int = 256) -> np.ndarray:
    assert np.max(x) < mu_quantization and np.min(x) >= 0
    mu = mu_quantization - 1.0
    signal = 2 * (x / mu) - 1
    magnitude = (1.0 / mu) * ((1 + mu) ** np.abs(signal) - 1)
    return np.sign(signal) * magnitude


def mu_law_encode(x, mu_quantization: int = 256):
    """Jittable mu-law encode; x in [-1, 1] -> int32 bins in [0, mu)."""
    import jax.numpy as jnp

    mu = mu_quantization - 1.0
    x_mu = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    return ((x_mu + 1) / 2 * mu + 0.5).astype(jnp.int32)


def mu_law_decode(x, mu_quantization: int = 256):
    """Jittable mu-law decode; int bins -> float in [-1, 1]."""
    import jax.numpy as jnp

    mu = mu_quantization - 1.0
    signal = 2 * (x.astype(jnp.float32) / mu) - 1
    magnitude = (1.0 / mu) * ((1 + mu) ** jnp.abs(signal) - 1)
    return jnp.sign(signal) * magnitude
