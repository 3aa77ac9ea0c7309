import numpy as np

from nv_wavenet_tpu.utils.mu_law import (
    mu_law_decode, mu_law_decode_np, mu_law_encode, mu_law_encode_np)


def test_roundtrip_np():
    x = np.linspace(-1, 1, 4001).astype(np.float32)
    enc = mu_law_encode_np(x)
    assert enc.min() >= 0 and enc.max() <= 255
    dec = mu_law_decode_np(enc)
    # mu-law quantization error bound for 256 bins
    assert np.max(np.abs(dec - x)) < 0.04


def test_silence_is_bin_128():
    # mu-law encodes 0.0 into bin 128 — the silence value the generator
    # initializes with (reference: nv_wavenet_reference.cpp:237-240)
    assert mu_law_encode_np(np.zeros(4)).tolist() == [128, 128, 128, 128]


def test_jax_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, size=1024).astype(np.float32)
    enc_np = mu_law_encode_np(x)
    enc_j = np.asarray(mu_law_encode(x))
    assert np.array_equal(enc_np, enc_j)
    dec_np = mu_law_decode_np(enc_np)
    dec_j = np.asarray(mu_law_decode(enc_j))
    np.testing.assert_allclose(dec_np, dec_j, rtol=1e-5, atol=1e-6)


def test_monotonic():
    x = np.linspace(-1, 1, 513).astype(np.float32)
    enc = mu_law_encode_np(x)
    assert np.all(np.diff(enc) >= 0)
