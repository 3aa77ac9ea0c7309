"""Cross-check the native C++ featurization pipeline (csrc/featurize.cpp)
against the numpy reference implementation (train/data.py) — the same
two-independent-implementations contract the golden models follow."""
import numpy as np
import pytest

from nv_wavenet_tpu.train import data as data_lib
from nv_wavenet_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.feat_available(),
                                reason="no native toolchain")

CFG = data_lib.DataConfig(segment_length=4000, filter_length=800,
                          hop_length=200, win_length=800, n_mel_channels=80)


def _featurizer():
    return native.NativeFeaturizer(CFG)


def test_filterbank_matches_numpy():
    fb_np = data_lib.mel_filterbank(CFG)
    fb_c = _featurizer().filterbank()
    assert fb_c.shape == fb_np.shape
    np.testing.assert_allclose(fb_c, fb_np, rtol=1e-5, atol=1e-7)


def test_mel_spectrogram_matches_numpy():
    audio = data_lib.synthetic_clips(n_clips=1, length=4000)[0]
    mel_np = data_lib.mel_spectrogram(audio, CFG)
    mel_c = _featurizer().mel_spectrogram(audio)
    assert mel_c.shape == mel_np.shape
    # magnitudes go through different DFT algorithms (matrix DFT vs FFT);
    # log-mel agreement at 1e-3 absolute is bit-noise level for fp32 inputs
    np.testing.assert_allclose(mel_c, mel_np, rtol=1e-4, atol=1e-3)


def test_mel_nonpow2_window_shorter_than_fft():
    cfg = data_lib.DataConfig(filter_length=512, hop_length=128,
                              win_length=400, n_mel_channels=40,
                              mel_fmax=7000.0)
    audio = data_lib.synthetic_clips(n_clips=1, length=2000, seed=3)[0]
    mel_np = data_lib.mel_spectrogram(audio, cfg)
    mel_c = native.NativeFeaturizer(cfg).mel_spectrogram(audio)
    np.testing.assert_allclose(mel_c, mel_np, rtol=1e-4, atol=1e-3)


def test_mu_law_codec_exact_match():
    from nv_wavenet_tpu.utils.mu_law import mu_law_decode_np, mu_law_encode_np
    rng = np.random.RandomState(0)
    audio = np.clip(rng.uniform(-1, 1, 5000), -1, 1).astype(np.float32)
    f = _featurizer()
    enc_c = f.mu_law_encode(audio)
    enc_np = mu_law_encode_np(audio)
    assert (enc_c == enc_np).all()
    dec_c = f.mu_law_decode(enc_c)
    dec_np = mu_law_decode_np(enc_np)
    np.testing.assert_allclose(dec_c, dec_np, rtol=1e-6, atol=1e-7)


def test_mel_short_clip_multi_reflection():
    """Clips shorter than n_fft/2 need multiple reflections in the centered
    padding (numpy 'reflect' semantics); the native pipeline must not read
    out of bounds and must match numpy."""
    cfg = data_lib.DataConfig(filter_length=800, hop_length=200,
                              win_length=800, n_mel_channels=80)
    for n in (3, 50, 399, 401):
        audio = data_lib.synthetic_clips(n_clips=1, length=2048,
                                         seed=9)[0][:n]
        mel_np = data_lib.mel_spectrogram(audio, cfg)
        mel_c = native.NativeFeaturizer(cfg).mel_spectrogram(audio)
        assert mel_c.shape == mel_np.shape
        np.testing.assert_allclose(mel_c, mel_np, rtol=1e-4, atol=1e-3)
