"""Data pipeline tests: STFT/mel featurization and segment sampling
(mel2samp parity, `/root/reference/pytorch/mel2samp_onehot.py`)."""

import numpy as np

from nv_wavenet_tpu.train.data import (DataConfig, Mel2Samp, mel_filterbank,
                                       mel_spectrogram, stft_magnitude,
                                       synthetic_clips)


CFG = DataConfig(segment_length=4000, filter_length=800, hop_length=200,
                 win_length=800, n_mel_channels=80)


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(CFG)
    assert fb.shape == (80, 401)
    # every mel channel has some support; channels are ordered in frequency
    assert np.all(fb.sum(axis=1) > 0)
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0)


def test_stft_localizes_tone():
    sr = 16000
    t = np.arange(8000) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    mag = stft_magnitude(tone, CFG)
    # 1 kHz bin at 800-point fft / 16 kHz = bin 50
    assert np.all(np.abs(mag.argmax(axis=1) - 50) <= 1)


def test_mel_spectrogram_tone_vs_silence():
    sr = 16000
    t = np.arange(8000) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    mel_tone = mel_spectrogram(tone, CFG)
    mel_silence = mel_spectrogram(np.zeros(8000, np.float32), CFG)
    assert mel_tone.shape[1] == 80
    assert mel_tone.max() > mel_silence.max() + 2.0  # log-domain separation


def test_mel2samp_segments():
    ds = Mel2Samp(synthetic_clips(n_clips=2, length=8000), CFG, seed=0)
    mel, target = ds.sample()
    assert target.shape == (4000,)
    assert target.min() >= 0 and target.max() < 256
    assert mel.shape[1] == 80
    # mel frames cover the segment (centered stft: T/hop + 1)
    assert mel.shape[0] == 4000 // 200 + 1
    mels, targets = next(ds.batches(3))
    assert mels.shape[0] == 3 and targets.shape == (3, 4000)


def test_short_clip_padded():
    ds = Mel2Samp([np.ones(100, np.float32) * 0.1], CFG, seed=0)
    mel, target = ds.sample()
    assert target.shape == (4000,)
    # padding region encodes silence (bin 128)
    assert np.all(target[200:] == 128)
