#!/usr/bin/env python
"""Generate the mel-featurization golden fixture (mel_reference.npz).

The reference delegates STFT/mel extraction to the Tacotron2 submodule
(`/root/reference/pytorch/mel2samp_onehot.py:41-42,56-59`), whose numerics
are: librosa's Slaney-scale mel filterbank (`librosa.filters.mel` with
htk=False, norm='slaney'), a reflect-center-padded periodic-Hann magnitude
STFT, and log dynamic-range compression `log(clamp(mel, 1e-5))`.  A
reference-trained checkpoint consumed through `engine/torch_import.py` is
only in-distribution if this repo's self-contained featurization
(`nv_wavenet_tpu/train/data.py`) reproduces those numerics.

This generator is an INDEPENDENT float64 reimplementation written directly
against the librosa algorithm (the vectorized ramps/fdiff formulation of
`librosa/filters.py::mel` and `librosa/core/convert.py::hz_to_mel/mel_to_hz`,
Slaney variant) and the Tacotron2 STFT conventions — deliberately a
different code path from train/data.py (scalar mel conversions, outer-
difference ramps, float64 end to end), so agreement is evidence rather than
tautology.  librosa itself is not installable in this environment (zero
egress); the algorithm is fully specified by its published source and the
Slaney Auditory-Toolbox scale it implements.

Run from the repo root to (re)generate tests/fixtures/mel_reference.npz;
tests/test_data.py asserts train/data.py matches these committed values.
"""
import os

import numpy as np

SR = 16000
N_FFT = 800
HOP = 200
WIN = 800
N_MELS = 80
FMIN = 0.0
FMAX = 8000.0


def hz_to_mel_slaney(f):
    """Scalar Slaney mel (librosa hz_to_mel, htk=False)."""
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if f >= min_log_hz:
        mel = min_log_mel + np.log(f / min_log_hz) / logstep
    return mel


def mel_to_hz_slaney(m):
    f_min, f_sp = 0.0, 200.0 / 3
    f = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if m >= min_log_mel:
        f = min_log_hz * np.exp(logstep * (m - min_log_mel))
    return f


def librosa_mel_filterbank():
    """`librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)` — the ramps/
    fdiff formulation from librosa/filters.py, float64."""
    fftfreqs = np.linspace(0, SR / 2.0, 1 + N_FFT // 2)        # [n_freqs]
    mel_lo = hz_to_mel_slaney(FMIN)
    mel_hi = hz_to_mel_slaney(FMAX)
    mels = np.linspace(mel_lo, mel_hi, N_MELS + 2)
    mel_f = np.array([mel_to_hz_slaney(m) for m in mels])      # [n_mels+2]
    fdiff = np.diff(mel_f)
    ramps = np.subtract.outer(mel_f, fftfreqs)                 # [n_mels+2, n_freqs]
    weights = np.zeros((N_MELS, len(fftfreqs)))
    for i in range(N_MELS):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    # norm='slaney': area normalization 2 / (hz width of the triangle)
    enorm = 2.0 / (mel_f[2:N_MELS + 2] - mel_f[:N_MELS])
    weights *= enorm[:, np.newaxis]
    return weights


def tacotron_mel_frames(audio, fb):
    """TacotronSTFT.mel_spectrogram numerics on audio in [-1, 1]:
    reflect-center pad, periodic Hann, magnitude rFFT, mel dot,
    log(clamp(x, 1e-5)) — float64."""
    pad = N_FFT // 2
    x = np.pad(audio.astype(np.float64), (pad, pad), mode="reflect")
    # periodic Hann == scipy.signal.get_window('hann', WIN, fftbins=True)
    n = np.arange(WIN, dtype=np.float64)
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / WIN)
    n_frames = 1 + (len(x) - N_FFT) // HOP
    mags = np.empty((n_frames, 1 + N_FFT // 2))
    for t in range(n_frames):
        frame = x[t * HOP:t * HOP + N_FFT] * window
        mags[t] = np.abs(np.fft.rfft(frame))
    mel = mags @ fb.T
    return np.log(np.clip(mel, 1e-5, None))


def known_signal():
    """Deterministic broad-band test signal: three tones + a chirp +
    seeded noise, 4096 samples, peak-normalized like loaded wav data."""
    t = np.arange(4096, dtype=np.float64) / SR
    sig = (0.5 * np.sin(2 * np.pi * 440.0 * t)
           + 0.25 * np.sin(2 * np.pi * 1760.0 * t + 0.3)
           + 0.1 * np.sin(2 * np.pi * 6000.0 * t + 1.1)
           + 0.2 * np.sin(2 * np.pi * (200.0 + 800.0 * t) * t))
    sig += 0.02 * np.random.RandomState(1234).randn(len(t))
    return (sig / np.max(np.abs(sig)) * 0.95).astype(np.float32)


def main():
    fb = librosa_mel_filterbank()
    audio = known_signal()
    mel = tacotron_mel_frames(audio, fb)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mel_reference.npz")
    np.savez_compressed(
        out,
        sr=SR, n_fft=N_FFT, hop=HOP, win=WIN, n_mels=N_MELS,
        fmin=FMIN, fmax=FMAX,
        filterbank=fb,                      # float64 [80, 401]
        audio=audio,                        # float32 [4096]
        log_mel=mel,                        # float64 [frames, 80]
    )
    print(f"wrote {out}: fb sum {fb.sum():.12f}, "
          f"mel range [{mel.min():.4f}, {mel.max():.4f}], "
          f"{mel.shape[0]} frames")


if __name__ == "__main__":
    main()
