"""Hermetic REAL-WAV end-to-end test: wav files on disk -> mel2samp CLI ->
epoch-driven training from `training_files` -> checkpoint -> inference CLI ->
generated wavs.

Exercises the file-dataset path none of the other tests touch
(`load_wav`/`write_wav`, `tools/mel2samp.py`, `train.cli` with
training_files + epochs, `tools/inference.py` from precomputed mels) —
the reference's actual user workflow (`/root/reference/pytorch/README.md`,
`train.py:109-136`, `mel2samp_onehot.py:97-136`, `inference.py:64-88`).
"""

import json
import os

import numpy as np

from nv_wavenet_tpu.train.data import (DataConfig, load_wav, synthetic_clips,
                                       write_wav)

DATA_C = dict(segment_length=256, mu_quantization=256, filter_length=64,
              hop_length=16, win_length=64, sampling_rate=16000,
              n_mel_channels=16, mel_fmin=0.0, mel_fmax=4000.0)
WAVENET_C = dict(n_in_channels=256, n_layers=2, max_dilation=2,
                 n_residual_channels=16, n_skip_channels=32,
                 n_out_channels=256, n_cond_channels=16,
                 upsamp_window=32, upsamp_stride=16)


def test_wav_to_training_to_vocoding(tmp_path):
    # 1. real wav files on disk (int16 PCM via scipy), round-tripped
    clips = synthetic_clips(n_clips=5, length=1024)
    wav_dir = tmp_path / "wavs"
    os.makedirs(wav_dir)
    paths = []
    for i, c in enumerate(clips):
        p = str(wav_dir / f"clip_{i}.wav")
        write_wav(p, c, sr=16000)
        paths.append(p)
    back, sr = load_wav(paths[0])
    assert sr == 16000 and back.shape == (1024,)
    assert np.max(np.abs(back - np.clip(clips[0], -1, 1) * 0.999)) < 2e-3

    flist = tmp_path / "files.txt"
    flist.write_text("\n".join(paths) + "\n")

    cfg = {
        "train_config": {"output_directory": str(tmp_path / "ckpt"),
                         "epochs": 2, "learning_rate": 1e-3,
                         "iters_per_checkpoint": 4, "batch_size": 2,
                         "seed": 7, "checkpoint_path": ""},
        "data_config": dict(DATA_C, training_files=str(flist)),
        "dist_config": {"data_parallel": 1, "model_parallel": 1},
        "wavenet_config": WAVENET_C,
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    # 2. mel2samp CLI: wavs -> .npy mel features
    from nv_wavenet_tpu.tools import mel2samp
    mel_dir = tmp_path / "mels"
    mel2samp.main(["-f", str(flist), "-o", str(mel_dir), "-c", str(cfg_path)])
    mels = sorted(os.listdir(mel_dir))
    assert len(mels) == 5
    m0 = np.load(mel_dir / mels[0])
    assert m0.shape == (1024 // 16 + 1, 16)   # centered stft frames x n_mel

    # 3. epoch-driven training from training_files (the reference schedule)
    from nv_wavenet_tpu.train import cli
    state, losses = cli.main(["-c", str(cfg_path)])
    # 5 clips / batch 2 = 2 steps/epoch x 2 epochs = 4 iterations
    assert len(losses) == 4 and np.isfinite(losses[-1])
    assert os.path.isdir(tmp_path / "ckpt" / "it_4")

    # 4. inference CLI: checkpoint + precomputed mels -> wav files
    from nv_wavenet_tpu.tools import inference
    mlist = tmp_path / "mels.txt"
    mlist.write_text("\n".join(str(mel_dir / m) for m in mels[:2]) + "\n")
    out_dir = tmp_path / "out"
    inference.main(["-f", str(mlist), "-c", str(tmp_path / "ckpt"),
                    "-o", str(out_dir), "-b", "2", "--config", str(cfg_path)])
    wavs = sorted(os.listdir(out_dir))
    assert wavs == ["audio_0.wav", "audio_1.wav"]
    gen, sr = load_wav(str(out_dir / wavs[0]))
    assert sr == 16000 and len(gen) > 900 and np.all(np.abs(gen) <= 1.0)
