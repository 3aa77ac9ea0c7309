#!/usr/bin/env python
"""Precompute mel features from wavs for inference — parity with the
reference's `mel2samp_onehot.py` CLI mode (`/root/reference/pytorch/
mel2samp_onehot.py:97-136`), emitting .npy instead of torch .pt.

  python tools/mel2samp.py -f wav_list.txt -o out_dir -c configs/config.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-f", "--files", required=True)
    ap.add_argument("-o", "--output_dir", required=True)
    ap.add_argument("-c", "--config", default="configs/config.json")
    args = ap.parse_args()

    from nv_wavenet_tpu.train.data import DataConfig, load_wav, mel_spectrogram

    with open(args.config) as f:
        d = json.load(f)["data_config"]
    cfg = DataConfig(filter_length=d.get("filter_length", 800),
                     hop_length=d.get("hop_length", 200),
                     win_length=d.get("win_length", 800),
                     sampling_rate=d.get("sampling_rate", 16000),
                     n_mel_channels=d.get("n_mel_channels", 80),
                     mel_fmin=d.get("mel_fmin", 0.0),
                     mel_fmax=d.get("mel_fmax", 8000.0))

    os.makedirs(args.output_dir, exist_ok=True)
    with open(args.files) as f:
        paths = [ln.strip() for ln in f if ln.strip()]
    for p in paths:
        audio, sr = load_wav(p)
        assert sr == cfg.sampling_rate, f"{p}: sr {sr} != {cfg.sampling_rate}"
        mel = mel_spectrogram(audio, cfg)
        out = os.path.join(args.output_dir,
                           os.path.splitext(os.path.basename(p))[0] + ".npy")
        np.save(out, mel)
        print(f"{p} -> {out} {mel.shape}")


if __name__ == "__main__":
    main()
