#!/usr/bin/env python
"""Precompute mel features from wavs for inference — parity with the
reference's `mel2samp_onehot.py` CLI mode (`/root/reference/pytorch/
mel2samp_onehot.py:97-136`), emitting .npy instead of torch .pt.

  python tools/mel2samp.py -f wav_list.txt -o out_dir -c configs/config.json
"""
import argparse
import json
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-f", "--files", required=True)
    ap.add_argument("-o", "--output_dir", required=True)
    ap.add_argument("-c", "--config", default="configs/config.json")
    args = ap.parse_args(argv)

    from nv_wavenet_tpu.train.data import (data_config_from_json, load_wav,
                                           mel_spectrogram)

    with open(args.config) as f:
        d = json.load(f)["data_config"]
    cfg = data_config_from_json(d)

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
