#!/usr/bin/env python
"""Evaluate a trained checkpoint end-to-end on the TPU: teacher-forced
likelihood (bits/sample) of reference audio, autoregressive generation from
its mel conditioning, and a spectral sanity check of the generated audio —
the quantitative replacement for the reference's listen-and-compare check
(`/root/reference/pytorch/README.md:19`).

  python tools/eval_checkpoint.py -c ckpt_demo -i 3000 [-o out.wav]
  python tools/eval_checkpoint.py -c ckpt_demo -i 3000 -w input.wav

With no -w, evaluates on the synthetic training clips (the train CLI's
hermetic default), so train->eval works without any wav assets.
"""
import argparse
import json
import os

import numpy as np


def dominant_hz(x: np.ndarray, sr: int) -> float:
    sp = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    lo = max(1, int(20 * len(x) / sr))  # ignore <20 Hz
    return float((np.argmax(sp[lo:]) + lo) * sr / len(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--checkpoint_dir", required=True)
    ap.add_argument("-i", "--iteration", type=int, default=None)
    ap.add_argument("-w", "--wav", help="reference wav (default: synthetic)")
    ap.add_argument("-o", "--output", default="/tmp/eval_gen.wav")
    ap.add_argument("--config", default="configs/config.json")
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--fused", action="store_true",
                    help="generate through the collapsed-chain fast decode "
                         "(quality check of the fused tier on a real "
                         "vocoder; scoring stays on the exact path)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nv_wavenet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from nv_wavenet_tpu.engine.wavenet_infer import WaveNetInfer
    from nv_wavenet_tpu.models import wavenet as wavenet_lib
    from nv_wavenet_tpu.ops import scoring
    from nv_wavenet_tpu.train import trainer
    from nv_wavenet_tpu.train.data import (load_wav,
                                           mel_spectrogram, synthetic_clips,
                                           write_wav)
    from nv_wavenet_tpu.utils.mu_law import mu_law_decode_np, mu_law_encode_np

    cfgj = json.load(open(args.config))
    model = trainer.create_model(cfgj["wavenet_config"])
    dc = cfgj["data_config"]
    from nv_wavenet_tpu.train.data import data_config_from_json
    data_cfg = data_config_from_json(dc)
    sr = data_cfg.sampling_rate
    n = int(args.seconds * sr)
    if args.wav:
        audio, wav_sr = load_wav(args.wav)
        assert wav_sr == sr, f"wav is {wav_sr} Hz, config {sr} Hz"
        audio = audio[:n]
    else:
        audio = synthetic_clips(n_clips=1, length=max(n, 4 * 16000))[0][:n]
    mel = mel_spectrogram(audio, data_cfg)

    mel0 = jnp.asarray(mel[None])
    state = trainer.create_train_state(model, trainer.TrainConfig(),
                                       np.asarray(mel0),
                                       np.zeros((1, 64), np.int32))
    state, it = trainer.load_checkpoint(args.checkpoint_dir, args.iteration,
                                        state)
    params = state.params
    print(f"restored iteration {it}")

    canon = wavenet_lib.export_canonical(params, model)
    cfg = wavenet_lib.config_of(model)
    cond = np.asarray(model.apply(
        params, mel0, method=wavenet_lib.WaveNetTrain.get_cond_input))
    T, B = cond.shape[0], cond.shape[2]

    # teacher-forced likelihood of the TRUE audio (uniform/untrained = 8.0)
    y_true = mu_law_encode_np(np.clip(audio[:T], -1, 1), cfg.A)[None]
    _, bits = scoring.score_teacher_forced_parallel(
        {k: jnp.asarray(v) for k, v in canon.items()}, cfg,
        jnp.asarray(cond), jnp.asarray(y_true, jnp.int32))
    print(f"teacher-forced bits/sample: {float(np.mean(bits)):.3f} "
          f"(uniform = 8.0)")

    eng = WaveNetInfer(num_layers=cfg.num_layers,
                       max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                       A=cfg.A, max_batch=B, tanh_embed=cfg.tanh_embed,
                       chunk_size=256, fuse_chain=args.fused)
    eng.set_canonical_params(canon)
    eng.set_inputs(cond, selectors=None, seed=0)
    y = eng.run(T, B)
    gen = mu_law_decode_np(y[0], cfg.A)
    write_wav(args.output, gen, sr)
    src_hz, gen_hz = dominant_hz(audio[:T], sr), dominant_hz(gen, sr)
    print(f"dominant frequency: source {src_hz:.1f} Hz, "
          f"generated {gen_hz:.1f} Hz")
    print(f"rms: source {np.sqrt(np.mean(audio[:T]**2)):.3f}, "
          f"generated {np.sqrt(np.mean(gen**2)):.3f}")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
