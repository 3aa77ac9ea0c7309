#!/usr/bin/env python
"""Batch inference CLI: checkpoint + mel features -> wav files.

Parity with the reference inference CLI (`/root/reference/pytorch/
inference.py:64-88`): load a trained checkpoint, export weights into the
engine, compute conditioning with the model's upsampling/cond layers, run the
autoregressive engine, mu-law decode, write 16 kHz wavs.

  python tools/inference.py -c <ckpt_dir> -i <iteration> -f mel_list.txt \
      -o out_dir [-b batch] [-m auto|persistent|manyblock] [-s sample|argmax]

mel_list.txt: one .npy mel file per line ([frames, n_mel]); use
tools/mel2samp.py to precompute mels from wavs.  With --demo, generates from
a freshly-initialized model on synthetic mels (no checkpoint needed).
"""
import argparse
import json
import os
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-f", "--files", help="text file listing mel .npy paths")
    ap.add_argument("-c", "--checkpoint_dir")
    ap.add_argument("-i", "--iteration", type=int, default=None)
    ap.add_argument("-o", "--output_dir", required=True)
    ap.add_argument("-b", "--batch_size", type=int, default=1)
    ap.add_argument("-m", "--mode", default="auto",
                    choices=["auto", "persistent", "manyblock", "fused",
                             "fast"])
    ap.add_argument("-s", "--sampling", default="sample",
                    choices=["sample", "argmax"])
    ap.add_argument("-t", "--temperature", type=float, default=1.0,
                    help="sampling temperature (softmax(za/T), applied as a "
                         "weight transform; 1.0 = exact)")
    ap.add_argument("--config", default="configs/config.json")
    ap.add_argument("--demo", action="store_true",
                    help="untrained model + synthetic mels (integration test)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from nv_wavenet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer
    from nv_wavenet_tpu.models import wavenet as wavenet_lib
    from nv_wavenet_tpu.train import trainer
    from nv_wavenet_tpu.train.data import (mel_spectrogram,
                                           synthetic_clips, write_wav)
    from nv_wavenet_tpu.utils.mu_law import mu_law_decode_np

    with open(args.config) as f:
        cfg_json = json.load(f)
    model = trainer.create_model(cfg_json["wavenet_config"])
    data_c = cfg_json["data_config"]

    from nv_wavenet_tpu.train.data import data_config_from_json
    data_cfg = data_config_from_json(data_c)
    if args.demo:
        clips = synthetic_clips(n_clips=args.batch_size, length=16000,
                                sr=data_cfg.sampling_rate)
        mels = [mel_spectrogram(c, data_cfg) for c in clips]
    else:
        assert args.files, "-f required unless --demo"
        with open(args.files) as f:
            paths = [ln.strip() for ln in f if ln.strip()]
        mels = [np.load(p) for p in paths]

    # init or restore params
    mel0 = jnp.asarray(mels[0][None])
    audio0 = jnp.zeros((1, 64), jnp.int32)
    if args.checkpoint_dir:
        tcfg = trainer.TrainConfig()
        state = trainer.create_train_state(model, tcfg, np.asarray(mel0),
                                           np.asarray(audio0))
        state, _ = trainer.load_checkpoint(args.checkpoint_dir,
                                           args.iteration, state)
        params = state.params
    else:
        params = model.init(jax.random.PRNGKey(0), mel0, audio0)

    canon = wavenet_lib.export_canonical(params, model)
    cfg = wavenet_lib.config_of(model)
    impl = {"auto": Impl.AUTO, "persistent": Impl.PERSISTENT,
            "manyblock": Impl.MANYBLOCK, "fused": Impl.PERSISTENT,
            "fast": Impl.PERSISTENT}[args.mode]

    os.makedirs(args.output_dir, exist_ok=True)
    sr = data_cfg.sampling_rate
    engines = {}  # one engine per batch size, reused across groups
    for lo in range(0, len(mels), args.batch_size):
        group = mels[lo:lo + args.batch_size]
        tmin = min(m.shape[0] for m in group)
        if any(m.shape[0] != tmin for m in group):
            print(f"WARNING: batch group {lo // args.batch_size} mixes mel "
                  f"lengths {[m.shape[0] for m in group]}; truncating all to "
                  f"{tmin} frames (sort mel_list by length to avoid this)",
                  flush=True)
        mel_b = jnp.asarray(np.stack([m[:tmin] for m in group]))
        cond = np.asarray(model.apply(params, mel_b,
                                      method=wavenet_lib.WaveNetTrain.get_cond_input))
        T, B = cond.shape[0], cond.shape[2]
        if B not in engines:
            eng = WaveNetInfer(num_layers=cfg.num_layers,
                               max_dilation=cfg.max_dilation, R=cfg.R,
                               S=cfg.S, A=cfg.A, max_batch=B,
                               implementation=impl,
                               tanh_embed=cfg.tanh_embed, chunk_size=256,
                               fuse_chain=args.mode == "fused",
                               priority=("latency" if args.mode == "fast"
                                         else None),
                               temperature=args.temperature)
            eng.set_canonical_params(canon)
            engines[B] = eng
        eng = engines[B]
        eng.set_inputs(cond, selectors=None, seed=lo)
        t0 = time.time()
        y = eng.run(T, B, mode=args.sampling)
        dt = time.time() - t0
        print(f"batch {lo // args.batch_size}: {T} samples x {B} utt in "
              f"{dt:.2f}s ({T / dt / 1e3:.1f} kHz/utt)", flush=True)
        for j in range(B):
            audio = mu_law_decode_np(y[j], cfg.A)
            path = os.path.join(args.output_dir, f"audio_{lo + j}.wav")
            write_wav(path, audio, sr)
            print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
