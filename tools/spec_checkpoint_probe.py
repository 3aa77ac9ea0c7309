#!/usr/bin/env python
"""Speculative exact decode on a TRAINED checkpoint — the serving-regime
honesty probe (BASELINE.md "trained-checkpoint honesty row").

Cold random weights draft near-perfectly (committed runs = the window), so
perf.py's speculative rates are the tier's best case.  This probe loads an
orbax checkpoint produced by the train CLI, generates from its own mel
conditioning, and reports rate + avg committed run + bit-match vs the
exact kernel at several windows — on trained (peaked) distributions the
draft's flip rate is real and `spec_rounds` shows whether the tier pays
off (fall back to run() when committed runs collapse; docs/SERVING.md).

Run on TPU:  python tools/spec_checkpoint_probe.py [-c checkpoints] [-i N]
(Uses the synthetic-clip conditioning of the shipped config, so it works
right after `python -m nv_wavenet_tpu.train.cli -c configs/config.json`.)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--checkpoint_dir", default="checkpoints")
    ap.add_argument("-i", "--iteration", type=int, default=None)
    ap.add_argument("--config", default="configs/config.json")
    ap.add_argument("-n", "--samples", type=int, default=16384)
    ap.add_argument("--windows", default="64,128,256")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nv_wavenet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from nv_wavenet_tpu.engine.wavenet_infer import WaveNetInfer
    from nv_wavenet_tpu.models import wavenet as wavenet_lib
    from nv_wavenet_tpu.train import trainer
    from nv_wavenet_tpu.train.data import (data_config_from_json,
                                           mel_spectrogram, synthetic_clips)

    cfgj = json.load(open(args.config))
    model = trainer.create_model(cfgj["wavenet_config"])
    data_cfg = data_config_from_json(cfgj["data_config"])
    T_target = args.samples
    audio = synthetic_clips(n_clips=1,
                            length=max(T_target + 4096, 4 * 16000)
                            )[0][:T_target + 2048]
    mel0 = jnp.asarray(mel_spectrogram(audio, data_cfg)[None])
    state = trainer.create_train_state(model, trainer.TrainConfig(),
                                       np.asarray(mel0),
                                       np.zeros((1, 64), np.int32))
    state, it = trainer.load_checkpoint(args.checkpoint_dir, args.iteration,
                                        state)
    print(f"restored iteration {it}", flush=True)
    canon = wavenet_lib.export_canonical(state.params, model)
    cfg = wavenet_lib.config_of(model)
    # conditioning stays DEVICE-resident (get_cond_input runs on the TPU):
    # a host round-trip of [T, L, B, 2R] is 100+ MB over the tunnel
    cond_full = model.apply(state.params, mel0,
                            method=wavenet_lib.WaveNetTrain.get_cond_input)
    T = min(T_target, cond_full.shape[0])
    cond = jax.lax.slice_in_dim(cond_full, 0, T, axis=0)
    B = cond.shape[2]
    sel = jax.random.uniform(jax.random.PRNGKey(3), (T, B), jnp.float32)
    print(f"T={T} B={B} cfg={cfg.num_layers}L {cfg.R}R/{cfg.S}S/{cfg.A}A "
          f"maxD={cfg.max_dilation}", flush=True)

    eng = WaveNetInfer(num_layers=cfg.num_layers,
                       max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                       A=cfg.A, max_batch=B, tanh_embed=cfg.tanh_embed,
                       chunk_size=256)
    eng.set_canonical_params(canon)
    eng.set_inputs(cond, sel)

    np.asarray(eng.run_device(T, B)[-1])                 # compile + warm
    t0 = time.time()
    tails = [eng.run_device(T, B)[-1] for _ in range(3)]
    for tl in tails:
        np.asarray(tl)
    khz_exact = 3 * T / (time.time() - t0) / 1e3
    y_exact = np.asarray(eng.run_device(T, B)).T
    print(f"exact: {khz_exact:.1f} kHz/utt", flush=True)

    for W in (int(w) for w in args.windows.split(",")):
        eng.set_inputs(cond, sel)
        y, rounds = eng._run_speculative_device(T, B, W)
        np.asarray(y[-1])
        r0 = int(rounds)
        t0 = time.time()
        outs = [eng._run_speculative_device(T, B, W) for _ in range(3)]
        for yy, _ in outs:
            np.asarray(yy[-1])
        khz = 3 * T / (time.time() - t0) / 1e3
        # with the round-5 bit-identical transcendental library the
        # bit-match must hold at EVERY window and horizon — any flip is a
        # regression now, not the (closed) cross-lowering limit
        bitmatch = bool(np.array_equal(np.asarray(outs[-1][0]).T, y_exact))
        print(f"speculative W={W}: {khz:.1f} kHz/utt, {r0} rounds, "
              f"avg committed run {T / max(r0, 1):.1f}, "
              f"bit-match={bitmatch}", flush=True)

    # ADAPTIVE tier (VERDICT r4 #2 done-criterion): on trained weights the
    # self-governing tier must match the exact kernel within ~5% (probe
    # cost) by falling back — and stay bit-exact
    eng.set_inputs(cond, sel)
    y, rounds = eng._run_speculative_device(T, B, 256, True)
    np.asarray(y[-1])
    branch = eng.spec_branch
    t0 = time.time()
    outs = [eng._run_speculative_device(T, B, 256, True) for _ in range(3)]
    for yy, _ in outs:
        np.asarray(yy[-1])
    khz_ad = 3 * T / (time.time() - t0) / 1e3
    bitmatch = bool(np.array_equal(np.asarray(outs[-1][0]).T, y_exact))
    print(f"ADAPTIVE W=256: {khz_ad:.1f} kHz/utt "
          f"({khz_ad / khz_exact * 100:.1f}% of exact), branch="
          f"{ {0: 'window', 1: 'window/2', 2: 'exact-fallback', -1: 'short'}.get(branch, branch)}, "
          f"bit-match={bitmatch}", flush=True)


if __name__ == "__main__":
    main()
