"""Config-driven training CLI — `python -m nv_wavenet_tpu.train.cli -c
configs/config.json`, the parity entry point for the reference's
`python train.py -c config.json` (`/root/reference/pytorch/train.py:158-193`).

The four config sections keep the reference's names (`pytorch/config.json`):
train_config, data_config, dist_config, wavenet_config.  dist_config selects
mesh axes (data_parallel x model_parallel x seq_parallel) instead of NCCL
URLs, and — the launcher analog of the reference's per-rank spawn
(`pytorch/distributed.py:145-171`) — brings up multi-HOST training from
config alone: when it carries `coordinator_address` (+ `num_processes`),
the CLI calls `jax.distributed.initialize` before any device use.  The
per-rank `process_id` comes from dist_config, the `--process_id` flag, or
standard TPU-pod env autodetection, so one config file serves every host.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-n", "--num_iters", type=int, default=None,
                    help="override train_config.num_iters")
    ap.add_argument("--process_id", type=int, default=None,
                    help="this host's rank for multi-host bring-up "
                         "(overrides dist_config.process_id; unneeded on "
                         "TPU pods, where it autodetects)")
    args = ap.parse_args(argv)

    with open(args.config) as f:
        cfg = json.load(f)
    train_c = cfg["train_config"]
    data_c = cfg["data_config"]
    dist_c = cfg.get("dist_config", {})
    wavenet_c = cfg["wavenet_config"]

    # dev/test hook: force the JAX platform programmatically (this must be
    # a config.update — some environments' sitecustomize overrides the
    # JAX_PLATFORMS env var; see tests/conftest.py)
    if os.environ.get("NVW_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["NVW_PLATFORM"])

    if dist_c.get("coordinator_address"):
        from nv_wavenet_tpu.parallel.mesh import initialize_multihost
        pid = args.process_id
        if pid is None:
            pid = dist_c.get("process_id")
        initialize_multihost(
            coordinator_address=dist_c["coordinator_address"],
            num_processes=dist_c.get("num_processes"),
            process_id=pid)

    from nv_wavenet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from nv_wavenet_tpu.train import trainer
    from nv_wavenet_tpu.train.data import (Mel2Samp, data_config_from_json,
                                           load_wav, synthetic_clips)
    from nv_wavenet_tpu.utils.mu_law import MAX_WAV_VALUE  # noqa: F401

    data_cfg = data_config_from_json(data_c)
    if data_c.get("synthetic") or not data_c.get("training_files"):
        clips = synthetic_clips(n_clips=4, length=4 * data_cfg.segment_length)
    else:
        with open(data_c["training_files"]) as f:
            paths = [ln.strip() for ln in f if ln.strip()]
        clips = [load_wav(p)[0] for p in paths]

    ds = Mel2Samp(clips, data_cfg, seed=train_c.get("seed", 1234))
    model = trainer.create_model(wavenet_c)
    tcfg = trainer.TrainConfig(
        learning_rate=train_c.get("learning_rate", 1e-3),
        batch_size=train_c.get("batch_size", 4),
        seed=train_c.get("seed", 1234),
        iters_per_checkpoint=train_c.get("iters_per_checkpoint", 1000),
        with_tensorboard=train_c.get("with_tensorboard", False),
    )
    # resume parity (`train.py:102-107`): checkpoint_path = dir, plus the
    # iteration to restore
    resume_dir = train_c.get("checkpoint_path") or None
    resume_it = train_c.get("checkpoint_iteration", 0)

    # schedule: `num_iters` (iteration-driven, infinite random sampler) takes
    # precedence; otherwise `epochs` drives dataset-pass semantics exactly
    # like the reference (`train.py:129-136`): per-epoch reshuffle, the clip
    # list sharded across processes, drop_last batching, epoch-offset resume
    import jax
    num_iters = args.num_iters or train_c.get("num_iters")
    if num_iters is not None:
        if train_c.get("epochs"):
            print("note: num_iters set; epochs ignored "
                  "(iteration-driven schedule)", flush=True)
        batches = ds.batches(tcfg.batch_size, rank=jax.process_index(),
                             world_size=jax.process_count())
    else:
        epochs = train_c.get("epochs", 1)
        rank, world = jax.process_index(), jax.process_count()
        spe = ds.steps_per_epoch(tcfg.batch_size, world)
        assert spe > 0, (
            f"dataset too small: {len(ds.clips)} clips < "
            f"batch_size {tcfg.batch_size} x {world} process(es)")
        num_iters = epochs * spe
        start_epoch = (resume_it // spe) if resume_dir else 0
        batches = ds.epoch_batches(tcfg.batch_size, epochs, rank=rank,
                                   world_size=world, start_epoch=start_epoch)
        print(f"epoch schedule: {epochs} epochs x {spe} steps "
              f"(world={world})", flush=True)

    mesh = None
    dp = dist_c.get("data_parallel", 1)
    mp = dist_c.get("model_parallel", 1)
    sp = dist_c.get("seq_parallel", 1)
    if dp * mp * sp > 1:
        mesh = trainer.make_mesh(dp, mp, sp)

    out_dir = train_c.get("output_directory") or None
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        out_dir = os.path.abspath(out_dir)
    import time
    t0 = time.time()
    state, losses = trainer.train(model, tcfg, batches,
                                  num_iters=num_iters, mesh=mesh,
                                  ckpt_dir=out_dir,
                                  log_every=train_c.get("log_every", 1),
                                  resume_dir=resume_dir,
                                  resume_iteration=resume_it)
    dt = time.time() - t0
    ran = len(losses)  # may be < num_iters when resuming mid-schedule
    if ran:
        sps = ran * tcfg.batch_size * data_cfg.segment_length / dt
        print(f"final loss: {losses[-1]:.6f}  "
              f"({ran} iters in {dt:.1f}s incl. compile, "
              f"{ran / dt:.2f} it/s, {sps / 1e6:.2f} M audio samples/s)")
    else:
        print(f"nothing to do: resumed at iteration >= num_iters="
              f"{num_iters}")
    return state, losses


if __name__ == "__main__":
    main()
