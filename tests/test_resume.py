"""Checkpoint-resume continuity: training N iters straight must equal
training k iters, checkpointing, and resuming for N-k more (deterministic
data stream) — the reference's resume semantics (`train.py:62-71,127`)."""

import numpy as np

from nv_wavenet_tpu.train import trainer
from nv_wavenet_tpu.train.data import Mel2Samp, synthetic_clips

from tests.test_train import TINY, TINY_DATA


def batches(seed=0):
    ds = Mel2Samp(synthetic_clips(n_clips=2, length=1024), TINY_DATA, seed=seed)
    return ds.batches(2)


def test_resume_continues_training(tmp_path):
    model = trainer.create_model({
        "n_layers": TINY["n_layers"], "max_dilation": TINY["max_dilation"],
        "n_residual_channels": TINY["n_residual_channels"],
        "n_skip_channels": TINY["n_skip_channels"],
        "n_out_channels": TINY["n_out_channels"],
        "n_cond_channels": TINY["n_cond_channels"],
        "upsamp_window": TINY["upsamp_window"],
        "upsamp_stride": TINY["upsamp_stride"]})
    cfg = trainer.TrainConfig(learning_rate=1e-3, iters_per_checkpoint=4)

    # straight run: 8 iters
    _, losses_full = trainer.train(model, cfg, batches(), 8, log_every=1000,
                                   ckpt_dir=str(tmp_path))
    # resumed run: restore it_4, continue to 8 with the same data stream
    b = batches()
    for _ in range(4):       # skip the batches consumed before the checkpoint
        next(b)
    _, losses_resumed = trainer.train(model, cfg, b, 8, log_every=1000,
                                      resume_dir=str(tmp_path),
                                      resume_iteration=4)
    np.testing.assert_allclose(losses_full[4:], losses_resumed, rtol=1e-5)
