"""Hermetic end-to-end pipeline test (BASELINE config-5 shape, CPU-sized):
synthetic audio -> mel features -> teacher-forced training -> weight export
-> autoregressive engine vocoding -> wav samples.  The TPU analog of `make
integration_test` (`/root/reference/Makefile:68-70`), plus a quality check
the reference lacks: training must reduce the model's bits/sample on its own
training data, and the vocoded output must be valid audio."""

import numpy as np

import jax
import jax.numpy as jnp

from nv_wavenet_tpu.engine.nv_wavenet import Impl, NVWaveNet
from nv_wavenet_tpu.models import wavenet as wavenet_lib
from nv_wavenet_tpu.ops import scoring
from nv_wavenet_tpu.train import trainer
from nv_wavenet_tpu.train.data import DataConfig, Mel2Samp, synthetic_clips
from nv_wavenet_tpu.utils.mu_law import mu_law_decode_np


def test_train_export_vocode_pipeline(tmp_path):
    model = trainer.create_model({
        "n_layers": 4, "max_dilation": 4, "n_residual_channels": 32,
        "n_skip_channels": 64, "n_out_channels": 256, "n_cond_channels": 16,
        "upsamp_window": 32, "upsamp_stride": 16})
    data_cfg = DataConfig(segment_length=512, filter_length=64, hop_length=16,
                          win_length=64, n_mel_channels=16, mel_fmax=4000.0)
    ds = Mel2Samp(synthetic_clips(n_clips=2, length=2048), data_cfg, seed=0)

    tcfg = trainer.TrainConfig(learning_rate=3e-3, batch_size=2,
                               iters_per_checkpoint=10 ** 9)
    state, losses = trainer.train(model, tcfg, ds.batches(2), num_iters=30,
                                  log_every=1000)
    assert losses[-1] < losses[0]

    # bits/sample on training data must have dropped below uniform (8 bits)
    mel, audio = next(ds.batches(2))
    cfg = wavenet_lib.config_of(model)
    canon = {k: jnp.asarray(v)
             for k, v in wavenet_lib.export_canonical(state.params, model).items()}
    cond_bt = model.apply(state.params, jnp.asarray(mel), audio.shape[1],
                          method=wavenet_lib.WaveNetTrain._cond_acts)
    cond = jnp.transpose(cond_bt, (1, 2, 0, 3))        # [T, L, B, 2R]
    _, bits = scoring.score_teacher_forced(canon, cfg, cond,
                                           jnp.asarray(audio))
    assert np.all(np.asarray(bits) < 7.5), f"bits/sample {bits}"

    # vocode through the drop-in wrapper (reference user path)
    exported = wavenet_lib.export_weights(state.params, model)
    net = NVWaveNet(**exported, interpret=False, chunk_size=32)
    T = 64
    cond_ref = np.transpose(np.asarray(cond[:T]), (3, 2, 1, 0))  # [2R,B,L,T]
    y = net.infer(cond_ref, Impl.MANYBLOCK)
    assert y.shape == (2, T)
    wav = mu_law_decode_np(y[0])
    assert wav.shape == (T,) and np.all(np.abs(wav) <= 1.0)
