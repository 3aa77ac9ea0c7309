"""Training-stack tests: model shapes, loss descent, checkpoint round trip,
export parity, and the teacher-forced train-vs-inference EXACT equivalence —
a materially stronger contract than the reference's no-crash integration test
(`pytorch/integration_test.py:37-52`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import wavenet as wavenet_lib
from nv_wavenet_tpu.models.wavenet import WaveNetTrain
from nv_wavenet_tpu.ops import scan_generate
from nv_wavenet_tpu.train import trainer
from nv_wavenet_tpu.train.data import DataConfig, Mel2Samp, synthetic_clips

TINY = dict(n_in_channels=256, n_layers=4, max_dilation=4,
            n_residual_channels=32, n_skip_channels=64, n_out_channels=256,
            n_cond_channels=16, upsamp_window=32, upsamp_stride=16)
TINY_DATA = DataConfig(segment_length=256, filter_length=64, hop_length=16,
                       win_length=64, n_mel_channels=16, mel_fmax=4000.0)


def tiny_batch(batch=2, seed=0):
    ds = Mel2Samp(synthetic_clips(n_clips=2, length=1024, seed=seed),
                  TINY_DATA, seed=seed)
    return next(ds.batches(batch))


def test_forward_shapes_and_shift():
    model = WaveNetTrain(**TINY)
    mel, audio = tiny_batch()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(mel),
                        jnp.asarray(audio))
    logits = model.apply(params, jnp.asarray(mel), jnp.asarray(audio))
    B, T = audio.shape
    assert logits.shape == (B, T, TINY["n_out_channels"])
    # position 0 must be the zero-filled shift (`pytorch/wavenet.py:141-143`)
    assert np.all(np.asarray(logits[:, 0]) == 0.0)


def test_loss_decreases():
    model = WaveNetTrain(**TINY)
    ds = Mel2Samp(synthetic_clips(n_clips=2, length=1024), TINY_DATA)
    _, losses = trainer.train(model, trainer.TrainConfig(learning_rate=3e-3,
                                                         batch_size=2),
                              ds.batches(2), num_iters=20, log_every=100)
    assert losses[-1] < losses[0] * 0.9, f"no descent: {losses[0]} -> {losses[-1]}"
    assert losses[0] < 6.0  # ~ln(256)=5.55 at init


def test_teacher_forced_train_infer_equivalence():
    """EXACT functional equivalence between the trainable model and the
    inference generator: drive the generator with teacher-forced ground-truth
    symbols and one-step-shifted conditioning; its logits za[t] must equal the
    training forward's logits[t] for all t >= 1 (same floats up to matmul
    reordering).  This validates the entire export path
    (`pytorch/wavenet.py:147-188` conventions: zero embed_prev, no embed tanh,
    tap-0/tap-1 split, zero last res layer, zero out/end biases)."""
    model = WaveNetTrain(**TINY)
    mel, audio = tiny_batch()
    B, T = audio.shape
    key = jax.random.PRNGKey(1)
    params = model.init(key, jnp.asarray(mel), jnp.asarray(audio))
    logits_train = np.asarray(model.apply(params, jnp.asarray(mel),
                                          jnp.asarray(audio)))

    cfg = wavenet_lib.config_of(model)
    canon = wavenet_lib.export_canonical(params, model)
    # training conditioning at positions [0, T): cond_acts from the same mel
    cond = np.asarray(model.apply(params, jnp.asarray(mel), T,
                                  method=WaveNetTrain._cond_acts))  # [B,T,L,2R]
    cond = np.transpose(cond, (1, 2, 0, 3))                         # [T,L,B,2R]

    # Alignment: generator step s (s = 0..T-2) reproduces the training
    # forward at position s exactly when
    #   y_cur at step s == audio[s]  (x0 = embed(audio[s]) = x_train[s];
    #     embed_prev is zero so y_prev is irrelevant)
    #   cond_inf[s]      == cond[s]
    #   ring zero-init  == training's causal left pad (both give zero x^l
    #     for positions < 0), with ring writes matching x_train^l[s]
    # so za[s] == out_train[s] == logits_train[s+1], for EVERY s.
    audio_np = np.asarray(audio)
    forced = audio_np[:, 1:].T                      # y emitted at step s
    state = scan_generate.init_state(cfg, B)._replace(
        y_cur=jnp.asarray(audio_np[:, 0], jnp.int32))
    canon_j = {k: jnp.asarray(v) for k, v in canon.items()}
    sel = np.zeros((T - 1, B), np.float32)
    _, _, za = scan_generate.generate(canon_j, state,
                                      jnp.asarray(cond[:T - 1]),
                                      jnp.asarray(sel), cfg,
                                      forced_y=jnp.asarray(forced),
                                      return_za=True)
    za = np.asarray(za)                             # [T-1, B, A]

    want = np.transpose(logits_train[:, 1:], (1, 0, 2))
    np.testing.assert_allclose(za, want, rtol=2e-4, atol=2e-5)


def test_checkpoint_roundtrip(tmp_path):
    model = WaveNetTrain(**TINY)
    mel, audio = tiny_batch()
    state = trainer.create_train_state(model, trainer.TrainConfig(), mel, audio)
    state, loss = jax.jit(trainer.train_step)(state, jnp.asarray(mel),
                                              jnp.asarray(audio))
    trainer.save_checkpoint(str(tmp_path / "ckpt"), state, 1)
    fresh = trainer.create_train_state(model, trainer.TrainConfig(), mel, audio)
    restored, it = trainer.load_checkpoint(str(tmp_path / "ckpt"), 1, fresh)
    assert it == 1
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                            np.asarray(b)),
                 state.params, restored.params)


def test_sharded_training_matches_single_device():
    """DP+TP sharded step == unsharded step (the correctness property the
    reference's hand-rolled allreduce provides implicitly)."""
    model = WaveNetTrain(**TINY)
    mel, audio = tiny_batch(batch=4)
    cfg = trainer.TrainConfig(learning_rate=1e-3)
    melj, audioj = jnp.asarray(mel), jnp.asarray(audio)

    # gradient agreement at identical init params is the real
    # collective-correctness property (the reference's allreduce contract)
    def grads_of(params):
        def loss_fn(p):
            return trainer.cross_entropy_loss(model.apply(p, melj, audioj),
                                              audioj)
        return jax.grad(loss_fn)(params)

    state1 = trainer.create_train_state(model, cfg, mel, audio)
    mesh = trainer.make_mesh(4, 2)
    state2 = trainer.create_train_state(model, cfg, mel, audio)
    state2, _ = trainer.shard_train_state(state2, mesh)
    g1 = jax.jit(grads_of)(state1.params)
    g2 = jax.jit(grads_of)(state2.params)   # sharded inputs -> sharded grads
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        jax.device_get(g1), jax.device_get(g2))

    state1, loss1 = jax.jit(trainer.train_step)(state1, melj, audioj)
    step = trainer.make_sharded_train_step(mesh)
    state2, loss2 = step(state2, mel, audio)
    assert abs(float(loss1) - float(loss2)) < 1e-5
    # post-Adam params are NOT comparable at tight tolerance (the first Adam
    # update is ~sign(g)*lr; near-zero grads legitimately flip sign under
    # sharded reduction order) — bound divergence by one step size instead
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2.1 * cfg.learning_rate),
        state1.params, jax.device_get(state2.params))


def test_seq_parallel_training_matches_single_device():
    """DP+TP+SP (time-axis sharded) step == unsharded step.  Sequence
    parallelism splits each 16k-sample training segment across chips; XLA
    inserts the dilated-conv halo exchanges and the loss psum from the
    sharding annotations alone — this asserts those collectives preserve
    the math (capability absent in the reference, SURVEY §2.5 P10)."""
    model = WaveNetTrain(**TINY)
    mel, audio = tiny_batch(batch=4)
    cfg = trainer.TrainConfig(learning_rate=1e-3)
    melj, audioj = jnp.asarray(mel), jnp.asarray(audio)

    def grads_of(params):
        def loss_fn(p):
            return trainer.cross_entropy_loss(model.apply(p, melj, audioj),
                                              audioj)
        return jax.grad(loss_fn)(params)

    state1 = trainer.create_train_state(model, cfg, mel, audio)
    mesh = trainer.make_mesh(2, 2, 2)       # all three axes at once
    P = jax.sharding.PartitionSpec
    assert trainer.batch_partition_spec(mesh, audio.shape[1]) == P(
        "data", "seq")
    # mel frames (T/hop + 1, odd) don't divide the seq axis -> data-only
    assert trainer.batch_partition_spec(mesh, mel.shape[1]) == P("data")
    state2 = trainer.create_train_state(model, cfg, mel, audio)
    state2, _ = trainer.shard_train_state(state2, mesh)

    # grads under batch-AND-time-sharded inputs vs the unsharded truth
    mel_sh = jax.device_put(melj, jax.sharding.NamedSharding(
        mesh, trainer.batch_partition_spec(mesh, mel.shape[1])))
    audio_sh = jax.device_put(audioj, jax.sharding.NamedSharding(
        mesh, trainer.batch_partition_spec(mesh, audio.shape[1])))

    def grads_sharded(params):
        def loss_fn(p):
            return trainer.cross_entropy_loss(
                model.apply(p, mel_sh, audio_sh), audio_sh)
        return jax.grad(loss_fn)(params)

    g1 = jax.jit(grads_of)(state1.params)
    g2 = jax.jit(grads_sharded)(state2.params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        jax.device_get(g1), jax.device_get(g2))

    _, loss1 = jax.jit(trainer.train_step)(state1, melj, audioj)
    step = trainer.make_sharded_train_step(mesh)   # stages via P(data, seq)
    _, loss2 = step(state2, mel, audio)
    assert abs(float(loss1) - float(loss2)) < 1e-5


def test_mel_upsample_equals_conv_transpose():
    """MelUpsample (einsum + overlap-add) must reproduce
    nn.ConvTranspose(padding="VALID") with the same parameters — it is a
    checkpoint-compatible drop-in whose only difference is the TPU lowering."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from nv_wavenet_tpu.models.wavenet import MelUpsample

    B, F, C, K, S = 2, 9, 7, 12, 3
    x = jnp.asarray(np.random.RandomState(0).randn(B, F, C).astype(np.float32))
    ct = nn.ConvTranspose(features=C, kernel_size=(K,), strides=(S,),
                          padding="VALID", precision="highest")
    p = ct.init(jax.random.PRNGKey(0), x)
    ref = ct.apply(p, x)
    ours = MelUpsample(features=C, window=K, stride=S).apply(p, x)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_prefetch_propagates_worker_errors():
    """An exception inside the data iterator must surface in the training
    loop (not hang the consumer waiting on the queue)."""
    from nv_wavenet_tpu.train.trainer import _device_prefetch

    def bad_batches():
        yield (np.zeros((2, 4), np.float32),)
        raise RuntimeError("boom")

    it = _device_prefetch(bad_batches())
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_precision_option_plumbs_through_config():
    cfg = dict(TINY)
    cfg["precision"] = "default"
    model = trainer.create_model(cfg)
    assert model.precision == "default"
    mel, audio = tiny_batch()
    state = trainer.create_train_state(model, trainer.TrainConfig(), mel, audio)
    _, loss = jax.jit(trainer.train_step)(state, jnp.asarray(mel),
                                          jnp.asarray(audio))
    assert np.isfinite(float(loss))


def test_metrics_jsonl_sink(tmp_path):
    """with_tensorboard=True streams per-iteration scalars to
    <ckpt_dir>/metrics.jsonl (the reference flag's structured-sink analog)."""
    import json

    from nv_wavenet_tpu.train.data import DataConfig, Mel2Samp, synthetic_clips

    model = trainer.create_model(TINY)
    ds = Mel2Samp(synthetic_clips(n_clips=2, length=1024), TINY_DATA)
    tcfg = trainer.TrainConfig(batch_size=2, iters_per_checkpoint=1000,
                               with_tensorboard=True)
    trainer.train(model, tcfg, ds.batches(2), num_iters=3,
                  ckpt_dir=str(tmp_path), log_every=1)
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert [l["iteration"] for l in lines] == [0, 1, 2]
    assert all(np.isfinite(l["loss"]) and l["elapsed_s"] >= 0 for l in lines)
