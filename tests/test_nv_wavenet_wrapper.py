"""NVWaveNet drop-in wrapper: reference user API (export_weights dict +
channels-first cond) must reproduce the golden model exactly."""

import numpy as np

import jax
import jax.numpy as jnp

from nv_wavenet_tpu.engine.nv_wavenet import Impl, NVWaveNet
from nv_wavenet_tpu.models import wavenet as wavenet_lib
from nv_wavenet_tpu.models.golden import WaveNetGolden
from nv_wavenet_tpu.models.wavenet import WaveNetTrain

from tests.test_train import TINY, tiny_batch


def test_wrapper_matches_golden_via_export_weights():
    model = WaveNetTrain(**TINY)
    mel, audio = tiny_batch()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(mel),
                        jnp.asarray(audio))
    exported = wavenet_lib.export_weights(params, model)
    cfg = wavenet_lib.config_of(model)

    B, T = 2, 10
    rng = np.random.RandomState(5)
    # reference layout: channels x batch x layers x samples
    cond_ref = rng.uniform(-0.5, 0.5,
                           (2 * cfg.R, B, cfg.num_layers, T)).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)

    net = NVWaveNet(**exported, interpret=True, chunk_size=4)
    assert (net.R, net.S, net.A) == (cfg.R, cfg.S, cfg.A)
    y = net.infer(cond_ref, Impl.PERSISTENT, selectors=sel)

    golden = WaveNetGolden(cfg, B, T)
    golden.set_embeddings(exported["embedding_prev"].T,
                          exported["embedding_curr"].T)
    canon = wavenet_lib.export_canonical(params, model)
    # drive the golden via canonical params for independence
    from nv_wavenet_tpu.ops import scan_generate
    pjx = {k: jnp.asarray(v) for k, v in canon.items()}
    state = scan_generate.init_state(cfg, B)
    cond_tm = np.transpose(cond_ref, (3, 2, 1, 0))
    _, y_scan, _ = scan_generate.generate(pjx, state, jnp.asarray(cond_tm),
                                          jnp.asarray(sel), cfg)
    assert np.array_equal(y, np.asarray(y_scan))


def test_wrapper_validates_cond_shape():
    model = WaveNetTrain(**TINY)
    mel, audio = tiny_batch()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(mel),
                        jnp.asarray(audio))
    net = NVWaveNet(**wavenet_lib.export_weights(params, model),
                    interpret=True)
    bad = np.zeros((8, 1, 3, 4), np.float32)
    try:
        net.infer(bad, Impl.AUTO)
        assert False, "expected shape assertion"
    except AssertionError as e:
        assert "channels" in str(e)


def test_wrapper_accepts_torch_style_3d_conv_weights():
    """The reference's WaveNet.export_weights emits Conv1d weights with a
    trailing kernel dim of 1 ([out, in, 1]); the wrapper must squeeze them
    (the reference wrapper does the same in column_major) and produce
    identical samples."""
    model = WaveNetTrain(**TINY)
    mel, audio = tiny_batch()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(mel),
                        jnp.asarray(audio))
    exported = wavenet_lib.export_weights(params, model)
    cfg = wavenet_lib.config_of(model)
    torchy = dict(exported)
    for k in ("conv_out_weight", "conv_end_weight"):
        torchy[k] = np.asarray(exported[k])[:, :, None]
    torchy["res_weights"] = [np.asarray(w)[:, :, None]
                             for w in exported["res_weights"]]
    torchy["skip_weights"] = [np.asarray(w)[:, :, None]
                              for w in exported["skip_weights"]]

    B, T = 2, 6
    rng = np.random.RandomState(9)
    cond_ref = rng.uniform(-0.5, 0.5, (2 * cfg.R, B, cfg.num_layers, T)
                           ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)
    y1 = NVWaveNet(**exported, interpret=True, chunk_size=8).infer(
        cond_ref, Impl.PERSISTENT, selectors=sel)
    y2 = NVWaveNet(**torchy, interpret=True, chunk_size=8).infer(
        cond_ref, Impl.PERSISTENT, selectors=sel)
    assert np.array_equal(y1, y2)


def test_wrapper_fresh_selectors_per_call():
    """selectors=None must draw a fresh stream each call (the reference's
    per-call host rand()); an explicit seed restores reproducibility."""
    model = WaveNetTrain(**TINY)
    mel, audio = tiny_batch()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(mel),
                        jnp.asarray(audio))
    exported = wavenet_lib.export_weights(params, model)
    cfg = wavenet_lib.config_of(model)
    rng = np.random.RandomState(2)
    cond_ref = rng.uniform(-0.5, 0.5, (2 * cfg.R, 1, cfg.num_layers, 8)
                           ).astype(np.float32)
    net = NVWaveNet(**exported, interpret=True, chunk_size=8)
    y1 = net.infer(cond_ref, Impl.PERSISTENT)
    y2 = net.infer(cond_ref, Impl.PERSISTENT)
    assert not np.array_equal(y1, y2)
    ya = net.infer(cond_ref, Impl.PERSISTENT, seed=42)
    yb = net.infer(cond_ref, Impl.PERSISTENT, seed=42)
    assert np.array_equal(ya, yb)
