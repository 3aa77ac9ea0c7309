"""Likelihood scoring sanity: a trained-ish model must assign its own argmax
trajectory higher likelihood than random audio, and bits/sample of an
untrained model must be ~log2(A)."""

import numpy as np

import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.ops import scan_generate, scoring


def test_untrained_bits_near_uniform():
    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    B, T = 2, 32
    ref_w = params_lib.random_reference_weights(cfg, seed=1, scale=1e-3)
    params = {k: jnp.asarray(v) for k, v in
              params_lib.to_canonical(ref_w, cfg).items()}
    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.uniform(-0.1, 0.1,
        (T, cfg.num_layers, B, 2 * cfg.R)).astype(np.float32))
    audio = jnp.asarray(rng.randint(0, 256, (B, T)), jnp.int32)
    logp, bits = scoring.score_teacher_forced(params, cfg, cond, audio)
    assert logp.shape == (B, T - 1)
    # near-zero weights -> near-uniform distribution -> ~8 bits/sample
    assert np.all(np.abs(np.asarray(bits) - 8.0) < 0.3), bits


def test_argmax_trajectory_scores_higher_than_random():
    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=8)
    B, T = 2, 48
    ref_w = params_lib.random_reference_weights(cfg, seed=3, scale=0.5 / 32)
    params = {k: jnp.asarray(v) for k, v in
              params_lib.to_canonical(ref_w, cfg).items()}
    rng = np.random.RandomState(1)
    cond = jnp.asarray(rng.uniform(-0.5, 0.5,
        (T, cfg.num_layers, B, 2 * cfg.R)).astype(np.float32))
    sel = jnp.asarray(rng.uniform(0, 1, (T, B)).astype(np.float32))
    state = scan_generate.init_state(cfg, B)
    _, y_argmax, _ = scan_generate.generate(params, state, cond, sel, cfg,
                                            mode="argmax")
    _, bits_own = scoring.score_teacher_forced(params, cfg, cond,
                                               jnp.asarray(y_argmax))
    rand_audio = jnp.asarray(rng.randint(0, 256, (B, T)), jnp.int32)
    _, bits_rand = scoring.score_teacher_forced(params, cfg, cond, rand_audio)
    assert np.all(np.asarray(bits_own) < np.asarray(bits_rand))


def test_kernel_scorer_matches_scan_scorer():
    """The fused-kernel forced-mode scorer must reproduce the scan scorer's
    per-sample log-probabilities (same math; p-vs-log_softmax rounding only)
    including at a non-chunk-aligned length."""
    import jax.numpy as jnp

    from nv_wavenet_tpu.models import params as params_lib

    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    B, T = 3, 21
    ref_w = params_lib.random_reference_weights(cfg, seed=91)
    params = {k: jnp.asarray(v)
              for k, v in params_lib.to_canonical(ref_w, cfg).items()}
    rng = np.random.RandomState(4)
    cond = jnp.asarray(rng.uniform(
        -0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)).astype(np.float32))
    audio = rng.randint(0, 256, size=(B, T)).astype(np.int32)

    logp_scan, bits_scan = scoring.score_teacher_forced(params, cfg, cond,
                                                        jnp.asarray(audio))
    logp_k, bits_k = scoring.score_teacher_forced_kernel(
        params, cfg, cond, audio, chunk=8, interpret=True)
    assert logp_k.shape == (B, T - 1)
    assert np.allclose(np.asarray(logp_scan), logp_k, atol=2e-5)
    assert np.allclose(np.asarray(bits_scan), bits_k, atol=1e-5)


def test_parallel_scorer_matches_scan_scorer():
    """The time-parallel scorer (one conv-style pass, [T*B, C] matmuls)
    reproduces the sequential scan scorer to reassociation tolerance."""
    import jax.numpy as jnp

    from nv_wavenet_tpu.models import params as params_lib

    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=8)
    B, T = 3, 33
    ref_w = params_lib.random_reference_weights(cfg, seed=13)
    params = {k: jnp.asarray(v)
              for k, v in params_lib.to_canonical(ref_w, cfg).items()}
    rng = np.random.RandomState(5)
    cond = jnp.asarray(rng.uniform(
        -0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)).astype(np.float32))
    audio = rng.randint(0, 256, size=(B, T)).astype(np.int32)

    logp_scan, bits_scan = scoring.score_teacher_forced(params, cfg, cond,
                                                        jnp.asarray(audio))
    logp_p, bits_p = scoring.score_teacher_forced_parallel(
        params, cfg, cond, jnp.asarray(audio))
    assert logp_p.shape == (B, T - 1)
    assert np.allclose(np.asarray(logp_scan), np.asarray(logp_p), atol=2e-5)
    assert np.allclose(np.asarray(bits_scan), np.asarray(bits_p), atol=1e-5)
