"""Likelihood scoring: exact per-sample log-probabilities of ground-truth
audio under the model, via teacher-forced generation.

A capability beyond the reference (whose only quality signal is a listening
test, `pytorch/README.md:19`): because the scan generator supports forced-y
teacher forcing and per-step logits, the framework can score audio exactly
with the same code path it generates with — useful for eval (held-out NLL /
bits-per-sample) and for regression-testing trained checkpoints.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.ops import scan_generate


def score_teacher_forced(params: Dict, cfg: WaveNetConfig, cond: jax.Array,
                         audio: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-sample log p(audio[t] | audio[<t], cond) for t in [1, T).

    cond: [T, L, B, 2R] conditioning (position t conditions the prediction
    of audio[t+1], matching the trainable model's alignment — see
    tests/test_train.py::test_teacher_forced_train_infer_equivalence).
    audio: [B, T] int mu-law bins.

    Returns (logp [B, T-1], bits_per_sample [B]).
    """
    B, T = audio.shape
    forced = jnp.asarray(audio[:, 1:]).T                       # [T-1, B]
    state = scan_generate.init_state(cfg, B)._replace(
        y_cur=jnp.asarray(audio[:, 0], jnp.int32))
    sel = jnp.zeros((T - 1, B), jnp.float32)
    _, _, za = scan_generate.generate(params, state, cond[:T - 1], sel, cfg,
                                      forced_y=forced, return_za=True)
    logp_all = jax.nn.log_softmax(za, axis=-1)                 # [T-1, B, A]
    targets = forced[..., None]
    logp = jnp.take_along_axis(logp_all, targets, axis=-1)[..., 0].T  # [B,T-1]
    bits = -jnp.mean(logp, axis=-1) / jnp.log(2.0)
    return logp, bits


def score_teacher_forced_kernel(params: Dict, cfg: WaveNetConfig, cond,
                                audio, chunk: int = 256,
                                interpret: bool = False
                                ) -> Tuple[np.ndarray, np.ndarray]:
    """`score_teacher_forced` on the fused Pallas kernel's native forced
    mode (the selector stream carries the ground-truth symbols; the kernel
    emits the per-step probability sequence) — the fast on-TPU scorer: one
    kernel invocation instead of a scan program, with the kernel's VMEM
    residency and DMA pipelining.

    Same signature/semantics; returns numpy (logp [B, T-1], bits [B]).

    Precision caveat: the kernel emits fp32 softmax PROBABILITIES, so logp
    is computed as log(max(p, 1e-30)) — a target whose probability
    underflows fp32 is floored at log(1e-30) (~-69 nats / ~100 bits),
    whereas the log_softmax-based scorers (`score_teacher_forced`,
    `score_teacher_forced_parallel`) resolve arbitrarily small tail
    log-likelihoods.  On peaked trained models where exact tail values
    matter, cross-check against score_teacher_forced_parallel."""
    from nv_wavenet_tpu.ops import persistent

    audio = np.asarray(audio)
    B, T = audio.shape
    Tm = T - 1
    chunk = max(8, min(chunk, -(-Tm // 8) * 8) // 8 * 8)
    pad = (-Tm) % chunk
    forced = audio[:, 1:].T.astype(np.float32)                 # [T-1, B]
    cond = np.asarray(cond[:Tm], np.float32)
    if pad:
        forced = np.concatenate([forced, np.zeros((pad, B), np.float32)])
        cond = np.concatenate(
            [cond, np.zeros((pad,) + cond.shape[1:], np.float32)])
    gen = persistent.make_persistent_generator(cfg, B, chunk, mode="forced",
                                               interpret=interpret)
    ring = persistent.init_ring(cfg, B)
    y_state = jnp.stack([jnp.full((B,), cfg.silence_bin, jnp.int32),
                         jnp.asarray(audio[:, 0], jnp.int32)])
    out = gen(params, np.array([0]), jnp.asarray(cond), jnp.asarray(forced),
              ring, y_state, n_valid=Tm)
    p_seq = np.asarray(out[-1][:Tm], np.float64)               # [T-1, B, A]
    tgt = audio[:, 1:].T[..., None]
    p_tgt = np.take_along_axis(p_seq, tgt, axis=-1)[..., 0].T  # [B, T-1]
    logp = np.log(np.maximum(p_tgt, 1e-30))
    bits = -logp.mean(axis=-1) / np.log(2.0)
    return logp.astype(np.float32), bits.astype(np.float32)


def score_teacher_forced_parallel(params: Dict, cfg: WaveNetConfig, cond,
                                  audio) -> Tuple[jax.Array, jax.Array]:
    """`score_teacher_forced` with the time dimension fully parallel.

    Teacher forcing has no sequential dependence (every input symbol is
    given), so scoring needs none of the autoregressive machinery: every
    per-step matmul batches over all T-1 steps at once ([T*B, C] MXU
    matmuls — the same shape as the training forward, ~2L+3 big matmuls
    total instead of (T-1)*(2L+3) small sequential ones).  Delegates to
    `ops/score_parallel.make_parallel_scorer` — the ring-state-aware core
    whose per-step math is the CANONICAL order (models/golden.py), so the
    per-step probabilities match the sequential forced mode exactly
    (tests/test_score_parallel.py); log-probabilities here are resolved via
    log_softmax on the logits (tail-safe, unlike fp32 p).

    A capability with no reference analog: the reference can only score by
    running its training model (`pytorch/wavenet.py:102-145`); here the
    ENGINE-format params score directly, at training-forward speed.
    """
    from nv_wavenet_tpu.ops import persistent, score_parallel

    B, T = audio.shape
    Tm = T - 1
    y = jnp.asarray(audio, jnp.int32)
    scorer = score_parallel.make_parallel_scorer(cfg, B, return_za=True)
    ring = persistent.init_ring(cfg, B)
    y_state = jnp.stack([jnp.full((B,), cfg.silence_bin, jnp.int32),
                         y[:, 0]])
    _, _, _, za = scorer(params, jnp.zeros((1,), jnp.int32),
                         jnp.asarray(cond[:Tm], jnp.float32),
                         y[:, 1:].T, ring, y_state)
    logp_all = jax.nn.log_softmax(za, axis=-1)                # [Tm, B, A]
    targets = y[:, 1:].T[..., None]
    logp = jnp.take_along_axis(logp_all, targets, axis=-1)[..., 0].T
    bits = -jnp.mean(logp, axis=-1) / jnp.log(2.0)
    return logp, bits
