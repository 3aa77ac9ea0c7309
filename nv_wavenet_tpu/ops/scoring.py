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
