"""Time-parallel teacher-forced scorer: per-step output distributions of a
KNOWN symbol trajectory, computed with layer-sequential / TIME-PARALLEL
matmuls instead of the sequential sample loop.

Teacher forcing breaks the autoregressive dependence — every step's inputs
(previous symbols, conditioning) are known up front — so the per-step math
can batch the WHOLE window through the MXU as [T*B, C] matmuls: L layer
passes instead of T*(2L+3) dependent small matmuls.  This is the inference
engine's analog of the TRAINING forward (which is convolutional over the
segment for the same reason, `/root/reference/pytorch/wavenet.py:102-145`,
mirrored by models/wavenet.py), but it operates on engine-format canonical
params and the engine's carried dilation-FIFO ring state, so it can score
MID-STREAM from any generation state — used for fast likelihood scoring
(bits/sample) and as the verification pass of speculative decoding.

Exactness: each step's math is the canonical per-step order shared by all
implementations (models/golden.py) — the matmuls' rows are independent, so
evaluating T steps as one [T*B, C] GEMM performs the identical per-row dot
products (fp32 HIGHEST) and identical elementwise ops as the sequential
forced mode; p_seq matches the numpy golden's `get_p_seq` bit-for-bit on a
matched backend (tests/test_score_parallel.py), with the documented
transcendental-lowering caveat across backends (docs/DESIGN.md).

The dilated lookback x^l_{t-d} comes from the SAME lane-packed ring format
the generation kernels carry (ops/persistent.init_ring): history rows are
gathered at call start and the ring is written back as the sequential
kernel would leave it, so scorer calls interleave exactly with generation
(score a drafted window, keep generating) and chunked scoring equals one
full-window score.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.ops import exact_math as em
from nv_wavenet_tpu.ops.persistent import _dot, softmax_canonical


def make_parallel_scorer(cfg: WaveNetConfig, batch: int,
                         compute_dtype=jnp.float32,
                         fast_math: bool = False,
                         prefold_cond: bool = False,
                         return_xt: bool = False,
                         return_za: bool = False):
    """Build `score(params, t0, cond, y, ring, y_state)` (jit it per shape).

    cond: [T, L, B, 2R] conditioning (dil_b-prefolded iff prefold_cond);
    y: [T, B] int32 — the forced symbols EMITTED at steps t0..t0+T-1;
    ring: lane-packed dilation-FIFO state (ops/persistent.init_ring format,
    carried to/from the generation kernels); y_state: [2, B] int32 =
    (y_{t0-2}, y_{t0-1}); t0: [1] int32 absolute index of the first step.

    Returns (p_seq [T, B, A], ring', y_state') — ring'/y_state' equal what
    the sequential kernels would carry after generating the same window, so
    chunked scoring and score->generate handoffs are exact.  With
    return_xt=True appends xt [L+1, T, B, R]: each layer's input x^l_t plus
    the final residual output, the per-position state needed to COMMIT a
    prefix of the window (speculative decoding's accept path).  With
    return_za=True appends the pre-softmax logits za [T, B, A] (likelihood
    callers resolve tail log-probabilities via log_softmax on za; fp32 p
    underflows below ~1e-38).

    `score` additionally accepts n_valid (traced int scalar, default T):
    ring'/y_state' then reflect only the first n_valid steps — the COMMIT
    primitive of speculative decoding (p_seq rows >= n_valid are computed
    but meaningless to a committing caller).  Positions j < n_valid only
    depend on symbols emitted before them, so a caller may overwrite
    y[n_valid-1] (the correction token) without invalidating the window's
    activations.
    """
    L, R, S, A = cfg.num_layers, cfg.R, cfg.S, cfg.A
    B = batch
    dils = cfg.dilations
    _, _, p_offs, lane_slots = cfg.packed_ring_plan()
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32 and not fast_math
                 else jax.lax.Precision.DEFAULT)

    def score(params: Dict, t0, cond, y, ring, y_state, n_valid=None):
        T = y.shape[0]
        t0 = jnp.asarray(t0, jnp.int32).reshape(())
        nv = (jnp.int32(T) if n_valid is None
              else jnp.asarray(n_valid, jnp.int32).reshape(()))
        embed = jnp.asarray(params["embed"], jnp.float32)      # [2A, R]
        dil_w = jnp.asarray(params["dil_w"], jnp.float32)      # [L, 2R, 2R]
        dil_b = jnp.asarray(params["dil_b"], jnp.float32)      # [L, 2R]
        rs_w = jnp.asarray(params["rs_w"], jnp.float32)        # [L, R, R+S]
        rs_b = jnp.asarray(params["rs_b"], jnp.float32)        # [L, R+S]

        # symbol history: y_full[i] is the symbol emitted at time t0-2+i
        y_full = jnp.concatenate([y_state, y], axis=0)         # [T+2, B]
        y_prev, y_cur = y_full[:T], y_full[1:T + 1]
        # 2-tap embedding as gathers: one row per table per step, summed —
        # the identical single rounded add as the kernels' one-hot GEMMs
        x = (jnp.take(embed[:A], y_prev, axis=0)
             + jnp.take(embed[A:], y_cur, axis=0))             # [T, B, R]
        if cfg.tanh_embed:
            x = em.tanh(x)
        x = x.astype(compute_dtype)

        xt = [] if return_xt else None
        skip = jnp.zeros((T, B, S), jnp.float32)
        for l in range(L):
            d = dils[l]
            q = lane_slots[l] * R
            # history: x^l at times t0-d .. t0-1 lives at ring slot
            # p_offs[l] + (time mod d) — layer l's FIFO is the CONTIGUOUS
            # row block [p_offs[l], p_offs[l]+d), just rotated by t0 mod d,
            # so a static slice + jnp.roll replaces a row gather (a traced
            # row-index gather lowers to a per-row dynamic-slice loop on
            # TPU — measured ~ms per scorer call at maxD=512)
            block = ring[p_offs[l]:p_offs[l] + d, :, q:q + R]
            hist = jnp.roll(block, -(t0 % d), axis=0).astype(compute_dtype)
            x_full = jnp.concatenate([hist, x], axis=0)        # [d+T, B, R]
            x_prev = x_full[:T]                                # x^l_{t-d}
            if return_xt:
                xt.append(x)
            # write-back: the d most recent COMMITTED values (times
            # t0+nv-d..t0+nv-1 = x_full[nv:nv+d]) land at their residue
            # slots — exactly the state the sequential kernel leaves after
            # nv steps (entries before the window rewrite unchanged
            # history).  Slot i must hold x_last[(i - (t0+nv)) mod d]: a
            # forward roll + static-slice update (scatter-free, see above).
            x_last = jax.lax.dynamic_slice_in_dim(x_full, nv, d, axis=0)
            new_block = jnp.roll(x_last, (t0 + nv) % d, axis=0)
            ring = ring.at[p_offs[l]:p_offs[l] + d, :, q:q + R].set(
                new_block.astype(ring.dtype))
            # canonical split dilated GEMM: (z_prev + z_cur) + (Bh + cond)
            z = (_dot(x_prev.reshape(T * B, R),
                      dil_w[l, :R].astype(compute_dtype), precision)
                 + _dot(x.reshape(T * B, R),
                        dil_w[l, R:].astype(compute_dtype), precision)
                 ).reshape(T, B, 2 * R)
            if prefold_cond:
                z = z + cond[:, l].astype(jnp.float32)
            else:
                z = z + (dil_b[l].astype(jnp.float32)
                         + cond[:, l].astype(jnp.float32))
            # canonical gated activation (ops/exact_math.py): bit-identical
            # to the sequential kernels' per-step gates, so the scorer's
            # teacher-forced p/za match generation at ANY horizon
            h = (em.tanh(z[..., :R]) * em.sigmoid(z[..., R:])
                 ).astype(compute_dtype)
            rs = _dot(h.reshape(T * B, R), rs_w[l].astype(compute_dtype),
                      precision).reshape(T, B, R + S)
            x = ((rs[..., :R] + rs_b[l, :R].astype(jnp.float32))
                 + x.astype(jnp.float32)).astype(compute_dtype)
            skip = (skip + rs[..., R:]) + rs_b[l, R:].astype(jnp.float32)
        if return_xt:
            xt.append(x)

        skip = jnp.maximum(skip, 0.0)
        out_w = jnp.asarray(params["out_w"], jnp.float32)
        out_b = jnp.asarray(params["out_b"], jnp.float32).reshape(1, A)
        end_w = jnp.asarray(params["end_w"], jnp.float32)
        end_b = jnp.asarray(params["end_b"], jnp.float32).reshape(1, A)
        zs = jnp.maximum(
            _dot(skip.reshape(T * B, S).astype(compute_dtype),
                 out_w.astype(compute_dtype), precision)
            + out_b[0].astype(jnp.float32), 0.0)
        za = (_dot(zs.astype(compute_dtype), end_w.astype(compute_dtype),
                   precision) + end_b[0].astype(jnp.float32))
        p_seq = softmax_canonical(za).reshape(T, B, A)

        y_state_out = jax.lax.dynamic_slice_in_dim(y_full, nv, 2, axis=0)
        out = (p_seq, ring, y_state_out)
        if return_xt:
            out += (jnp.stack(xt, axis=0),)                    # [L+1, T, B, R]
        if return_za:
            out += (za.reshape(T, B, A),)
        return out

    return score


def make_state_committer(cfg: WaveNetConfig):
    """Build `commit(ring, xt, y, y_state, t0, nv)` -> (ring', y_state'):
    the carried state after committing the first `nv` steps of a window the
    scorer ALREADY evaluated — from its `return_xt` activations, without a
    second scorer pass (the layer GEMMs are the cost; the state write-back
    below is the same roll math as the scorer's, on data already computed).

    Correctness: position j's activations depend only on symbols emitted
    BEFORE j, and a speculative commit point nv satisfies "drafted symbols
    at positions < nv-1 equal the exact ones" — so xt[l][:nv] (computed
    under the drafted window) IS the exact trajectory's layer-l input for
    the committed prefix, and the assembled ring bit-equals what a scorer
    pass over the corrected window with n_valid=nv would write
    (tests/test_speculative.py exercises every disagreement pattern).

    ring: pre-window ring state; xt: [>=L, T, B, R] from the scorer's
    return_xt; y: [T, B] the corrected window symbols; y_state: [2, B]
    pre-window; t0 scalar; nv traced scalar in [1, T]."""
    L, R = cfg.num_layers, cfg.R
    dils = cfg.dilations
    _, _, p_offs, lane_slots = cfg.packed_ring_plan()

    def commit(ring, xt, y, y_state, t0, nv):
        t0 = jnp.asarray(t0, jnp.int32).reshape(())
        nv = jnp.asarray(nv, jnp.int32).reshape(())
        for l in range(L):
            d = dils[l]
            q = lane_slots[l] * R
            block = ring[p_offs[l]:p_offs[l] + d, :, q:q + R]
            hist = jnp.roll(block, -(t0 % d), axis=0)
            x_full = jnp.concatenate(
                [hist, xt[l].astype(ring.dtype)], axis=0)      # [d+T, B, R]
            x_last = jax.lax.dynamic_slice_in_dim(x_full, nv, d, axis=0)
            new_block = jnp.roll(x_last, (t0 + nv) % d, axis=0)
            ring = ring.at[p_offs[l]:p_offs[l] + d, :, q:q + R].set(new_block)
        y_full = jnp.concatenate([y_state, jnp.asarray(y, jnp.int32)], axis=0)
        y_state_out = jax.lax.dynamic_slice_in_dim(y_full, nv, 2, axis=0)
        return ring, y_state_out

    return commit


def bits_per_sample(p_seq: jax.Array, y: jax.Array) -> jax.Array:
    """Teacher-forced negative log2-likelihood per step: p_seq [T, B, A]
    (from `make_parallel_scorer`), y [T, B] int32 — returns [T, B] bits.
    Mean over (T, B) is the bits/sample metric tools/eval_checkpoint.py
    reports."""
    p = jnp.take_along_axis(p_seq, y[..., None].astype(jnp.int32),
                            axis=-1)[..., 0]
    return -jnp.log2(jnp.maximum(p, 1e-30))
