"""XLA streaming generator: the whole autoregressive loop as one `lax.scan`
program — the TPU-native analog of the reference's MANYBLOCK variant
(weights re-read from HBM every sample, `nv_wavenet_persistent.cuh:539-541`,
`README.md:17`).

One compiled XLA program runs the entire generation with zero host round
trips per sample — the property the reference's cooperative persistent kernel
exists to provide (`nv_wavenet.cuh` hot loop, SURVEY §3.1).  Unlike the Pallas
persistent kernel (ops/persistent.py) the weights are not pinned in VMEM, so
this path works for arbitrarily large configs; it is the AUTO fallback when
the persistent kernel's VMEM budget is exceeded.

The step math is the framework's canonical order (see models/golden.py
docstring) so integer outputs match the golden model exactly under fp32.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.ops import exact_math as em


class GenState(NamedTuple):
    """Carried generation state.

    ring:   [ring_size, B, R] packed per-layer dilation FIFOs (see
            WaveNetConfig.ring_offsets) — the O(sum d_l) replacement for the
            reference's (maxD+1)-deep shared activation ring
            (`nv_wavenet.cuh:101-102,335`).
    y_prev, y_cur: [B] int32 last two emitted symbols (silence-initialized,
            `nv_wavenet_reference.cpp:237-240`).
    t:      [] int32 absolute sample index (drives ring slot addressing, so
            state survives chunked `run_partial` calls).
    """
    ring: jax.Array
    y_prev: jax.Array
    y_cur: jax.Array
    t: jax.Array


def init_state(cfg: WaveNetConfig, batch: int, dtype=jnp.float32) -> GenState:
    return GenState(
        ring=jnp.zeros((cfg.ring_size, batch, cfg.R), dtype),
        y_prev=jnp.full((batch,), cfg.silence_bin, jnp.int32),
        y_cur=jnp.full((batch,), cfg.silence_bin, jnp.int32),
        t=jnp.zeros((), jnp.int32),
    )


def _prec(compute_dtype):
    """fp32 compute uses exact-fp32 matmuls (the default on several backends
    is bf16-level, which breaks the exact-match contract)."""
    return (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def embed_lookup(embed: jax.Array, y_prev: jax.Array, y_cur: jax.Array,
                 A: int, tanh_embed: bool,
                 precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """x0 = [tanh](embed_prev[y_prev] + embed_cur[y_cur]) as ONE one-hot
    matmul against the fused [2A, R] table — MXU-friendly replacement for the
    reference's per-thread table reads (`nv_wavenet_singleblock.cuh:94-99`)."""
    B = y_prev.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (B, A), 1)
    onehot = jnp.concatenate(
        [(ids == y_prev[:, None]), (ids == y_cur[:, None])], axis=-1
    ).astype(embed.dtype)  # [B, 2A]
    x = jnp.dot(onehot, embed, preferred_element_type=jnp.float32,
                precision=precision)
    return em.tanh(x) if tanh_embed else x


# canonical fixed-association prefix sum (see exact_math.fixed_tree_cumsum)
cumsum_fixed_tree = em.fixed_tree_cumsum


def select_from_logits(za: jax.Array, sel: jax.Array,
                       fallback: int) -> jax.Array:
    """Canonical inverse-CDF draw from logits: the division-free
    unnormalized-sum comparison shared by every implementation
    (exact_math.sample_from_logits; reference semantics
    `softmax.cuh:150-189` + fallback `:155`).  za: [B, A]; sel: [B]."""
    return em.sample_from_logits(za, sel[:, None], fallback)


def wavenet_step(params: Dict, state: GenState, cond_t: jax.Array,
                 sel_t: jax.Array, cfg: WaveNetConfig, mode: str = "sample",
                 compute_dtype=jnp.float32, forced_y_t: jax.Array | None = None,
                 seed: jax.Array | int = 0):
    """One autoregressive sample for all utterances in the batch.

    cond_t: [L, B, 2R] conditioning for this step (bias NOT pre-folded; this
    function adds dil_b, matching the golden model).  sel_t: [B] uniforms.
    Returns (new_state, y [B] int32, aux dict of last-step activations).
    """
    L, R, S, A = cfg.num_layers, cfg.R, cfg.S, cfg.A
    B = sel_t.shape[0]
    dils, offs = cfg.dilations, cfg.ring_offsets
    ring = state.ring

    prec = _prec(compute_dtype)
    x = embed_lookup(params["embed"], state.y_prev, state.y_cur, A,
                     cfg.tanh_embed, precision=prec)
    x = x.astype(compute_dtype)
    skip = jnp.zeros((B, S), jnp.float32)
    xt_dump, skip_dump = [], []
    for l in range(L):
        slot = offs[l] + jax.lax.bitwise_and(state.t, dils[l] - 1)
        x_prev = jax.lax.dynamic_slice_in_dim(ring, slot, 1, axis=0)[0]
        ring = jax.lax.dynamic_update_slice_in_dim(ring, x[None].astype(ring.dtype),
                                                   slot, axis=0)
        # canonical split dilated GEMM (see models/golden.py docstring):
        # z = (x_prev @ Wprev + x @ Wcur) + (Bh + cond)
        dw = params["dil_w"][l].astype(compute_dtype)
        z = (jnp.dot(x_prev.astype(compute_dtype), dw[:R],
                     preferred_element_type=jnp.float32, precision=prec)
             + jnp.dot(x, dw[R:],
                       preferred_element_type=jnp.float32, precision=prec))
        z = z + (params["dil_b"][l] + cond_t[l]).astype(jnp.float32)
        h = em.tanh(z[:, :R]) * em.sigmoid(z[:, R:])
        rs = jnp.dot(h.astype(compute_dtype),
                     params["rs_w"][l].astype(compute_dtype),
                     preferred_element_type=jnp.float32, precision=prec)
        x = ((rs[:, :R] + params["rs_b"][l, :R]) + x.astype(jnp.float32)
             ).astype(compute_dtype)
        skip = (skip + rs[:, R:]) + params["rs_b"][l, R:]
        xt_dump.append(x)
        skip_dump.append(skip)
    skip = jnp.maximum(skip, 0.0)
    skip_dump[-1] = skip
    zs = jnp.maximum(
        jnp.dot(skip.astype(compute_dtype), params["out_w"].astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=prec)
        + params["out_b"], 0.0)
    za = jnp.dot(zs.astype(compute_dtype), params["end_w"].astype(compute_dtype),
                 preferred_element_type=jnp.float32, precision=prec) + params["end_b"]
    # canonical softmax pieces: e = exp(za - max), fixed-tree cumsum; the
    # sampler compares against the UNNORMALIZED sum (division-free), p is
    # the normalized tolerance-governed output (exact_math docstring)
    e, cum = em.softmax_cumsum(za)
    p = em.softmax_p(e, cum)
    if forced_y_t is not None:
        # teacher forcing: the autoregressive chain consumes ground-truth
        # symbols instead of its own samples (used for exact train-vs-infer
        # equivalence tests and likelihood scoring)
        y = forced_y_t.astype(jnp.int32)
    elif mode == "argmax":
        y = jnp.argmax(za, axis=-1).astype(jnp.int32)
    elif mode == "prng":
        # device-side sampling randomness (the cuRAND analog): key on the
        # absolute sample index so draws are independent of chunking, as in
        # the persistent kernel's per-step reseed (ops/persistent.py).  Draws
        # are implementation-specific (threefry here, TPU hardware PRNG in the
        # kernel) — the reference's host rand() is likewise unspecified.
        key = jax.random.fold_in(jax.random.PRNGKey(seed), state.t)
        u = jax.random.uniform(key, sel_t.shape, jnp.float32)
        y = em.select_from_cumsum(cum, u[:, None], A, cfg.silence_bin)
    else:
        y = em.select_from_cumsum(cum, sel_t[:, None], A, cfg.silence_bin)
    new_state = GenState(ring=ring, y_prev=state.y_cur, y_cur=y, t=state.t + 1)
    aux = {
        "xt": jnp.stack(xt_dump).astype(jnp.float32),      # [L, B, R]
        "skip": jnp.stack(skip_dump).astype(jnp.float32),  # [L, B, S]
        "zs": zs, "za": za, "p": p,
    }
    return new_state, y, aux


@functools.partial(jax.jit, static_argnames=("cfg", "mode", "dump",
                                             "compute_dtype", "return_za"))
def generate(params: Dict, state: GenState, cond: jax.Array, selectors: jax.Array,
             cfg: WaveNetConfig, mode: str = "sample", dump: bool = False,
             compute_dtype=jnp.float32, forced_y=None, return_za: bool = False,
             seed: jax.Array | int = 0):
    """Run the full sequential loop under one jit: scan over T samples.

    cond: [T, L, B, 2R]; selectors: [T, B]; forced_y: optional [T, B] int
    teacher-forcing symbols.
    Returns (final_state, y [B, T], aux) where aux is the last-sample
    activation dict when dump=True, the per-step logits [T, B, A] when
    return_za=True, else None.
    """
    seed = jnp.asarray(seed, jnp.int32)
    xs = ((cond, selectors) if forced_y is None
          else (cond, selectors, forced_y))

    def body(carry, inp):
        st = carry[0] if dump else carry
        cond_t, sel_t, *rest = inp          # forced_y column iff supplied
        new_st, y, aux = wavenet_step(params, st, cond_t, sel_t, cfg, mode,
                                      compute_dtype,
                                      forced_y_t=rest[0] if rest else None,
                                      seed=seed)
        if dump:
            # carry ONLY the latest step's activations — stacking all T
            # would materialize O(T*L*B*(R+S)) HBM for data discarded below
            return (new_st, aux), y
        if return_za:
            return new_st, (y, aux["za"])
        return new_st, y

    if dump:
        aux_shape = jax.eval_shape(
            lambda p, st, c, s: wavenet_step(
                p, st, c, s, cfg, mode, compute_dtype,
                forced_y_t=None if forced_y is None else forced_y[0],
                seed=seed)[2],
            params, state, cond[0], selectors[0])
        aux0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), aux_shape)
        (final_state, last_aux), ys = jax.lax.scan(body, (state, aux0), xs)
        return final_state, ys.T, last_aux
    final_state, out = jax.lax.scan(body, state, xs)
    if return_za:
        ys, zas = out
        return final_state, ys.T, zas
    return final_state, out.T, None
