"""Collapsed-chain ("fused") generation kernel — a beyond-reference fast
decode mode.

The persistent kernel's per-sample cost is bound by a chain of 2L+3
*dependent* MXU matmuls (embed -> per layer dilated + residual -> Zs -> Za;
see docs/DESIGN.md and utils/profiling.StepCost).  This variant shortens the
dependent chain to ~L+5 by folding the residual-stream algebra into
precomputed weights:

    x_l = x_0 + sum_{j<l} (Wres_j h_j + Bres_j)            (residual stream)
 => Wcur_l x_l = Wcur_l x_0 + sum_{j<l} (Wres_j Wcur_l) h_j + const

so layer l's pre-activation is ONE matmul against the concatenation of all
previous gate outputs [h_0 .. h_{l-1}] with the precomputed block matrix
G_l = [Wres_0 Wcur_l ; ... ; Wres_{l-1} Wcur_l], plus terms that are off the
dependent chain (the dilated-prev GEMMs read last-step state; Wcur_l x_0 for
every layer is one shared matmul at the top of the step).  The skip
accumulation similarly collapses to a single [B, L*P] x [L*P, S] matmul
after the last layer.  The residual-stream values x_l are still materialized
(off-chain, overlapping the output stack) because the dilation FIFOs store
them for future steps.

Cost model: the chain shrinks from 2L+3 to ~L+5 stages, but layer l's chain
matmul has K = l*P contraction columns, so the win is largest when each
K-tile is a single MXU pass — i.e. combined with compute_dtype=bf16 or
fast_math.  Under fp32 HIGHEST the extra K-passes eat most of the gain.

Correctness contract: the fold reassociates fp32 sums, so this mode is NOT
bit-exact against the golden model (unlike the persistent kernel).  It is
governed by the same teacher-forced distribution contract as the bf16/fast
math paths (tests/test_fused_chain.py, tests/test_low_precision.py
methodology): per-step probability TV-distance bounds against the fp32
golden.  There is no reference analog (the reference has no fast decode
mode); the closest mechanism is its --use_fast_math build
(`/root/reference/Makefile:30-35`).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.ops import exact_math as em
from nv_wavenet_tpu.ops.persistent import (
    _dot, prng_uniform_sel, _padded_bytes)


def _row_stride(R: int, pack_gates: bool = False) -> int:
    """Per-layer row block inside the packed G / h buffers.

    Default: gate outputs are stored on 128-lane-aligned column blocks (pad
    rows of G are zero, so the pad contributes exactly 0 to every matmul).

    pack_gates=True stores them tightly at R-lane stride (like the dilation
    ring's lane packing, which already exercises R-multiple lane offsets on
    hardware): for R<128 this halves/quarters the K extent of every
    dependent chain matmul — the exact cost DESIGN.md identifies as eating
    the collapsed-chain gain under fp32 HIGHEST (layer l's chain matmul has
    K = l*stride) — and shrinks the O(L^2 R P/2) G stack's VMEM by the same
    factor.  Zero-pad removal changes MXU accumulation grouping, which is
    within this mode's TV contract (the fused fold already reassociates)."""
    return R if pack_gates else max(R, 128)


def fold_params(params: Dict, cfg: WaveNetConfig, prefold_cond: bool,
                pack_gates: bool = False):
    """Precompute the collapsed-chain weights (fp32, HIGHEST) from canonical
    params.  Returns a dict of extra arrays consumed by the kernel."""
    L, R, S = cfg.num_layers, cfg.R, cfg.S
    P = _row_stride(R, pack_gates)
    hi = jax.lax.Precision.HIGHEST
    dil_w = jnp.asarray(params["dil_w"], jnp.float32)      # [L, 2R, 2R]
    rs_w = jnp.asarray(params["rs_w"], jnp.float32)        # [L, R, R+S]
    rs_b = jnp.asarray(params["rs_b"], jnp.float32)        # [L, R+S]
    dil_b = jnp.asarray(params["dil_b"], jnp.float32)      # [L, 2R]
    wcur = dil_w[:, R:, :]                                 # [L, R, 2R]
    wprev = dil_w[:, :R, :]                                # [L, R, 2R]
    wres = rs_w[:, :, :R]                                  # [L, R, R]
    wskip = rs_w[:, :, R:]                                 # [L, R, S]
    bres = rs_b[:, :R]                                     # [L, R]

    blocks = []
    for l in range(1, L):
        for j in range(l):
            nb = jnp.dot(wres[j], wcur[l], precision=hi,
                         preferred_element_type=jnp.float32)
            blocks.append(jnp.pad(nb, ((0, P - R), (0, 0))))
    if blocks:
        g_pack = jnp.concatenate(blocks, axis=0)   # [P*L(L-1)/2, 2R]
    else:
        g_pack = jnp.zeros((P, 2 * R), jnp.float32)  # L==1: never read

    wcur_cat = jnp.transpose(wcur, (1, 0, 2)).reshape(R, L * 2 * R)
    wskip_cat = jnp.concatenate(
        [jnp.pad(wskip[l], ((0, P - R), (0, 0))) for l in range(L)], axis=0)

    # cumulative residual biases folded through Wcur; dil_b itself is folded
    # into the conditioning stream by the engine when prefold_cond
    bcum = jnp.concatenate(
        [jnp.zeros((1, R), jnp.float32), jnp.cumsum(bres[:-1], axis=0)],
        axis=0)                                            # [L, R]
    fbias = jnp.einsum("lr,lrz->lz", bcum, wcur, precision=hi)
    if not prefold_cond:
        fbias = fbias + dil_b
    skipb = jnp.sum(rs_b[:, R:], axis=0, keepdims=True)    # [1, S]

    return {"wprev": wprev, "wres": wres, "bres": bres, "g_pack": g_pack,
            "wcur_cat": wcur_cat, "wskip_cat": wskip_cat, "fbias": fbias,
            "skipb": skipb}


def _kernel_body(cfg: WaveNetConfig, batch: int, chunk: int, mode: str,
                 compute_dtype, precision, unroll, pack_gates,
                 t0_ref,
                 embed, wprev, wres, bres, g_pack, wcur_cat, wskip_cat,
                 fbias, skipb, out_w, out_b, end_w, end_b,
                 cond, sel, ring_in, y_in,
                 y_out, ring_out, y_state_out, *rest):
    L, R, S, A = cfg.num_layers, cfg.R, cfg.S, cfg.A
    B = batch
    P = _row_stride(R, pack_gates)
    dils = cfg.dilations
    _, _, p_offs, lane_slots = cfg.packed_ring_plan()
    if mode == "forced":
        p_seq, ring, dma_sem, hbuf = rest
    else:
        ring, dma_sem, hbuf = rest

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(ring_in, ring, dma_sem)
        cp.start()
        cp.wait()
        y_state_out[...] = y_in[...]
        # zero once: the pad columns (rows of G that are zero) must multiply
        # against zeros, not uninitialized VMEM
        hbuf[...] = jnp.zeros(hbuf.shape, hbuf.dtype)

    t_base = t0_ref[0] + i * chunk

    def sample_step(j, _):
        t = t_base + j
        valid = (i * chunk + j) < t0_ref[1]

        @pl.when(valid)
        def _step():
            _do_sample_step(j, t)
        return 0

    def _do_sample_step(j, t):
        y_prev = y_state_out[0, :]
        y_cur = y_state_out[1, :]
        cond_t = cond[j]                                   # [L, B, 2R]

        ids = jax.lax.broadcasted_iota(jnp.int32, (B, A), 1)
        onehot = jnp.concatenate(
            [(ids == y_prev[:, None]), (ids == y_cur[:, None])], axis=-1
        ).astype(compute_dtype)
        x0 = _dot(onehot, embed[...].astype(compute_dtype), precision)
        if cfg.tanh_embed:
            x0 = em.tanh(x0)
        x0 = x0.astype(compute_dtype)

        # dilated-prev GEMMs: inputs are last-step ring state, so all L are
        # off the dependent chain (they issue at the top of the step and
        # pipeline under it).  Reads must precede this step's ring writes.
        slots = []
        pts = []
        for l in range(L):
            slot = p_offs[l] + jax.lax.bitwise_and(t, dils[l] - 1)
            q = lane_slots[l] * R
            xp = ring[pl.ds(slot, 1)][0, :, q:q + R]       # [B, R]
            slots.append((slot, q))
            pts.append(_dot(xp.astype(compute_dtype),
                            wprev[l].astype(compute_dtype), precision))

        # Wcur_l @ x_0 for EVERY layer: one shared [B,R] x [R, L*2R] matmul
        w0 = _dot(x0, wcur_cat[...].astype(compute_dtype), precision)

        hs = []
        for l in range(L):
            u = (w0[:, l * 2 * R:(l + 1) * 2 * R] + pts[l]
                 + fbias[l].astype(jnp.float32)
                 + cond_t[l].astype(jnp.float32))
            if l > 0:
                off = P * (l * (l - 1) // 2)
                u = u + _dot(hbuf[:, :l * P],
                             g_pack[off:off + l * P, :].astype(compute_dtype),
                             precision)
            # same canonical gate lowering as the exact kernel (the fold's
            # matmul reassociation stays the only draft-vs-exact divergence)
            h = (em.tanh(u[:, :R])
                 * em.sigmoid(u[:, R:])).astype(compute_dtype)
            hbuf[:, l * P:l * P + R] = h
            hs.append(h)

        # collapsed skip accumulation: one matmul over all gate outputs
        skip = jnp.maximum(
            _dot(hbuf[...], wskip_cat[...].astype(compute_dtype), precision)
            + skipb[0].astype(jnp.float32), 0.0)
        zs = jnp.maximum(
            _dot(skip.astype(compute_dtype), out_w[...].astype(compute_dtype),
                 precision) + out_b[0].astype(jnp.float32), 0.0)
        za = _dot(zs.astype(compute_dtype), end_w[...].astype(compute_dtype),
                  precision) + end_b[0].astype(jnp.float32)

        if mode != "argmax":
            e_soft, cum_soft = em.softmax_cumsum(za)
        if mode == "argmax":
            y = jnp.argmax(za, axis=-1).astype(jnp.int32)
        elif mode == "forced":
            y = sel[j].astype(jnp.int32)
            p_seq[pl.ds(j, 1)] = em.softmax_p(e_soft, cum_soft)[None]
        else:
            if mode == "prng":
                sel_t = prng_uniform_sel(t0_ref[2] + t, B)
            else:
                sel_t = sel[j][:, None]                    # [B, 1]
            y = em.select_from_cumsum(cum_soft, sel_t, A, cfg.silence_bin)

        # materialize the residual stream x_l and persist the dilation FIFOs
        # (off the dependent chain: overlaps the output stack; must land
        # before the NEXT step's ring reads, which sequential fori semantics
        # guarantee)
        x = x0
        for l in range(L):
            if l > 0:
                x = (x.astype(jnp.float32)
                     + _dot(hs[l - 1], wres[l - 1].astype(compute_dtype),
                            precision)
                     + bres[l - 1].astype(jnp.float32)).astype(compute_dtype)
            slot, q = slots[l]
            ring[pl.ds(slot, 1), :, q:q + R] = x.astype(ring.dtype)[None]

        y_state_out[0, :] = y_cur
        y_state_out[1, :] = y
        y_out[pl.ds(j, 1)] = y[None]

    jax.lax.fori_loop(0, chunk, sample_step, 0, unroll=unroll)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        cp = pltpu.make_async_copy(ring, ring_out, dma_sem)
        cp.start()
        cp.wait()


FOLDED_ORDER = ("embed", "wprev", "wres", "bres", "g_pack", "wcur_cat",
                "wskip_cat", "fbias", "skipb", "out_w", "out_b", "end_w",
                "end_b")


def _row2d(x) -> jax.Array:
    x = jnp.asarray(x, jnp.float32)
    return x if x.ndim > 1 else x[None]


def prepare_weights(params: Dict, cfg: WaveNetConfig, prefold_cond: bool,
                    weight_dtype=jnp.float32, pack_gates: bool = False):
    """The O(L^2) weight fold + cast as a separate jittable step, returning
    the kernel operand tuple (FOLDED_ORDER).  Callers that reuse weights
    across many generate calls (the engine's chunked / streaming dispatch)
    run this ONCE per weight upload; `generate` also accepts a raw params
    dict and folds inline (single-shot tools and tests).  pack_gates must
    match the consuming builder's setting (it changes g_pack/wskip_cat row
    strides)."""
    folded = fold_params(params, cfg, prefold_cond, pack_gates)
    folded["embed"] = jnp.asarray(params["embed"], jnp.float32)
    folded["out_w"] = jnp.asarray(params["out_w"], jnp.float32)
    folded["out_b"] = _row2d(params["out_b"])
    folded["end_w"] = jnp.asarray(params["end_w"], jnp.float32)
    folded["end_b"] = _row2d(params["end_b"])
    return tuple(folded[k].astype(weight_dtype) for k in FOLDED_ORDER)


def estimate_vmem_bytes(cfg: WaveNetConfig, batch: int, chunk: int,
                        weight_bytes: int = 4, act_bytes: int = 4,
                        forced: bool = False,
                        pack_gates: bool = False) -> int:
    """VMEM plan for the fused kernel (adds the O(L^2 R^2 / 2) G stack and
    the [B, L*P] gate buffer on top of the persistent plan's common parts).
    forced=True adds the double-buffered [chunk, B, A] p_seq output."""
    L, R, S, A, B = cfg.num_layers, cfg.R, cfg.S, cfg.A, batch
    P = _row_stride(R, pack_gates)
    wb, ab = weight_bytes, act_bytes
    weights = (_padded_bytes((2 * A, R), wb)
               + _padded_bytes((L, R, 2 * R), wb)
               + _padded_bytes((L, R, R), wb)
               + _padded_bytes((L, R), wb)
               + _padded_bytes((max(P * L * (L - 1) // 2, P), 2 * R), wb)
               + _padded_bytes((R, L * 2 * R), wb)
               + _padded_bytes((L * P, S), wb)
               + _padded_bytes((L, 2 * R), wb)
               + _padded_bytes((1, S), wb)
               + _padded_bytes((S, A), wb)
               + _padded_bytes((1, A), wb)
               + _padded_bytes((A, A), wb)
               + _padded_bytes((1, A), wb))
    rows, pack, _, _ = cfg.packed_ring_plan()
    ring = _padded_bytes((rows, B, pack * R), ab)
    cond = 2 * _padded_bytes((chunk, L, B, 2 * R), ab)
    sel = 2 * _padded_bytes((chunk, B), 4)
    y = 2 * _padded_bytes((chunk, B), 4)
    hbuf = _padded_bytes((B, L * P), ab)
    p_seq = 2 * _padded_bytes((chunk, B, A), 4) if forced else 0
    work = _padded_bytes((B, 8 * R + 4 * S + 8 * A), 4)
    spill = 4 * 1024 * 1024
    return weights + ring + cond + sel + y + hbuf + p_seq + work + spill


def make_fused_generator(cfg: WaveNetConfig, batch: int, chunk: int,
                         mode: str = "sample",
                         weight_dtype=jnp.float32,
                         compute_dtype=jnp.float32,
                         interpret: bool = False,
                         unroll: int = 1,
                         fast_math: bool = False,
                         prefold_cond: bool = False,
                         pack_gates: bool = False):
    """Build a jittable collapsed-chain `generate(params, t0, cond, sel,
    ring, y_state, n_valid=None, seed=0)` with the same call signature,
    state format (init_ring) and output convention as the persistent
    generator — the engine swaps builders transparently.

    Modes: sample / argmax / prng / forced (no dump — the activation getters
    are a debug surface and use the exact kernel).

    pack_gates=True stores gate outputs at tight R-lane stride instead of
    128-aligned blocks (see _row_stride) — for R<128 it halves the dependent
    chain matmuls' K extent and the G stack's VMEM."""
    L, R, S, A = cfg.num_layers, cfg.R, cfg.S, cfg.A
    B = batch
    P = _row_stride(R, pack_gates)
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32 and not fast_math
                 else jax.lax.Precision.DEFAULT)

    _body = functools.partial(_kernel_body, cfg, batch, chunk, mode,
                              compute_dtype, precision, unroll, pack_gates)

    if interpret:
        kernel = _body     # interpret lowers through XLA: keep FMA guards
    else:
        def kernel(*refs):
            # elide anti-FMA guards inside the Mosaic body (see
            # exact_math.mosaic_guards_off; same rationale as persistent.py)
            with em.mosaic_guards_off():
                _body(*refs)

    g_rows = max(P * L * (L - 1) // 2, P)
    w_shapes = {
        "embed": (2 * A, R), "wprev": (L, R, 2 * R), "wres": (L, R, R),
        "bres": (L, R), "g_pack": (g_rows, 2 * R),
        "wcur_cat": (R, L * 2 * R), "wskip_cat": (L * P, S),
        "fbias": (L, 2 * R), "skipb": (1, S), "out_w": (S, A),
        "out_b": (1, A), "end_w": (A, A), "end_b": (1, A),
    }
    in_specs = [
        pl.BlockSpec((3,), lambda i: (0,), memory_space=pltpu.SMEM),
    ] + [
        pl.BlockSpec(w_shapes[k], (lambda nd: lambda i: (0,) * nd)(
            len(w_shapes[k])), memory_space=pltpu.VMEM)
        for k in FOLDED_ORDER
    ] + [
        pl.BlockSpec((chunk, L, B, 2 * R), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),                 # ring (HBM)
        pl.BlockSpec((2, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((chunk, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((2, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if mode == "forced":
        out_specs += [pl.BlockSpec((chunk, B, A), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]

    n_w = len(FOLDED_ORDER)
    aliases = {1 + n_w + 2: 1, 1 + n_w + 3: 2}  # ring, y_state

    def generate(params, t0, cond, sel, ring, y_state, n_valid=None,
                 seed=0):
        """params: canonical dict (folded inline) or a pre-folded operand
        tuple from `prepare_weights` (must match this builder's
        prefold_cond/weight_dtype)."""
        T = cond.shape[0]
        assert T % chunk == 0, f"T={T} must be a multiple of chunk={chunk}"
        if n_valid is None:
            n_valid = T
        weights = (prepare_weights(params, cfg, prefold_cond, weight_dtype,
                                   pack_gates)
                   if isinstance(params, dict) else tuple(params))

        out_shape = [
            jax.ShapeDtypeStruct((T, B), jnp.int32),
            jax.ShapeDtypeStruct(ring.shape, ring.dtype),
            jax.ShapeDtypeStruct((2, B), jnp.int32),
        ]
        if mode == "forced":
            out_shape += [jax.ShapeDtypeStruct((T, B, A), jnp.float32)]
        scratch = [pltpu.VMEM(ring.shape, ring.dtype),
                   pltpu.SemaphoreType.DMA(()),
                   pltpu.VMEM((B, L * P), compute_dtype)]
        return pl.pallas_call(
            kernel,
            grid=(T // chunk,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases=aliases,
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(jnp.concatenate([jnp.asarray(t0, jnp.int32).reshape((1,)),
                           jnp.asarray(n_valid, jnp.int32).reshape((1,)),
                           jnp.asarray(seed, jnp.int32).reshape((1,))]),
          *weights, cond, sel, ring, y_state)

    return generate
