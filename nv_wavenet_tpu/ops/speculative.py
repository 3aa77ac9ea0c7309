"""Speculative EXACT decode: the exact-match contract's output, faster than
the exact kernel, by drafting with the collapsed-chain fast kernel and
verifying with the time-parallel exact scorer.

The exact-match contract (BASELINE.md, `nv_wavenet_test.cu:302-304`) makes
sampling DETERMINISTIC given the injected selector stream: step t's output
is y*_t = select(p_t, sel_t) with p_t the exact fp32 distribution.  That
determinism is what speculative decoding needs:

  1. DRAFT a K-step window with the fused fast kernel (ops/fused_chain,
     fast_math — ~1.3-2x the exact kernel's rate, TV ~5e-3 from exact)
     using the SAME injected selectors the exact kernel would consume,
  2. VERIFY the window in ONE time-parallel pass of the exact scorer
     (ops/score_parallel): teacher-forcing the drafted symbols yields every
     step's EXACT p_t ([K*B, C] MXU matmuls — cheap next to the draft),
     from which the exact choices y*_t = select(p_t, sel_t) follow,
  3. COMMIT the longest prefix where draft == exact plus the first
     correction token (y*_t at the first disagreement IS what the exact
     kernel would have emitted, because positions <= t were exact), via the
     scorer's n_valid state commit.  Repeat from there.

The output is therefore BIT-IDENTICAL to the exact kernel's, by
construction, for every selector stream — not distribution-close: the
draft only decides how much verification work is wasted.  Expected steps
per round ~ 1/flip_rate where flip_rate = P(selector lands inside the
draft-vs-exact probability gap) ~ the draft tier's TV (~5e-3 measured) —
so windows commit nearly whole and the rate approaches the draft tier's.

No reference analog (the reference has no fast decode to draft with); the
TPU-idiomatic structure is one jitted `lax.while_loop` whose body runs the
draft Pallas kernel, the XLA verify pass and the state commit entirely
on-device — zero host round trips until the final fetch.

This is a LATENCY-tier feature: disagreements are per-(step, row), and a
whole batch commits in lockstep at the first disagreement of ANY row, so
the speedup decays with batch (b=1 loses ~TV per step, b=16 ~16*TV).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.ops import exact_math as em
from nv_wavenet_tpu.ops import fused_chain, persistent, score_parallel

# Default cost-model constants for the ADAPTIVE tier (flagship 20L 64R/256S
# b=1 on TPU v5e, BASELINE.md speculative + headline tables):
#   speculative round cost ~ V0 + V1 * window  [us]  (draft + verify + commit)
#   exact kernel per-step cost E0              [us]
# Overridable per-engine (`WaveNetInfer.spec_cost_model`) — they steer only
# WHICH equally-exact branch runs, never the output.
DEFAULT_COST = (145.0, 7.34, 8.66)   # (V0_us, V1_us, E0_us)


def select_window(za_seq: jax.Array, sel: jax.Array,
                  silence_bin: int) -> jax.Array:
    """Vectorized inverse-CDF selection over a window: za_seq [T, B, A]
    logits, sel [T, B] -> y [T, B] int32.  Delegates to the ONE
    contract-critical sampler (`exact_math.sample_from_logits`): its
    softmax/prefix-sum ops run along the last axis, so rows of the [T*B, A]
    reshape see the identical per-row op sequence as the per-step kernels —
    bit-identical selections with a single implementation to keep in
    float-association lockstep."""
    T, B = sel.shape
    A = za_seq.shape[-1]
    return em.sample_from_logits(za_seq.reshape(T * B, A),
                                 sel.reshape(T * B, 1),
                                 silence_bin).reshape(T, B)


def make_speculative_generator(cfg: WaveNetConfig, batch: int, window: int,
                               draft_fast_math: bool = True,
                               draft_compute_dtype=jnp.float32,
                               draft_pack_gates: bool = False,
                               interpret: bool = False):
    """Build `generate(params, folded, t0, cond, sel, ring, y_state)` ->
    (y [T, B] int32, ring', y_state', rounds).

    params: canonical dict (exact verify path); folded: the draft kernel's
    pre-folded operand tuple from `fused_chain.prepare_weights(params, cfg,
    prefold_cond=False, pack_gates=draft_pack_gates)` — computed once per
    weight upload by callers.  cond [T, L, B, 2R] raw (NOT prefolded),
    sel [T, B] injected selectors, ring/y_state as the other generators.
    T must be >= 1; `window` = K is the draft length per round.

    Output contract: y bit-equals the exact persistent kernel's sample-mode
    output for the same inputs (tests/test_speculative.py), and ring'/
    y_state' bit-equal its carried state — chunked calls compose.  `rounds`
    is the number of draft-verify rounds taken (T / rounds ~ the average
    committed run length; the efficiency diagnostic).
    """
    K = window
    B = batch

    draft_gen = fused_chain.make_fused_generator(
        cfg, batch, K, mode="sample", fast_math=draft_fast_math,
        compute_dtype=draft_compute_dtype, prefold_cond=False,
        pack_gates=draft_pack_gates, interpret=interpret)
    scorer = score_parallel.make_parallel_scorer(cfg, batch,
                                                 prefold_cond=False,
                                                 return_xt=True,
                                                 return_za=True)
    committer = score_parallel.make_state_committer(cfg)

    def generate(params: Dict, folded, t0, cond, sel, ring, y_state):
        T = cond.shape[0]
        t0 = jnp.asarray(t0, jnp.int32).reshape(())
        # pad so the final round's K-slice never clamps; drafted steps past
        # T are discarded and the commit clamps state to exactly T steps
        cond_p = jnp.pad(jnp.asarray(cond, jnp.float32),
                         ((0, K), (0, 0), (0, 0), (0, 0)))
        sel_p = jnp.pad(jnp.asarray(sel, jnp.float32), ((0, K), (0, 0)))
        out0 = jnp.zeros((T + K, B), jnp.int32)

        def cond_fn(c):
            return c[1] < T

        def body(c):
            t_rel, n_out, ring, ys, out, rounds = c
            t_abs = t0 + t_rel
            cond_k = jax.lax.dynamic_slice_in_dim(cond_p, t_rel, K, axis=0)
            sel_k = jax.lax.dynamic_slice_in_dim(sel_p, t_rel, K, axis=0)

            y_d, _, _ = draft_gen(folded, t_abs[None], cond_k, sel_k,
                                  ring, ys)                       # [K, B]
            _, ring_v, ys_v, xt, za_seq = scorer(params, t_abs, cond_k, y_d,
                                                 ring, ys)
            y_ex = select_window(za_seq, sel_k, cfg.silence_bin)
            # the committed window is y_ex itself: where the draft agreed
            # y_ex == y_d, and at the first disagreement y_ex IS the exact
            # kernel's choice (all inputs to step t are exact for t <= first)
            agree = jnp.all(y_d == y_ex, axis=1)                  # [K]
            any_dis = jnp.logical_not(jnp.all(agree))
            first = jnp.argmax(jnp.logical_not(agree))            # 0 if none
            n_emit = jnp.where(any_dis, first + 1, K)
            n_emit = jnp.minimum(n_emit, T - n_out)

            full = jnp.logical_and(jnp.logical_not(any_dis), n_emit == K)

            def fast(_):
                # whole window committed: the verify pass's state IS the
                # state after K steps of the exact trajectory
                return ring_v, ys_v

            def slow(_):
                # partial commit: assemble the state at n_emit from the
                # verify pass's OWN activations (activations at positions
                # < n_emit only depend on symbols before them, which the
                # draft got right) — no second scorer pass; the layer GEMMs
                # were the dominant per-round cost at batch
                return committer(ring, xt, y_ex, ys, t_abs, n_emit)

            ring2, ys2 = jax.lax.cond(full, fast, slow, None)
            out = jax.lax.dynamic_update_slice(out, y_ex, (n_out, 0))
            return (t_rel + n_emit, n_out + n_emit, ring2, ys2, out,
                    rounds + 1)

        init = (jnp.int32(0), jnp.int32(0), ring, y_state, out0,
                jnp.int32(0))
        _, _, ring, ys, out, rounds = jax.lax.while_loop(cond_fn, body, init)
        return out[:T], ring, ys, rounds

    return generate


def expected_commit(K, r):
    """E[committed samples per round] at window K when draft-vs-exact flips
    are ~iid with mean run length r (geometric): r * (1 - e^{-K/r}),
    computed as r * (-expm1(-K/r)) — the naive form cancels to 0 in fp32
    for saturated r (huge r makes exp(-K/r) round to exactly 1.0).
    Heuristic control math (native expm1/divide are fine — this steers
    WHICH equally-exact branch runs, never the output)."""
    r = jnp.maximum(r, jnp.float32(1.0))
    return r * (-jnp.expm1(-jnp.float32(K) / r))


def invert_commit(K, c):
    """Estimate the mean run length r from a MEASURED commits-per-round c at
    window K (inverse of `expected_commit`, 3 fixed-point sweeps); saturated
    measurements (c ~ K: the draft never missed) map to 'very large'."""
    c = jnp.maximum(jnp.minimum(c, jnp.float32(K) * 0.999), jnp.float32(1.0))
    r = c
    for _ in range(3):
        r = c / (-jnp.expm1(-jnp.float32(K) / jnp.maximum(r, 1e-3)))
    return jnp.where(c >= 0.95 * K, jnp.float32(1e9), r)


def make_adaptive_generator(cfg: WaveNetConfig, batch: int, window: int,
                            chunk: int = 64,
                            probe_window: int = 64,
                            cost=DEFAULT_COST,
                            interpret: bool = False):
    """SELF-GOVERNING speculative exact decode (VERDICT r4 #2): the engine,
    not the caller, decides whether drafting pays — the AUTO-heuristic idea
    of the reference (`nv_wavenet.cuh:502-509`) applied to decode tiers.

    One jitted program, zero host round trips: a short PROBE (a few
    speculative rounds at a small window) measures the draft's committed-run
    length ON DEVICE, a cost model turns it into per-branch rate estimates,
    and `lax.switch` runs the remainder on the fastest of
      {speculative @ window, speculative @ window/2, the exact kernel}.
    Every branch emits the SAME bit-exact output (probe included — committed
    samples are exact by the speculative contract), so the decision affects
    only speed: trained checkpoints whose drafts flip every ~35 steps fall
    back to the exact kernel (within probe cost, ~2-3%, of running it
    outright — vs the 2x loss of blind speculation, `hw_r04.log` H1), while
    cold/flat distributions keep the speculative win.

    `cost` = (V0_us, V1_us, E0_us): speculative round cost ~ V0 + V1*K,
    exact per-step cost E0 (defaults measured on flagship b=1, BASELINE.md).

    Returns generate(params, folded, t0, cond, sel, ring, y_state) ->
    (y [T, B], ring', y_state', rounds, branch) with branch 0=window,
    1=window/2, 2=exact-fallback (-1 when T was too short to probe).
    """
    K = window
    B = batch
    Kp = min(probe_window, K)
    Tp = 4 * Kp                       # ~4+ probe rounds
    V0, V1, E0 = [jnp.float32(v) for v in cost]

    spec_probe = (make_speculative_generator(cfg, B, Kp, interpret=interpret)
                  if Kp != K else None)
    spec_full = make_speculative_generator(cfg, B, K, interpret=interpret)
    spec_half = make_speculative_generator(cfg, B, max(K // 2, 1),
                                           interpret=interpret)
    exact_gen = persistent.make_persistent_generator(
        cfg, B, chunk, mode="sample", prefold_cond=False,
        interpret=interpret)

    def generate(params: Dict, folded, t0, cond, sel, ring, y_state):
        T = cond.shape[0]
        t0 = jnp.asarray(t0, jnp.int32).reshape((1,))
        if T <= Tp + K:
            # too short to amortize a probe: plain speculative
            y, ring, ys, rounds = spec_full(params, folded, t0, cond, sel,
                                            ring, y_state)
            return y, ring, ys, rounds, jnp.int32(-1)

        probe = spec_probe or spec_full
        y1, ring, ys, rounds1 = probe(params, folded, t0, cond[:Tp],
                                      sel[:Tp], ring, y_state)
        commit = jnp.float32(Tp) / jnp.maximum(rounds1, 1).astype(jnp.float32)
        r_hat = invert_commit(Kp, commit)

        def spec_rate(Kb):
            return expected_commit(Kb, r_hat) / (V0 + V1 * jnp.float32(Kb))

        rates = jnp.stack([spec_rate(K), spec_rate(max(K // 2, 1)),
                           jnp.float32(1.0) / E0])
        branch = jnp.argmax(rates).astype(jnp.int32)

        T2 = T - Tp
        cond2, sel2 = cond[Tp:], sel[Tp:]
        t1 = t0 + jnp.int32(Tp)

        def b_full(ring, ys):
            return spec_full(params, folded, t1, cond2, sel2, ring, ys)

        def b_half(ring, ys):
            return spec_half(params, folded, t1, cond2, sel2, ring, ys)

        def b_exact(ring, ys):
            pad = (-T2) % chunk
            cond_p = jnp.pad(jnp.asarray(cond2, jnp.float32),
                             ((0, pad), (0, 0), (0, 0), (0, 0)))
            sel_p = jnp.pad(jnp.asarray(sel2, jnp.float32), ((0, pad), (0, 0)))
            y, ring, ys = exact_gen(params, t1, cond_p, sel_p, ring, ys,
                                    n_valid=T2)
            return y[:T2], ring, ys, jnp.int32(0)

        y2, ring, ys, rounds2 = jax.lax.switch(
            branch, [b_full, b_half, b_exact], ring, ys)
        return (jnp.concatenate([y1, y2], axis=0), ring, ys,
                rounds1 + rounds2, branch)

    return generate
