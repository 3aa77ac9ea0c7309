"""Speculative exact decode (ops/speculative): the output must BIT-EQUAL
the exact path's sample-mode output for every selector stream — the draft
quality only affects speed, never the result.  The exact reference here is
the XLA scan generator (itself exact-matched to the golden model and the
Pallas kernel by the contract suite)."""

import numpy as np

import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.ops import (fused_chain, persistent, scan_generate,
                                score_parallel, speculative)

CFG = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=4)


def case(cfg, B, T, seed=11):
    rng = np.random.RandomState(seed)
    ref_w = params_lib.random_reference_weights(
        cfg, seed=seed, scale=1.0 / np.sqrt(cfg.R))
    params = {k: jnp.asarray(v)
              for k, v in params_lib.to_canonical(ref_w, cfg).items()}
    cond = rng.uniform(-1, 1, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)
    return params, cond, sel


def exact_reference(cfg, params, cond, sel):
    B = sel.shape[1]
    st = scan_generate.init_state(cfg, B)
    st, y, _ = scan_generate.generate(params, st, jnp.asarray(cond),
                                      jnp.asarray(sel), cfg)
    return np.asarray(y).T, st                                 # y [T, B]


def run_spec(cfg, params, cond, sel, K, folded_params=None, B=None,
             chunks=None):
    B = sel.shape[1] if B is None else B
    gen = speculative.make_speculative_generator(cfg, B, K, interpret=True)
    folded = fused_chain.prepare_weights(
        folded_params if folded_params is not None else params,
        cfg, prefold_cond=False)
    ring = persistent.init_ring(cfg, B)
    ys = jnp.full((2, B), cfg.silence_bin, jnp.int32)
    if chunks is None:
        chunks = [sel.shape[0]]
    outs, t0, total_rounds = [], 0, 0
    for n in chunks:
        y, ring, ys, rounds = gen(params, folded, np.array([t0]),
                                  jnp.asarray(cond[t0:t0 + n]),
                                  jnp.asarray(sel[t0:t0 + n]), ring, ys)
        outs.append(np.asarray(y))
        total_rounds += int(rounds)
        t0 += n
    return np.concatenate(outs, axis=0), ring, ys, total_rounds


def test_speculative_equals_exact():
    B, T, K = 1, 48, 8
    params, cond, sel = case(CFG, B, T)
    y_ref, _ = exact_reference(CFG, params, cond, sel)
    y, _, ys, rounds = run_spec(CFG, params, cond, sel, K)
    assert np.array_equal(y, y_ref)
    assert np.array_equal(np.asarray(ys)[1], y_ref[-1])
    # the fp32 fused draft should agree almost always -> near-minimal rounds
    assert rounds <= T // K + 2, rounds


def test_speculative_exact_even_with_garbage_draft():
    """The defining property: a BAD draft only costs rounds, never
    correctness — every round commits at least the exact correction
    token."""
    B, T, K = 2, 30, 8
    params, cond, sel = case(CFG, B, T, seed=3)
    y_ref, _ = exact_reference(CFG, params, cond, sel)
    bad = dict(params)
    bad["rs_w"] = params["rs_w"] + 0.5    # draft net computes nonsense
    y, _, _, rounds = run_spec(CFG, params, cond, sel, K, folded_params=bad)
    assert np.array_equal(y, y_ref)
    assert rounds > T // K, rounds        # corrections actually happened


def test_speculative_state_carry_and_chunking():
    """Chunked speculative calls == one exact run (carried ring/y_state),
    including a window larger than a chunk."""
    B, T, K = 3, 41, 16
    params, cond, sel = case(CFG, B, T, seed=29)
    y_ref, _ = exact_reference(CFG, params, cond, sel)
    y, ring, ys, _ = run_spec(CFG, params, cond, sel, K,
                              chunks=[10, 1, 30])
    assert np.array_equal(y, y_ref)
    # carried state must continue generation exactly: one more exact step
    gen = persistent.make_persistent_generator(CFG, B, 8, interpret=True)
    cond2 = np.random.RandomState(7).uniform(
        -1, 1, (8, CFG.num_layers, B, 2 * CFG.R)).astype(np.float32)
    sel2 = np.random.RandomState(8).uniform(0, 1, (8, B)).astype(np.float32)
    y2, _, _ = gen(params, np.array([T]), jnp.asarray(cond2),
                   jnp.asarray(sel2), ring, ys, n_valid=8)
    # reference: scan over the concatenated stream
    st = scan_generate.init_state(CFG, B)
    _, y_all, _ = scan_generate.generate(
        params, st, jnp.asarray(np.concatenate([cond, cond2])),
        jnp.asarray(np.concatenate([sel, sel2])), CFG)
    assert np.array_equal(np.asarray(y2), np.asarray(y_all).T[T:])


def test_flagship_geometry_speculative_fuzz():
    """Flagship-geometry commit-path fuzz (VERDICT r4 #8): 20L 64R/256S/256A
    maxD=512 at an odd batch — the state committer's roll-based ring
    assembly (score_parallel.make_state_committer) runs against multi-row
    lane packing and large dilations, with a perturbed draft forcing
    PARTIAL commits (the committer path) in every round.  Output and
    carried state must bit-equal the exact reference; T*B stays far inside
    any horizon."""
    cfg = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=512)
    B, T, K = 3, 22, 8
    params, cond, sel = case(cfg, B, T, seed=83)
    y_ref, _ = exact_reference(cfg, params, cond, sel)
    bad = dict(params)
    bad["rs_w"] = params["rs_w"] + 0.25   # draft disagrees -> partial commits
    y, ring, ys, rounds = run_spec(cfg, params, cond, sel, K,
                                   folded_params=bad, chunks=[9, 13])
    assert np.array_equal(y, y_ref)
    assert rounds > T // K, rounds        # partial commits actually happened
    # committed state continues generation bit-exactly
    gen = persistent.make_persistent_generator(cfg, B, 8, interpret=True)
    rng2 = np.random.RandomState(84)
    cond2 = rng2.uniform(-1, 1, (8, cfg.num_layers, B, 2 * cfg.R)
                         ).astype(np.float32)
    sel2 = rng2.uniform(0, 1, (8, B)).astype(np.float32)
    y2, _, _ = gen(params, np.array([T]), jnp.asarray(cond2),
                   jnp.asarray(sel2), ring, ys, n_valid=8)
    st = scan_generate.init_state(cfg, B)
    _, y_all, _ = scan_generate.generate(
        params, st, jnp.asarray(np.concatenate([cond, cond2])),
        jnp.asarray(np.concatenate([sel, sel2])), cfg)
    assert np.array_equal(np.asarray(y2), np.asarray(y_all).T[T:])


def run_adaptive(cfg, params, cond, sel, K, cost, folded_params=None,
                 probe_window=None):
    B = sel.shape[1]
    gen = speculative.make_adaptive_generator(
        cfg, B, K, chunk=8,
        probe_window=probe_window if probe_window is not None else K,
        cost=cost, interpret=True)
    folded = fused_chain.prepare_weights(
        folded_params if folded_params is not None else params,
        cfg, prefold_cond=False)
    ring = persistent.init_ring(cfg, B)
    ys = jnp.full((2, B), cfg.silence_bin, jnp.int32)
    y, ring, ys, rounds, branch = gen(params, folded, np.array([0]),
                                      jnp.asarray(cond), jnp.asarray(sel),
                                      ring, ys)
    return np.asarray(y), ring, ys, int(rounds), int(branch)


def test_adaptive_every_branch_is_exact():
    """The ADAPTIVE tier (VERDICT r4 #2): whatever branch the on-device cost
    model picks — keep the window, shrink it, or fall back to the exact
    kernel — the output and carried state bit-equal the exact reference.
    Each branch is forced via the cost model (it steers speed only)."""
    B, T, K = 2, 56, 8
    params, cond, sel = case(CFG, B, T, seed=41)
    y_ref, _ = exact_reference(CFG, params, cond, sel)
    forced = {0: (0.001, 0.001, 1e9),     # spec @ K practically free
              2: (1e9, 1e9, 0.001)}       # exact kernel practically free
    for want_branch, cost in forced.items():
        y, ring, ys, rounds, branch = run_adaptive(CFG, params, cond, sel,
                                                   K, cost)
        assert branch == want_branch, (want_branch, branch)
        assert np.array_equal(y, y_ref), f"branch {branch} output mismatch"
        # committed state continues generation bit-exactly on every branch
        gen = persistent.make_persistent_generator(CFG, B, 8, interpret=True)
        cond2 = np.random.RandomState(9).uniform(
            -1, 1, (8, CFG.num_layers, B, 2 * CFG.R)).astype(np.float32)
        sel2 = np.random.RandomState(10).uniform(0, 1, (8, B)
                                                 ).astype(np.float32)
        y2, _, _ = gen(params, np.array([T]), jnp.asarray(cond2),
                       jnp.asarray(sel2), ring, ys, n_valid=8)
        st = scan_generate.init_state(CFG, B)
        _, y_all, _ = scan_generate.generate(
            params, st, jnp.asarray(np.concatenate([cond, cond2])),
            jnp.asarray(np.concatenate([sel, sel2])), CFG)
        assert np.array_equal(np.asarray(y2), np.asarray(y_all).T[T:])


def test_adaptive_garbage_draft_falls_back_to_exact():
    """The serving property the fixed tier lacked (`hw_r04.log` H1): when
    the draft's committed runs collapse (trained/peaked weights — modeled
    here by a garbage draft), the probe detects it and the remainder runs
    on the exact kernel (branch 2) under the REALISTIC default cost model —
    output still bit-exact."""
    B, T, K = 1, 56, 8
    params, cond, sel = case(CFG, B, T, seed=43)
    y_ref, _ = exact_reference(CFG, params, cond, sel)
    bad = dict(params)
    bad["rs_w"] = params["rs_w"] + 0.5
    y, _, _, rounds, branch = run_adaptive(CFG, params, cond, sel, K,
                                           speculative.DEFAULT_COST,
                                           folded_params=bad)
    assert branch == 2, branch            # drafting doesn't pay -> exact
    assert np.array_equal(y, y_ref)


def test_adaptive_good_draft_keeps_window():
    """Cold/flat weights (the fp32 draft agrees ~always): the probe
    measures saturated committed runs and keeps the speculative window
    under the default cost model — the +9.5% b=1 regime is preserved."""
    B, T, K = 1, 120, 16
    params, cond, sel = case(CFG, B, T, seed=47)
    y_ref, _ = exact_reference(CFG, params, cond, sel)
    y, _, _, rounds, branch = run_adaptive(CFG, params, cond, sel, K,
                                           (145.0, 7.34, 200.0))
    # exact per-step cost far above the speculative round cost -> window
    assert branch == 0, branch
    assert np.array_equal(y, y_ref)


def test_engine_run_speculative_adaptive_bitmatches_run():
    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer

    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    B, T = 2, 96
    rng = np.random.RandomState(53)
    ref_w = params_lib.random_reference_weights(cfg, seed=53,
                                                scale=1.0 / np.sqrt(cfg.R))
    cond = rng.uniform(-1, 1, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)
    eng = WaveNetInfer(num_layers=cfg.num_layers,
                       max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                       A=cfg.A, max_batch=B, implementation=Impl.PERSISTENT,
                       chunk_size=8, interpret=True)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, sel)
    y_run = eng.run(T, B)
    eng.set_inputs(cond, sel)
    y_ad = eng.run_speculative(T, B, window=8)     # adaptive default
    assert eng.spec_branch is not None             # probe actually ran
    assert np.array_equal(y_ad, y_run)
    # fixed tier unchanged
    eng.set_inputs(cond, sel)
    y_fx = eng.run_speculative(T, B, window=8, adaptive=False)
    assert eng.spec_branch is None
    assert np.array_equal(y_fx, y_run)


def test_engine_run_speculative_bitmatches_run():
    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer

    B, T = 2, 40
    ref_w = params_lib.random_reference_weights(
        CFG, seed=77, scale=1.0 / np.sqrt(CFG.R))
    rng = np.random.RandomState(4)
    cond = rng.uniform(-1, 1, (T, CFG.num_layers, B, 2 * CFG.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)
    eng = WaveNetInfer(num_layers=CFG.num_layers,
                       max_dilation=CFG.max_dilation, R=CFG.R, S=CFG.S,
                       A=CFG.A, max_batch=B, implementation=Impl.PERSISTENT,
                       chunk_size=8)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, sel)
    y_exact = eng.run(T, B)
    y_spec = eng.run_speculative(T, B, window=8)
    assert np.array_equal(y_spec, y_exact)
    assert eng.spec_rounds >= 1


def test_speculative_window_exceeds_T():
    B, T, K = 1, 10, 16
    params, cond, sel = case(CFG, B, T, seed=5)
    y_ref, _ = exact_reference(CFG, params, cond, sel)
    y, _, _, _ = run_spec(CFG, params, cond, sel, K)
    assert np.array_equal(y, y_ref)


def test_engine_run_speculative_bf16_weights_bitmatches_run():
    """The bit-match contract extends to the deterministic bf16-weights
    tier: the verify scorer receives the engine's weight-dtype-rounded
    params, so it computes with the SAME weights the bf16 kernel does."""
    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer

    B, T = 2, 32
    ref_w = params_lib.random_reference_weights(
        CFG, seed=13, scale=1.0 / np.sqrt(CFG.R))
    rng = np.random.RandomState(6)
    cond = rng.uniform(-1, 1, (T, CFG.num_layers, B, 2 * CFG.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)
    eng = WaveNetInfer(num_layers=CFG.num_layers,
                       max_dilation=CFG.max_dilation, R=CFG.R, S=CFG.S,
                       A=CFG.A, max_batch=B, implementation=Impl.PERSISTENT,
                       chunk_size=8, weight_dtype=jnp.bfloat16)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, sel)
    y_exact = eng.run(T, B)
    eng.set_inputs(cond, sel)
    y_spec = eng.run_speculative(T, B, window=8)
    assert np.array_equal(y_spec, y_exact)


def test_engine_run_speculative_rejects_tv_bounded_engines():
    """run_speculative's contract is bit-match-vs-run(): undefined when
    run() itself is TV-bounded (fast_math / fuse_chain / priority)."""
    import pytest

    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer

    B, T = 1, 16
    ref_w = params_lib.random_reference_weights(
        CFG, seed=13, scale=1.0 / np.sqrt(CFG.R))
    rng = np.random.RandomState(6)
    cond = rng.uniform(-1, 1, (T, CFG.num_layers, B, 2 * CFG.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)
    for kw in ({"fast_math": True}, {"fuse_chain": True},
               {"priority": "latency"}):
        eng = WaveNetInfer(num_layers=CFG.num_layers,
                           max_dilation=CFG.max_dilation, R=CFG.R, S=CFG.S,
                           A=CFG.A, max_batch=B,
                           implementation=Impl.PERSISTENT, chunk_size=8,
                           **kw)
        eng.set_reference_weights(ref_w)
        eng.set_inputs(cond, sel)
        with pytest.raises(ValueError, match="deterministic"):
            eng.run_speculative(T, B, window=8)


def test_engine_run_speculative_rejects_overlength_request():
    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer

    B, T = 1, 16
    ref_w = params_lib.random_reference_weights(
        CFG, seed=13, scale=1.0 / np.sqrt(CFG.R))
    rng = np.random.RandomState(6)
    cond = rng.uniform(-1, 1, (T, CFG.num_layers, B, 2 * CFG.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)
    eng = WaveNetInfer(num_layers=CFG.num_layers,
                       max_dilation=CFG.max_dilation, R=CFG.R, S=CFG.S,
                       A=CFG.A, max_batch=B, implementation=Impl.PERSISTENT,
                       chunk_size=8)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, sel)
    import pytest
    with pytest.raises(ValueError, match="conditioning"):
        eng.run_speculative(2 * T, B, window=8)
