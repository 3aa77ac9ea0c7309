"""Collapsed-chain ("fused") fast-decode kernel correctness
(`ops/fused_chain.py`).

The fused kernel folds the residual-stream algebra into precomputed weights
(G_l = [Wres_j Wcur_l]_j), shortening the dependent per-sample matmul chain
from 2L+3 to ~L+5.  The fold reassociates fp32 sums, so this mode is
governed by the teacher-forced DISTRIBUTION contract (the same methodology
as the bf16/fast_math paths, see tests/test_low_precision.py), not the
bit-exact contract.  Measured fp32 fold error on the hot case is ~5e-6 TV;
the bounds below are ~100x that, and a math/order bug puts TV near 1.

There is no reference analog (the reference has no fast decode mode); the
closest mechanism is its --use_fast_math build
(`/root/reference/Makefile:30-35`) whose correctness bar is p@1e-3
(`/root/reference/nv_wavenet_test.cu:296-298`).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer
from nv_wavenet_tpu.ops import fused_chain, persistent, scan_generate

from tests.test_low_precision import (CFG, free_run_forced, hot_case,
                                      scan_forced_probs, tv)


def fused_forced_probs(cfg, params, cond, forced, batch, **gen_kw):
    T = cond.shape[0]
    gen = fused_chain.make_fused_generator(cfg, batch, 8, mode="forced",
                                           interpret=True, **gen_kw)
    ring = persistent.init_ring(cfg, batch)
    y_state = jnp.full((2, batch), cfg.silence_bin, jnp.int32)
    out = gen(params, np.array([0]), jnp.asarray(cond),
              jnp.asarray(forced.astype(np.float32)), ring, y_state,
              n_valid=T)
    assert np.array_equal(np.asarray(out[0]), forced), "forced echo failed"
    p = np.asarray(out[-1], np.float64)
    return p / p.sum(-1, keepdims=True)


@pytest.fixture(scope="module")
def fused_case():
    B, T = 8, 64
    params, cond, sel, _ = hot_case(CFG, B, T, seed=7)
    forced = free_run_forced(CFG, params, cond, sel)[:T]
    p32 = scan_forced_probs(CFG, params, cond, sel, forced,
                            jnp.float32)[:T]
    return params, cond[:T], sel[:T], forced, p32


def test_fused_forced_distribution_matches_fp32(fused_case):
    """fp32 fused kernel: per-step probabilities match the exact fp32 path to
    reassociation-level error (TV ~5e-6 measured; bound 100x)."""
    params, cond, sel, forced, p32 = fused_case
    p_f = fused_forced_probs(CFG, params, cond, forced, 8)
    t = tv(p32, p_f)
    assert t.max() < 5e-4, f"max TV {t.max():.2e}"
    assert np.abs(p_f - p32).max() < 5e-4


def test_fused_free_run_agrees_with_scan(fused_case):
    """Free-running fused generation follows the exact-path trajectory (the
    fold error is far below selector-gap scale on this case)."""
    params, cond, sel, forced, _ = fused_case
    B, T = 8, cond.shape[0]
    gen = fused_chain.make_fused_generator(CFG, B, 8, interpret=True)
    ys = jnp.full((2, B), CFG.silence_bin, jnp.int32)
    out = gen(params, np.array([0]), jnp.asarray(cond), jnp.asarray(sel),
              persistent.init_ring(CFG, B), ys, n_valid=T)
    agree = np.mean(np.asarray(out[0]) == forced)
    assert agree >= 0.99, f"free-run agreement {agree:.3f}"


def test_fused_argmax_matches_scan(fused_case):
    params, cond, sel, forced, _ = fused_case
    B, T = 8, cond.shape[0]
    gen = fused_chain.make_fused_generator(CFG, B, 8, mode="argmax",
                                           interpret=True)
    ys = jnp.full((2, B), CFG.silence_bin, jnp.int32)
    out = gen(params, np.array([0]), jnp.asarray(cond), jnp.asarray(sel),
              persistent.init_ring(CFG, B), ys, n_valid=T)
    st = scan_generate.init_state(CFG, B)
    _, y_am, _ = scan_generate.generate(params, st, jnp.asarray(cond),
                                        jnp.asarray(sel), CFG, mode="argmax")
    agree = np.mean(np.asarray(out[0]) == np.asarray(y_am).T)
    assert agree >= 0.99, f"argmax agreement {agree:.3f}"


def test_fused_bf16_weights_distribution(fused_case):
    """bf16 weight storage of the FOLDED tensors meets the same distribution
    bounds as the standard kernel's bf16-weights mode."""
    params, cond, sel, forced, p32 = fused_case
    p_bf = fused_forced_probs(CFG, params, cond, forced, 8,
                              weight_dtype=jnp.bfloat16)
    t = tv(p32, p_bf)
    msg = f"mean TV {t.mean():.5f} max {t.max():.5f}"
    assert t.mean() < 0.02 and t.max() < 0.15, msg


def test_fused_ragged_chunk_state_carry(fused_case):
    """Ragged run boundaries: generating 24 then 40 samples through carried
    ring/y_state equals one 64-sample run (n_valid masking + ring DMA)."""
    params, cond, sel, forced, _ = fused_case
    B, T = 8, cond.shape[0]
    gen = fused_chain.make_fused_generator(CFG, B, 8, interpret=True)
    ys0 = jnp.full((2, B), CFG.silence_bin, jnp.int32)

    out_full = gen(params, np.array([0]), jnp.asarray(cond),
                   jnp.asarray(sel), persistent.init_ring(CFG, B), ys0,
                   n_valid=T)
    y_full = np.asarray(out_full[0])

    t_split = 24
    ring, ys = persistent.init_ring(CFG, B), ys0
    c1 = jnp.pad(jnp.asarray(cond[:t_split]), ((0, 8 - t_split % 8),
                                               (0, 0), (0, 0), (0, 0)))
    s1 = jnp.pad(jnp.asarray(sel[:t_split]), ((0, 8 - t_split % 8), (0, 0)))
    out1 = gen(params, np.array([0]), c1, s1, ring, ys, n_valid=t_split)
    y1, ring, ys = np.asarray(out1[0])[:t_split], out1[1], out1[2]
    out2 = gen(params, np.array([t_split]), jnp.asarray(cond[t_split:]),
               jnp.asarray(sel[t_split:]), ring, ys, n_valid=T - t_split)
    y2 = np.asarray(out2[0])
    assert np.array_equal(np.concatenate([y1, y2], 0), y_full)


def test_engine_fuse_chain_flag(fused_case):
    """WaveNetInfer(fuse_chain=True) routes PERSISTENT runs through the
    fused kernel and stays on the exact kernel for dump runs; outputs agree
    with the exact engine on this case."""
    params, cond, sel, forced, _ = fused_case
    B, T = 8, cond.shape[0]

    def mk(fused):
        eng = WaveNetInfer(num_layers=CFG.num_layers,
                           max_dilation=CFG.max_dilation, R=CFG.R, S=CFG.S,
                           A=CFG.A, max_batch=B,
                           implementation=Impl.PERSISTENT, chunk_size=8,
                           fuse_chain=fused)
        eng.set_canonical_params({k: np.asarray(v)
                                  for k, v in params.items()})
        eng.set_inputs(np.asarray(cond), np.asarray(sel))
        return eng

    y_exact = mk(False).run(T, B)
    eng_f = mk(True)
    y_fused = eng_f.run(T, B)
    agree = np.mean(y_exact == y_fused)
    assert agree >= 0.99, f"engine fused agreement {agree:.3f}"
    # dump runs fall back to the exact kernel (getter surface) and match the
    # exact path bit-for-bit
    y_dump = eng_f.run(T, B, dump_activations=True)
    assert np.array_equal(y_dump, y_exact)
    assert eng_f.get_p().shape == (B, CFG.A)


def test_fuse_chain_vmem_fallback(fused_case):
    """When the fused plan exceeds the VMEM budget but the persistent plan
    fits, fuse_chain must fall back to the exact kernel (and generate
    correctly) rather than routing to a kernel whose compile would overflow
    VMEM."""
    from nv_wavenet_tpu.ops import fused_chain, persistent

    params, cond, sel, forced, _ = fused_case
    B, T = 8, cond.shape[0]
    eng = WaveNetInfer(num_layers=CFG.num_layers,
                       max_dilation=CFG.max_dilation, R=CFG.R, S=CFG.S,
                       A=CFG.A, max_batch=B, implementation=Impl.AUTO,
                       chunk_size=8, fuse_chain=True)
    need_p = persistent.estimate_vmem_bytes(CFG, B, chunk=8)
    need_f = fused_chain.estimate_vmem_bytes(CFG, B, chunk=8)
    assert need_f > need_p   # the G stack costs something even at 6L/32R
    eng.vmem_budget = (need_p + need_f) // 2   # persistent fits, fused not
    assert not eng._fuse_active(B, stream=False, dump=False)
    assert eng._resolve_impl(B) == Impl.PERSISTENT
    eng.set_canonical_params({k: np.asarray(v) for k, v in params.items()})
    eng.set_inputs(np.asarray(cond), np.asarray(sel))
    y = eng.run(T, B)

    exact = WaveNetInfer(num_layers=CFG.num_layers,
                         max_dilation=CFG.max_dilation, R=CFG.R, S=CFG.S,
                         A=CFG.A, max_batch=B,
                         implementation=Impl.PERSISTENT, chunk_size=8)
    exact.set_canonical_params({k: np.asarray(v) for k, v in params.items()})
    exact.set_inputs(np.asarray(cond), np.asarray(sel))
    assert np.array_equal(y, exact.run(T, B))   # exact-kernel fallback


def test_mesh_engine_fused(fused_case):
    """fuse_chain under a 4-device mesh: batch shards, fused kernel per
    shard; output agrees with the single-device fused engine."""
    from nv_wavenet_tpu.parallel import mesh as mesh_lib

    params, cond, sel, forced, _ = fused_case
    B, T = 8, cond.shape[0]

    def mk(mesh):
        eng = WaveNetInfer(num_layers=CFG.num_layers,
                           max_dilation=CFG.max_dilation, R=CFG.R, S=CFG.S,
                           A=CFG.A, max_batch=B,
                           implementation=Impl.PERSISTENT, chunk_size=8,
                           fuse_chain=True, mesh=mesh)
        eng.set_canonical_params({k: np.asarray(v)
                                  for k, v in params.items()})
        eng.set_inputs(np.asarray(cond), np.asarray(sel))
        return eng

    y_single = mk(None).run(T, B)
    y_mesh = mk(mesh_lib.data_mesh(4)).run(T, B)
    assert np.array_equal(y_single, y_mesh)


def test_fused_streaming_feed(fused_case):
    """begin_stream/feed through the fused kernel: ragged chunks equal the
    fused full run (carried ring/y_state through the shared dispatch)."""
    params, cond, sel, forced, _ = fused_case
    B, T = 8, cond.shape[0]

    eng = WaveNetInfer(num_layers=CFG.num_layers,
                       max_dilation=CFG.max_dilation, R=CFG.R, S=CFG.S,
                       A=CFG.A, max_batch=B, implementation=Impl.PERSISTENT,
                       chunk_size=8, fuse_chain=True)
    eng.set_canonical_params({k: np.asarray(v) for k, v in params.items()})
    eng.set_inputs(np.asarray(cond), np.asarray(sel))
    y_full = eng.run(T, B)

    eng.begin_stream(B)
    outs, off = [], 0
    for n in (13, 6, 45):
        outs.append(eng.feed(np.asarray(cond[off:off + n]),
                             np.asarray(sel[off:off + n])))
        off += n
    y_feed = np.concatenate(outs, axis=1)
    assert np.array_equal(y_feed, y_full)


def test_priority_latency_selects_fused_fast_math(fused_case):
    """priority="latency" is sugar for the measured-fastest decode tier
    (fuse_chain + fast_math, BASELINE.md fast-tier table): it must produce
    the IDENTICAL integer sequence to an engine with those knobs set
    explicitly (same kernels, deterministic), and priority=None/"exact"
    must leave the exact path untouched.  Dump dispatches under the
    priority tier drop BOTH priority-set knobs (fused kernel AND
    fast_math), so the activation getters read the exact kernel's values
    and the dump trajectory bit-matches the default engine's."""
    params, cond, sel, forced, _ = fused_case
    B, T = 8, cond.shape[0]

    def mk(**kw):
        eng = WaveNetInfer(num_layers=CFG.num_layers,
                           max_dilation=CFG.max_dilation, R=CFG.R, S=CFG.S,
                           A=CFG.A, max_batch=B,
                           implementation=Impl.PERSISTENT, chunk_size=8,
                           **kw)
        eng.set_canonical_params({k: np.asarray(v)
                                  for k, v in params.items()})
        eng.set_inputs(np.asarray(cond), np.asarray(sel))
        return eng

    eng_p = mk(priority="latency")
    assert eng_p.fuse_chain and eng_p.fast_math
    assert np.array_equal(eng_p.run(T, B),
                          mk(fuse_chain=True, fast_math=True).run(T, B))
    # "exact"/None change nothing: bit-identical to the default engine
    assert not mk(priority="exact").fuse_chain
    y_exact = mk().run(T, B)
    assert np.array_equal(mk(priority="exact").run(T, B), y_exact)
    # dump dispatches drop the priority-set fast_math too (ADVICE r3): the
    # dump run is the EXACT kernel — same integers and same p as a default
    # engine's dump run
    eng_d = mk(priority="latency")
    assert not eng_d._effective_fast_math(dump=True)
    assert eng_d._effective_fast_math(dump=False)
    y_dump = eng_d.run(T, B, dump_activations=True)
    assert np.array_equal(y_dump, y_exact)
    eng_ref = mk()
    eng_ref.run(T, B, dump_activations=True)
    assert np.array_equal(eng_d.get_p(), eng_ref.get_p())
    # an EXPLICIT fast_math is the caller's choice and stays on dump runs
    assert mk(priority="latency",
              fast_math=True)._effective_fast_math(dump=True)
    with pytest.raises(ValueError):
        mk(priority="throughput")


@pytest.mark.parametrize("pack", [False, True])
@pytest.mark.parametrize("R,S,L,maxd", [(64, 128, 5, 4), (128, 128, 3, 2)])
def test_fused_geometries(R, S, L, maxd, pack):
    """Row-stride paths: R=64 (P=128, 64 pad rows per block) and R=128
    (P=128, no pad), each with and without tight gate packing (pack_gates:
    P=R; for R=128 it's the identity layout).  Free-run agreement vs the
    scan on tiny cases."""
    cfg = WaveNetConfig(num_layers=L, R=R, S=S, A=256, max_dilation=maxd)
    B, T = 2, 24
    params, cond, sel, _ = hot_case(cfg, B, T, seed=17)
    gen = fused_chain.make_fused_generator(cfg, B, 8, interpret=True,
                                           pack_gates=pack)
    ys = jnp.full((2, B), cfg.silence_bin, jnp.int32)
    out = gen(params, np.array([0]), jnp.asarray(cond), jnp.asarray(sel),
              persistent.init_ring(cfg, B), ys, n_valid=T)
    st = scan_generate.init_state(cfg, B)
    _, y_scan, _ = scan_generate.generate(params, st, jnp.asarray(cond),
                                          jnp.asarray(sel), cfg)
    agree = np.mean(np.asarray(out[0]) == np.asarray(y_scan).T)
    assert agree >= 0.99, f"R={R} pack={pack} agreement {agree:.3f}"


def test_fused_pack_gates_distribution(fused_case):
    """pack_gates (tight R-lane gate packing): per-step probabilities stay
    at reassociation-level error vs the exact fp32 path — dropping the
    zero pad rows removes exact-zero terms, so the bound matches the
    unpacked fused kernel's.  Also checks the packed plan is strictly
    smaller (the point of the layout)."""
    params, cond, sel, forced, p32 = fused_case
    p_f = fused_forced_probs(CFG, params, cond, forced, 8, pack_gates=True)
    t = tv(p32, p_f)
    assert t.max() < 5e-4, f"max TV {t.max():.2e}"
    assert (fused_chain.estimate_vmem_bytes(CFG, 8, 8, pack_gates=True)
            < fused_chain.estimate_vmem_bytes(CFG, 8, 8))


def test_engine_fuse_pack(fused_case):
    """WaveNetInfer(fuse_chain=True, fuse_pack=True) end-to-end: trajectory
    agreement with the exact engine, through the prefolded-weights cache
    (the fold must be produced with matching pack_gates)."""
    params, cond, sel, forced, _ = fused_case
    B, T = 8, cond.shape[0]

    def mk(**kw):
        eng = WaveNetInfer(num_layers=CFG.num_layers,
                           max_dilation=CFG.max_dilation, R=CFG.R, S=CFG.S,
                           A=CFG.A, max_batch=B,
                           implementation=Impl.PERSISTENT, chunk_size=8,
                           **kw)
        eng.set_canonical_params({k: np.asarray(v)
                                  for k, v in params.items()})
        eng.set_inputs(np.asarray(cond), np.asarray(sel))
        return eng

    y_exact = mk().run(T, B)
    y_pack = mk(fuse_chain=True, fuse_pack=True).run(T, B)
    agree = np.mean(y_exact == y_pack)
    assert agree >= 0.99, f"fuse_pack agreement {agree:.3f}"


def test_fused_engine_dump_planned_against_persistent_kernel(fused_case):
    """Dump runs fall back to the persistent kernel even under fuse_chain,
    so their chunk must be planned with the persistent VMEM estimator: a
    fused engine and an exact engine must agree on the dump-run chunk for
    any VMEM budget (the bug: sizing the dump run by the fused estimator,
    which counts the G stack but not the dump output buffers)."""
    params, cond, sel, _, _ = fused_case
    B = 8

    def mk(fused):
        eng = WaveNetInfer(num_layers=CFG.num_layers,
                           max_dilation=CFG.max_dilation, R=CFG.R, S=CFG.S,
                           A=CFG.A, max_batch=B,
                           implementation=Impl.PERSISTENT, chunk_size=256,
                           fuse_chain=fused)
        return eng

    for budget_mb in (8, 16, 32, 110):
        e_f, e_x = mk(True), mk(False)
        e_f.vmem_budget = e_x.vmem_budget = budget_mb * 1024 * 1024
        assert (e_f._effective_chunk(B, dump=True)
                == e_x._effective_chunk(B, dump=True)), budget_mb
