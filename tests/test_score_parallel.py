"""Time-parallel teacher-forced scorer (ops/score_parallel): the per-step
probabilities, carried ring state and layer activations must match the
sequential implementations EXACTLY — the scorer batches the window's
per-step math through [T*B, C] matmuls, whose per-row dot products and
elementwise ops are identical to the sequential forced mode's, so on a
matched backend the results are bit-equal, not merely close."""

import numpy as np
import pytest

import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.models.golden import WaveNetGolden
from nv_wavenet_tpu.ops import persistent, scan_generate, score_parallel

# mixed dilations with lane packing (R=32 -> 4 layers/row) and a repeated
# cycle so p_offs/lane_slots are non-trivial
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
    # forced trajectory = the fp32 free run's own samples
    st = scan_generate.init_state(cfg, B)
    _, y, _ = scan_generate.generate(params, st, jnp.asarray(cond),
                                     jnp.asarray(sel), cfg)
    forced = np.asarray(y).T.astype(np.int32)                  # [T, B]
    return params, ref_w, cond, sel, forced


def fresh_state(cfg, B):
    return (persistent.init_ring(cfg, B),
            jnp.full((2, B), cfg.silence_bin, jnp.int32))


def test_parallel_scorer_matches_golden_forced():
    B, T = 4, 24
    params, ref_w, cond, sel, forced = case(CFG, B, T)

    golden = WaveNetGolden(CFG, B, T)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    golden.run(T, B, mode="forced", forced_y=forced.T)
    p_gold = golden.get_p_seq()                                # [T, B, A]

    scorer = score_parallel.make_parallel_scorer(CFG, B)
    ring, ys = fresh_state(CFG, B)
    p_seq, _, _ = scorer(params, np.array([0]), jnp.asarray(cond),
                         jnp.asarray(forced), ring, ys)
    np.testing.assert_allclose(np.asarray(p_seq), p_gold, atol=1e-6, rtol=0)


def test_parallel_scorer_matches_kernel_forced_bitwise():
    """Same backend (XLA CPU: kernel in interpret mode) -> the scorer's
    p_seq, final ring and y_state must be BIT-identical to the sequential
    kernel's forced mode."""
    B, T = 3, 16
    params, _, cond, _, forced = case(CFG, B, T, seed=23)

    gen = persistent.make_persistent_generator(CFG, B, 8, mode="forced",
                                               interpret=True)
    ring, ys = fresh_state(CFG, B)
    out = gen(params, np.array([0]), jnp.asarray(cond),
              jnp.asarray(forced.astype(np.float32)), ring, ys, n_valid=T)
    y_k, ring_k, ys_k, p_k = out

    scorer = score_parallel.make_parallel_scorer(CFG, B)
    ring, ys = fresh_state(CFG, B)
    p_s, ring_s, ys_s = scorer(params, np.array([0]), jnp.asarray(cond),
                               jnp.asarray(forced), ring, ys)
    assert np.array_equal(np.asarray(p_s), np.asarray(p_k))
    assert np.array_equal(np.asarray(ring_s), np.asarray(ring_k))
    assert np.array_equal(np.asarray(ys_s), np.asarray(ys_k))


def test_chunked_scoring_bitwise():
    """Ragged chunked scoring with carried ring/y_state == one full-window
    score, bit-for-bit — including chunks shorter than the largest dilation
    and non-aligned t0."""
    B, T = 2, 23
    params, _, cond, _, forced = case(CFG, B, T, seed=5)
    scorer = score_parallel.make_parallel_scorer(CFG, B)

    ring, ys = fresh_state(CFG, B)
    p_full, ring_full, ys_full = scorer(params, np.array([0]),
                                        jnp.asarray(cond),
                                        jnp.asarray(forced), ring, ys)

    ring, ys = fresh_state(CFG, B)
    parts = []
    t0 = 0
    for n in (3, 1, 9, 10):                                    # ragged, sums to 23
        p, ring, ys = scorer(params, np.array([t0]),
                             jnp.asarray(cond[t0:t0 + n]),
                             jnp.asarray(forced[t0:t0 + n]), ring, ys)
        parts.append(np.asarray(p))
        t0 += n
    assert np.array_equal(np.concatenate(parts, axis=0), np.asarray(p_full))
    assert np.array_equal(np.asarray(ring), np.asarray(ring_full))
    assert np.array_equal(np.asarray(ys), np.asarray(ys_full))


def test_score_then_generate_handoff():
    """State left by the scorer must continue generation exactly: score a
    prefix (teacher-forcing the kernel's own samples), then generate the
    suffix from the scorer's state — the suffix must bit-match the full
    kernel run."""
    B, T, T1 = 2, 24, 11
    params, _, cond, sel, forced = case(CFG, B, T, seed=31)

    gen = persistent.make_persistent_generator(CFG, B, 8, interpret=True)
    ring, ys = fresh_state(CFG, B)
    y_full, _, _ = gen(params, np.array([0]), jnp.asarray(cond),
                       jnp.asarray(sel), ring, ys, n_valid=T)
    y_full = np.asarray(y_full)
    assert np.array_equal(y_full, forced)    # scan and kernel agree

    scorer = score_parallel.make_parallel_scorer(CFG, B)
    ring, ys = fresh_state(CFG, B)
    _, ring, ys = scorer(params, np.array([0]), jnp.asarray(cond[:T1]),
                         jnp.asarray(forced[:T1]), ring, ys)
    pad = (-(T - T1)) % 8
    cond_sfx = np.pad(cond[T1:], ((0, pad), (0, 0), (0, 0), (0, 0)))
    sel_sfx = np.pad(sel[T1:], ((0, pad), (0, 0)))
    y_sfx, _, _ = gen(params, np.array([T1]), jnp.asarray(cond_sfx),
                      jnp.asarray(sel_sfx), ring, ys, n_valid=T - T1)
    assert np.array_equal(np.asarray(y_sfx)[:T - T1], y_full[T1:])


def test_return_xt_matches_golden_history():
    """xt [L+1, T, B, R] must equal the golden model's per-step layer-input
    history (the state a speculative-decoding commit reconstructs from)."""
    B, T = 2, 12
    params, ref_w, cond, sel, forced = case(CFG, B, T, seed=43)

    golden = WaveNetGolden(CFG, B, T)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    golden.run(T, B, mode="forced", forced_y=forced.T)
    hist = golden._hist[:T]                                    # [T, L+1, B, R]

    scorer = score_parallel.make_parallel_scorer(CFG, B, return_xt=True)
    ring, ys = fresh_state(CFG, B)
    _, _, _, xt = scorer(params, np.array([0]), jnp.asarray(cond),
                         jnp.asarray(forced), ring, ys)
    np.testing.assert_allclose(np.asarray(xt),
                               np.transpose(hist, (1, 0, 2, 3)),
                               atol=1e-6, rtol=0)


def test_engine_score_stream_and_handoff():
    """Engine surface: `score` must return the forced-mode distributions and
    advance the stream state exactly as if the window had been generated —
    a subsequent `feed` continues bit-identically to an all-feed run."""
    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer

    B, T1, T2 = 2, 11, 13
    params, ref_w, cond, sel, forced = case(CFG, B, T1 + T2, seed=57)

    eng = WaveNetInfer(num_layers=CFG.num_layers, max_dilation=CFG.max_dilation,
                       R=CFG.R, S=CFG.S, A=CFG.A, max_batch=B,
                       implementation=Impl.PERSISTENT, chunk_size=8)
    eng.set_reference_weights(ref_w)
    eng.begin_stream(B)
    y1 = eng.feed(cond[:T1], sel[:T1])                       # [B, T1]
    y2 = eng.feed(cond[T1:], sel[T1:])
    assert np.array_equal(np.concatenate([y1, y2], 1).T, forced)

    # fresh stream: SCORE the generated prefix, then keep generating
    eng.begin_stream(B)
    p = eng.score(cond[:T1], y1)                             # [B, T1, A]
    y2b = eng.feed(cond[T1:], sel[T1:])
    assert np.array_equal(y2b, y2)

    golden = WaveNetGolden(CFG, B, T1)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond[:T1], sel[:T1])
    golden.run(T1, B, mode="forced", forced_y=y1)
    np.testing.assert_allclose(np.transpose(p, (1, 0, 2)),
                               golden.get_p_seq(), atol=1e-6, rtol=0)


def test_flagship_geometry_scorer_fuzz():
    """Flagship-geometry scorer fuzz (VERDICT r4 #8): 20L 64R/256S/256A
    maxD=512 at an odd batch — the roll-based ring write-back
    (score_parallel.py) runs against MULTI-ROW lane packing and large
    dilations here, the index-math class the generation fuzz covers for the
    kernel (test_fuzz_equivalence.py::test_flagship_geometry_exact_
    equivalence) but toy-geometry scorer tests never reach.  Ragged chunked
    scoring with carried state must bit-equal one full score AND the
    interpret-mode kernel's forced mode, and the state must hand off to
    generation exactly."""
    cfg = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=512)
    B, T = 5, 19
    params, _, cond, sel, forced = case(cfg, B, T, seed=71)

    # sequential oracle: interpret-mode kernel, forced mode
    pad = (-T) % 8
    gen_f = persistent.make_persistent_generator(cfg, B, 8, mode="forced",
                                                 interpret=True)
    ring, ys = fresh_state(cfg, B)
    cond_p = np.pad(cond, ((0, pad), (0, 0), (0, 0), (0, 0)))
    forced_p = np.pad(forced, ((0, pad), (0, 0)))
    _, ring_k, ys_k, p_k = gen_f(params, np.array([0]), jnp.asarray(cond_p),
                                 jnp.asarray(forced_p.astype(np.float32)),
                                 ring, ys, n_valid=T)

    # ragged chunked scoring: chunk boundaries force t0 % d != 0 for every
    # dilation class
    scorer = score_parallel.make_parallel_scorer(cfg, B)
    ring, ys = fresh_state(cfg, B)
    parts, t0 = [], 0
    for n in (7, 1, 6, 5):                                     # sums to 19
        p, ring, ys = scorer(params, np.array([t0]),
                             jnp.asarray(cond[t0:t0 + n]),
                             jnp.asarray(forced[t0:t0 + n]), ring, ys)
        parts.append(np.asarray(p))
        t0 += n
    assert np.array_equal(np.concatenate(parts, axis=0)[:T],
                          np.asarray(p_k)[:T])   # rows >= n_valid are pad
    assert np.array_equal(np.asarray(ring), np.asarray(ring_k))
    assert np.array_equal(np.asarray(ys), np.asarray(ys_k))

    # handoff: generation continues bit-exactly from the scorer's state
    gen = persistent.make_persistent_generator(cfg, B, 8, interpret=True)
    T2 = 8
    rng2 = np.random.RandomState(72)
    cond2 = rng2.uniform(-1, 1, (T2, cfg.num_layers, B, 2 * cfg.R)
                         ).astype(np.float32)
    sel2 = rng2.uniform(0, 1, (T2, B)).astype(np.float32)
    y2, _, _ = gen(params, np.array([T]), jnp.asarray(cond2),
                   jnp.asarray(sel2), ring, ys, n_valid=T2)
    st = scan_generate.init_state(cfg, B)
    _, y_all, _ = scan_generate.generate(
        params, st, jnp.asarray(np.concatenate([cond, cond2])),
        jnp.asarray(np.concatenate([sel, sel2])), cfg)
    assert np.array_equal(np.asarray(y2), np.asarray(y_all).T[T:])


def test_bits_per_sample_uniform():
    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    B, T = 2, 16
    ref_w = params_lib.random_reference_weights(cfg, seed=1, scale=1e-3)
    params = {k: jnp.asarray(v)
              for k, v in params_lib.to_canonical(ref_w, cfg).items()}
    rng = np.random.RandomState(0)
    cond = rng.uniform(-0.1, 0.1, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    y = rng.randint(0, cfg.A, (T, B)).astype(np.int32)
    scorer = score_parallel.make_parallel_scorer(cfg, B)
    ring = persistent.init_ring(cfg, B)
    ys = jnp.full((2, B), cfg.silence_bin, jnp.int32)
    p_seq, _, _ = scorer(params, np.array([0]), jnp.asarray(cond),
                         jnp.asarray(y), ring, ys)
    bits = score_parallel.bits_per_sample(p_seq, jnp.asarray(y))
    assert np.abs(np.asarray(bits).mean() - 8.0) < 0.3


def test_engine_score_handoff_bf16_weights():
    """score->feed handoff on the DETERMINISTIC bf16-weights tier: the
    scorer must compute the carried ring/y_state with the engine's
    weight-dtype-ROUNDED params (the same weights the bf16 kernels use),
    or the post-score feed diverges from an all-feed stream."""
    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer

    B, T1, T2 = 2, 11, 13
    _, ref_w, cond, sel, _ = case(CFG, B, T1 + T2, seed=91)

    def make():
        eng = WaveNetInfer(num_layers=CFG.num_layers,
                           max_dilation=CFG.max_dilation, R=CFG.R, S=CFG.S,
                           A=CFG.A, max_batch=B,
                           implementation=Impl.PERSISTENT, chunk_size=8,
                           weight_dtype=jnp.bfloat16)
        eng.set_reference_weights(ref_w)
        eng.begin_stream(B)
        return eng

    eng = make()
    y1 = eng.feed(cond[:T1], sel[:T1])
    y2 = eng.feed(cond[T1:], sel[T1:])

    eng2 = make()
    eng2.score(cond[:T1], y1)
    y2b = eng2.feed(cond[T1:], sel[T1:])
    assert np.array_equal(y2b, y2)


def test_engine_feed_empty_chunk():
    """A frontend may produce zero frames in a tick: feed must return an
    empty [B, 0] and leave the stream state untouched."""
    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer

    B, T = 2, 12
    _, ref_w, cond, sel, _ = case(CFG, B, T, seed=23)
    eng = WaveNetInfer(num_layers=CFG.num_layers,
                       max_dilation=CFG.max_dilation, R=CFG.R, S=CFG.S,
                       A=CFG.A, max_batch=B, implementation=Impl.PERSISTENT,
                       chunk_size=8)
    eng.set_reference_weights(ref_w)
    eng.begin_stream(B)
    y1 = eng.feed(cond[:6], sel[:6])
    y_empty = eng.feed(cond[:0], sel[:0])
    assert y_empty.shape == (B, 0)
    y2 = eng.feed(cond[6:], sel[6:])

    eng.begin_stream(B)
    y1b = eng.feed(cond[:6], sel[:6])
    y2b = eng.feed(cond[6:], sel[6:])
    assert np.array_equal(y1, y1b) and np.array_equal(y2, y2b)
