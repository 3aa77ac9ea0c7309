"""Per-row ragged feeds — true continuous batching (VERDICT r4 #3).

Contract: row b of a ragged-fed batch bit-matches the SAME row generated
alone through a single-row engine over its own conditioning/selector
stream, for any per-row chunk schedule (including zero-length ticks and
mid-stream slot handover).  The kernel mechanism under test is the per-row
validity mask + the call-local ring phase rotation
(`ops/persistent.py` ragged=True, `rotate_ring_phase`).
"""

import numpy as np
import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.engine.wavenet_infer import (Impl, WaveNetInfer,
                                                 _selector_stream)
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.ops import persistent

CFG = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=8)


def make_engine(cfg, B, chunk=8):
    eng = WaveNetInfer(num_layers=cfg.num_layers, max_dilation=cfg.max_dilation,
                       R=cfg.R, S=cfg.S, A=cfg.A, max_batch=B,
                       implementation=Impl.PERSISTENT, chunk_size=chunk,
                       interpret=True)
    return eng


def row_schedules(rng, B, n_ticks, t_max):
    """Random per-tick lengths [ticks, B] incl. zero-length ticks."""
    return np.stack([rng.randint(0, t_max + 1, size=B)
                     for _ in range(n_ticks)])


def test_ragged_feed_matches_per_row_engines():
    """The done-criterion test: a per-row-ragged feed schedule bit-matches
    per-row independent engines — with INJECTED selectors and with the
    per-row-clock DEFAULT stream."""
    B, n_ticks = 3, 4
    rng = np.random.RandomState(71)
    ref_w = params_lib.random_reference_weights(CFG, seed=71)
    sched = row_schedules(rng, B, n_ticks, 6)          # [ticks, B]
    totals = sched.sum(axis=0)

    # per-row full streams
    conds = [rng.uniform(-0.5, 0.5,
                         (totals[b], CFG.num_layers, 1, 2 * CFG.R)
                         ).astype(np.float32) for b in range(B)]
    sels = [rng.uniform(0, 1, (totals[b], 1)).astype(np.float32)
            for b in range(B)]

    for inject in (True, False):
        # reference: each row alone (single-row engine, one lockstep feed).
        # The DEFAULT stream is keyed on (seed, abs index, BATCH ROW): the
        # batched engine's row b must equal a lone engine fed row b's
        # stream values — so the reference always injects, with the
        # expected default values when the batched side uses defaults.
        refs = []
        for b in range(B):
            e1 = make_engine(CFG, 1)
            e1.set_reference_weights(ref_w)
            e1.begin_stream(1)
            if totals[b]:
                s = (sels[b] if inject else
                     _selector_stream(e1.sampling_seed, 0, int(totals[b]),
                                      B)[:, b:b + 1])
                y = e1.feed(conds[b], s)
            else:
                y = np.zeros((1, 0), np.int32)
            refs.append(y[0])

        eng = make_engine(CFG, B)
        eng.set_reference_weights(ref_w)
        eng.begin_stream(B)
        outs = [[] for _ in range(B)]
        t0r = np.zeros(B, np.int64)
        for lens in sched:
            Tm = int(lens.max())
            if Tm == 0:
                y = eng.feed(np.zeros((0, CFG.num_layers, B, 2 * CFG.R),
                                      np.float32), lengths=lens)
                assert y.shape == (B, 0)
                continue
            cond = np.zeros((Tm, CFG.num_layers, B, 2 * CFG.R), np.float32)
            sel = np.zeros((Tm, B), np.float32)
            for b in range(B):
                n = int(lens[b])
                cond[:n, :, b] = conds[b][t0r[b]:t0r[b] + n, :, 0]
                sel[:n, b] = sels[b][t0r[b]:t0r[b] + n, 0]
            y = eng.feed(cond, sel if inject else None, lengths=lens)
            for b in range(B):
                outs[b].append(y[b, :int(lens[b])])
            t0r += lens

        for b in range(B):
            got = (np.concatenate(outs[b]) if outs[b]
                   else np.zeros(0, np.int32))
            assert np.array_equal(got, refs[b]), (
                f"inject={inject} row {b}: ragged feed diverged from the "
                f"row generated alone (agree "
                f"{np.mean(got == refs[b]) if len(got) else 1:.3f})")


def test_ragged_then_realigned_lockstep():
    """Once per-row clocks REALIGN, feeds route back through the lockstep
    fast path — and the handoff between the two kernels is bit-exact (the
    stored ring convention is shared; rotation is only applied inside
    ragged dispatches)."""
    B = 2
    rng = np.random.RandomState(73)
    ref_w = params_lib.random_reference_weights(CFG, seed=73)
    T_total = 18
    cond = rng.uniform(-0.5, 0.5, (T_total, CFG.num_layers, B, 2 * CFG.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T_total, B)).astype(np.float32)

    un = make_engine(CFG, B)
    un.set_reference_weights(ref_w)
    un.begin_stream(B)
    y_un = un.feed(cond, sel)

    eng = make_engine(CFG, B)
    eng.set_reference_weights(ref_w)
    eng.begin_stream(B)
    # desync: row 0 gets 5, row 1 gets 2 ... then realign at t=8
    parts = []
    cuts = [(np.array([5, 2]), 0), (np.array([3, 6]), None)]
    t0r = np.zeros(B, np.int64)
    outs = [[] for _ in range(B)]
    for lens, _ in cuts:
        Tm = int(lens.max())
        c = np.zeros((Tm, CFG.num_layers, B, 2 * CFG.R), np.float32)
        s = np.zeros((Tm, B), np.float32)
        for b in range(B):
            n = int(lens[b])
            c[:n, :, b] = cond[t0r[b]:t0r[b] + n, :, b]
            s[:n, b] = sel[t0r[b]:t0r[b] + n, b]
        y = eng.feed(c, s, lengths=lens)
        for b in range(B):
            outs[b].append(y[b, :int(lens[b])])
        t0r += lens
    assert t0r[0] == t0r[1] == 8        # realigned
    # aligned continuation must use the LOCKSTEP path (no "feedrag" entry
    # for this shape) and still bit-match
    y_tail = eng.feed(cond[8:], sel[8:])
    assert ("feedrag", T_total - 8, B,
            min(8, -(-(T_total - 8) // 8) * 8)) not in eng._feed_cache
    for b in range(B):
        got = np.concatenate(outs[b] + [y_tail[b]])
        assert np.array_equal(got, y_un[b])


def test_ragged_handover_mid_stream():
    """Slot handover without waiting for the slowest stream: row 1 finishes
    and is reset mid-desync; its new utterance starts from clock 0 and
    bit-matches a fresh single-row engine, while row 0's stream continues
    untouched."""
    B = 2
    rng = np.random.RandomState(79)
    ref_w = params_lib.random_reference_weights(CFG, seed=79)
    condA = rng.uniform(-0.5, 0.5, (14, CFG.num_layers, 1, 2 * CFG.R)
                        ).astype(np.float32)    # row 0's utterance
    condB = rng.uniform(-0.5, 0.5, (9, CFG.num_layers, 1, 2 * CFG.R)
                        ).astype(np.float32)    # row 1's NEW utterance

    eng = make_engine(CFG, B)
    eng.set_reference_weights(ref_w)
    eng.begin_stream(B)
    # tick 1: row 0 takes 6, row 1 takes 3 (its old utterance ends)
    c = np.zeros((6, CFG.num_layers, B, 2 * CFG.R), np.float32)
    c[:6, :, 0] = condA[:6, :, 0]
    c[:3, :, 1] = rng.uniform(-0.5, 0.5, (3, CFG.num_layers, 2 * CFG.R))
    y1 = eng.feed(c, lengths=np.array([6, 3]))
    eng.reset_utterances([1])
    # tick 2: row 0 continues its stream (8 more), row 1 starts condB (9)
    c2 = np.zeros((9, CFG.num_layers, B, 2 * CFG.R), np.float32)
    c2[:8, :, 0] = condA[6:, :, 0]
    c2[:9, :, 1] = condB[:, :, 0]
    y2 = eng.feed(c2, lengths=np.array([8, 9]))

    # row 0 == single-row engine over condA (its default stream is keyed
    # on batch row 0, so the lone reference engine's default matches)
    e0 = make_engine(CFG, 1)
    e0.set_reference_weights(ref_w)
    e0.begin_stream(1)
    y0_ref = e0.feed(condA)
    assert np.array_equal(np.concatenate([y1[0, :6], y2[0, :8]]), y0_ref[0])
    # row 1 post-handover == FRESH single-row engine over condB, injected
    # with row 1's clock-0 default stream (reset restarted its clock)
    e1 = make_engine(CFG, 1)
    e1.set_reference_weights(ref_w)
    e1.begin_stream(1)
    y1_ref = e1.feed(condB, _selector_stream(e1.sampling_seed, 0, 9,
                                             B)[:, 1:2])
    assert np.array_equal(y2[1, :9], y1_ref[0])


def test_ragged_rejects_unsupported_modes():
    import pytest

    eng = make_engine(CFG, 2)
    eng.set_reference_weights(params_lib.random_reference_weights(CFG, seed=1))
    eng.begin_stream(2)
    cond = np.zeros((4, CFG.num_layers, 2, 2 * CFG.R), np.float32)
    with pytest.raises(ValueError, match="sample"):
        eng.feed(cond, mode="prng", lengths=np.array([4, 2]))
    with pytest.raises(ValueError, match="lengths"):
        eng.feed(cond, lengths=np.array([5, 2]))   # > chunk length


def test_rotate_ring_phase_roundtrip():
    """exit(entry(x)) is the identity for any per-row clock vector, and
    entry actually moves per-row content by the right offset."""
    rng = np.random.RandomState(5)
    ring = jnp.asarray(rng.randn(
        *persistent.init_ring(CFG, 3).shape).astype(np.float32))
    t0 = np.array([0, 5, 1023], np.int32)
    fwd = persistent.rotate_ring_phase(CFG, ring, t0, +1)
    back = persistent.rotate_ring_phase(CFG, fwd, t0, -1)
    assert np.array_equal(np.asarray(back), np.asarray(ring))
    rows, pack, p_offs, _ = CFG.packed_ring_plan()
    dils = CFG.dilations
    # spot-check layer with d=8: local[s] == stored[(s + t0_b) % d]
    l = dils.index(8)
    off, d = p_offs[l], 8
    for b, t in enumerate(t0):
        for s in range(d):
            assert np.array_equal(np.asarray(fwd)[off + s, b],
                                  np.asarray(ring)[off + (s + t) % d, b])
