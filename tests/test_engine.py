"""Engine (WaveNetInfer) tests — the TPU analog of `nv_wavenet_test.cu`'s
engine-level matrix: golden-model equivalence through the public engine API,
deliberately uneven chunking (`run_chunks` with chunk 7 against 8 samples),
implementation-enum dispatch, and the dump/getter observability surface.
"""

import numpy as np
import pytest

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.models.golden import WaveNetGolden

from tests.test_golden_vs_scan import make_case, rel_close


def make_engine(cfg, batch, impl=Impl.AUTO, chunk=4, **kw):
    return WaveNetInfer(num_layers=cfg.num_layers, max_dilation=cfg.max_dilation,
                        R=cfg.R, S=cfg.S, A=cfg.A, max_batch=batch,
                        implementation=impl, chunk_size=chunk,
                        interpret=True, **kw)


# Engine-level config matrix, mirroring nv_wavenet_test.cu:345-394 (shrunk to
# interpreter-tractable sizes; the full-size configs run compiled on TPU via
# tools/perf.py)
MATRIX = [
    (WaveNetConfig(num_layers=20, R=32, S=128, A=256, max_dilation=8),
     Impl.PERSISTENT, 4),
    (WaveNetConfig(num_layers=10, R=64, S=128, A=256, max_dilation=8),
     Impl.PERSISTENT, 2),
    (WaveNetConfig(num_layers=8, R=64, S=256, A=256, max_dilation=8),
     Impl.MANYBLOCK, 2),
    (WaveNetConfig(num_layers=6, R=32, S=128, A=512, max_dilation=8),
     Impl.PERSISTENT, 2),
    (WaveNetConfig(num_layers=4, R=32, S=128, A=1024, max_dilation=4),
     Impl.MANYBLOCK, 1),
]


@pytest.mark.parametrize("cfg,impl,batch", MATRIX)
def test_engine_matches_golden(cfg, impl, batch):
    samples = 8
    ref_w, cond, selectors = make_case(cfg, batch, samples, seed=21)
    golden = WaveNetGolden(cfg, max_batch=batch, max_samples=samples)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, selectors)
    y_gold = golden.run(samples, batch)

    eng = make_engine(cfg, batch, impl)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, selectors)
    y = eng.run(samples, batch, dump_activations=True)
    assert np.array_equal(y_gold, y)

    for l in range(cfg.num_layers):
        assert rel_close(golden.get_xt_out(l), eng.get_xt_out(l), 1e-2,
                         atol=3e-4)
        assert rel_close(golden.get_skip_out(l), eng.get_skip_out(l), 1e-2,
                         atol=3e-4)
    assert rel_close(golden.get_zs(), eng.get_zs(), 1e-4, atol=2e-5)
    assert rel_close(golden.get_za(), eng.get_za(), 1e-4, atol=2e-5)
    assert rel_close(golden.get_p(), eng.get_p(), 1e-3)


def test_engine_uneven_chunks():
    """chunk_size 7 against 8 samples — forces a ragged final chunk exactly
    like the reference test (`nv_wavenet_test.cu:254`,`:340`)."""
    cfg = WaveNetConfig(num_layers=8, R=32, S=128, A=256, max_dilation=8)
    batch, samples = 2, 8
    ref_w, cond, selectors = make_case(cfg, batch, samples, seed=23)
    golden = WaveNetGolden(cfg, max_batch=batch, max_samples=samples)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, selectors)
    y_gold = golden.run(samples, batch)

    eng = make_engine(cfg, batch, Impl.PERSISTENT, chunk=4)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, selectors)
    chunks_seen = []
    y = eng.run_chunks(7, lambda yc, off, n: chunks_seen.append((off, n)),
                       samples, batch)
    assert np.array_equal(y_gold, y)
    assert chunks_seen == [(0, 7), (7, 1)]


def test_run_chunks_dump_matches_full_run_dump():
    """run_chunks(dump_activations=True) — the reference signature's
    dumpActivations flag (`nv_wavenet.cuh:446`): after a ragged chunked run
    the getter surface must equal a single full-length dump run (carried
    state is exact across chunk boundaries)."""
    cfg = WaveNetConfig(num_layers=8, R=32, S=128, A=256, max_dilation=8)
    batch, samples = 2, 8
    ref_w, cond, selectors = make_case(cfg, batch, samples, seed=37)

    eng = make_engine(cfg, batch, Impl.PERSISTENT, chunk=4)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, selectors)
    y_full = eng.run(samples, batch, dump_activations=True)
    full = {k: eng._dumps[k].copy() for k in eng._dumps}

    eng.set_inputs(cond, selectors)
    y = eng.run_chunks(7, lambda yc, off, n: None, samples, batch,
                       dump_activations=True)
    assert np.array_equal(y_full, y)
    for k in full:
        assert np.array_equal(full[k], eng._dumps[k]), k
    assert np.allclose(eng.get_p().sum(-1), 1.0, atol=1e-5)


def test_reset_utterances_continuous_batching():
    """reset_utterances: a reset row must behave exactly like a fresh engine
    start (zero FIFOs + silence history are phase-invariant in the rotating
    ring), while the other rows' streams continue untouched — the
    continuous-batching serving primitive."""
    cfg = WaveNetConfig(num_layers=8, R=32, S=128, A=256, max_dilation=8)
    B, T1, T2 = 3, 13, 11
    ref_w, cond, sel = make_case(cfg, B, T1 + T2, seed=41)

    def fresh():
        eng = make_engine(cfg, B, Impl.PERSISTENT, chunk=8)
        eng.set_reference_weights(ref_w)
        return eng

    # interrupted engine: stream T1, reset row 2, stream T2
    eng = fresh()
    eng.begin_stream(B)
    y1 = eng.feed(cond[:T1], sel[:T1])
    eng.reset_utterances([2])
    st = eng.export_state()
    assert np.all(st["ring"][:, 2] == 0) and np.all(st["y_state"][:, 2] == 128)
    assert np.any(st["ring"][:, :2] != 0)   # other rows keep their history
    y2 = eng.feed(cond[T1:], sel[T1:])

    # rows 0/1 match an uninterrupted stream over the full conditioning
    un = fresh()
    un.begin_stream(B)
    y_un = np.concatenate([un.feed(cond[:T1], sel[:T1]),
                           un.feed(cond[T1:], sel[T1:])], axis=1)
    assert np.array_equal(np.concatenate([y1, y2], 1)[:2], y_un[:2])
    # row 2's post-reset samples equal a FRESH engine fed only the tail
    fr = fresh()
    fr.begin_stream(B)
    y_fr = fr.feed(cond[T1:], sel[T1:])
    assert np.array_equal(y2[2], y_fr[2])


def test_reset_utterances_under_mesh():
    """reset_utterances on a batch-sharded mesh engine: the scatter applies
    to the global state arrays and the result matches the single-device
    engine doing the same reset."""
    from nv_wavenet_tpu.parallel import mesh as mesh_lib

    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=4)
    B, T1, T2 = 4, 9, 7
    ref_w, cond, sel = make_case(cfg, B, T1 + T2, seed=43)

    def run(mesh):
        eng = WaveNetInfer(num_layers=cfg.num_layers,
                           max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                           A=cfg.A, max_batch=B,
                           implementation=Impl.PERSISTENT, chunk_size=8,
                           mesh=mesh)
        eng.set_reference_weights(ref_w)
        eng.begin_stream(B)
        y1 = eng.feed(cond[:T1], sel[:T1])
        eng.reset_utterances([1, 3])
        y2 = eng.feed(cond[T1:], sel[T1:])
        return np.concatenate([y1, y2], axis=1)

    assert np.array_equal(run(None), run(mesh_lib.data_mesh(4)))


def test_sampling_temperature():
    """Temperature (serving knob, weight-transform implementation):
    T=1 is bit-identical to the default engine; T->0 sharpens sampling to
    the argmax decode; large T flattens the sampled distribution (higher
    dump-mode entropy).  softmax(za/T) == softmax(zs @ (end_w/T) + end_b/T),
    so no kernel carries a temperature path."""
    from tests.test_low_precision import hot_case
    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=8)
    B, T = 2, 12
    params, cond, selectors, _ = hot_case(cfg, B, T, seed=47)

    def run(temp, mode="sample", dump=False):
        eng = make_engine(cfg, B, Impl.PERSISTENT, chunk=4)
        eng.temperature = temp
        eng.set_canonical_params({k: np.asarray(v) for k, v in params.items()})
        eng.set_inputs(np.asarray(cond), np.asarray(selectors))
        y = eng.run(T, B, mode=mode, dump_activations=dump)
        return (y, eng.get_p()) if dump else y

    assert np.array_equal(run(1.0), run(1.00000001 - 1e-8))  # exact no-op
    assert np.array_equal(run(0.01), run(1.0, mode="argmax"))
    _, p_hot = run(1.0, dump=True)
    _, p_cool = run(4.0, dump=True)

    def entropy(p):
        p = np.maximum(p, 1e-12)
        return float(-(p * np.log(p)).sum(-1).mean())

    assert entropy(p_cool) > entropy(p_hot) + 0.1

    # set_temperature AFTER weights are device-resident (the cheap patch
    # path: only end_w/end_b re-upload) must equal constructing with that
    # temperature, and changing back to 1.0 must restore exactness
    eng = make_engine(cfg, 2, Impl.PERSISTENT, chunk=4)
    eng.set_canonical_params({k: np.asarray(v) for k, v in params.items()})
    eng.set_inputs(np.asarray(cond), np.asarray(selectors))
    y_t1 = eng.run(12, 2)
    assert np.array_equal(y_t1, run(1.0))
    eng._device_params()                      # force the cached dict
    eng.set_temperature(4.0)
    eng.set_inputs(np.asarray(cond), np.asarray(selectors))
    assert np.array_equal(eng.run(12, 2), run(4.0))
    eng.set_temperature(1.0)
    eng.set_inputs(np.asarray(cond), np.asarray(selectors))
    assert np.array_equal(eng.run(12, 2), y_t1)


def test_engine_reuse_and_second_iteration():
    """Re-running with the same uploaded weights/state must reproduce —
    the reference runs every config twice re-using uploads
    (`nv_wavenet_test.cu:241`)."""
    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=4)
    batch, samples = 2, 6
    ref_w, cond, selectors = make_case(cfg, batch, samples, seed=29)
    eng = make_engine(cfg, batch, Impl.PERSISTENT)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, selectors)
    y1 = eng.run(samples, batch)
    eng.set_inputs(cond, selectors)   # reset state, same inputs
    y2 = eng.run(samples, batch)
    assert np.array_equal(y1, y2)


def test_auto_falls_back_to_manyblock_on_vmem_budget():
    cfg = WaveNetConfig(num_layers=8, R=32, S=128, A=256, max_dilation=8)
    eng = make_engine(cfg, 1, Impl.AUTO)
    eng.vmem_budget = 1024  # absurdly small -> must pick MANYBLOCK
    assert eng._resolve_impl(1) == Impl.MANYBLOCK
    eng.vmem_budget = 512 * 1024 * 1024
    assert eng._resolve_impl(1) == Impl.PERSISTENT


def test_single_dual_map_to_persistent():
    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    eng = make_engine(cfg, 1, Impl.SINGLE_BLOCK)
    assert eng._resolve_impl(1) == Impl.PERSISTENT
    eng2 = make_engine(cfg, 1, Impl.DUAL_BLOCK)
    assert eng2._resolve_impl(1) == Impl.PERSISTENT


def test_engine_generated_selectors_reproducible():
    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    ref_w, cond, _ = make_case(cfg, 1, 6, seed=31)
    eng = make_engine(cfg, 1, Impl.MANYBLOCK)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, selectors=None, seed=123)
    y1 = eng.run(6, 1)
    eng.set_inputs(cond, selectors=None, seed=123)
    y2 = eng.run(6, 1)
    assert np.array_equal(y1, y2)


def test_default_selector_stream_unified_across_input_modes():
    """VERDICT r4 #7: set_inputs(selectors=None) draws the SAME splitmix64
    absolute-index stream `feed` uses, so a served utterance (begin_stream/
    feed with default selectors) replays through run() bit-exactly without
    manual selector injection — replayability across input modes."""
    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    B, T = 2, 14
    ref_w, cond, _ = make_case(cfg, B, T, seed=61)
    eng = make_engine(cfg, B, Impl.PERSISTENT)
    eng.set_reference_weights(ref_w)
    eng.begin_stream(B)
    y_feed = np.concatenate([eng.feed(cond[:5]), eng.feed(cond[5:6]),
                             eng.feed(cond[6:])], axis=1)
    eng.set_inputs(cond)                   # default stream, same seed
    y_run = eng.run(T, B)
    assert np.array_equal(y_feed, y_run)


def test_manyblock_prng_mode_chunk_invariant():
    """Device-side PRNG sampling on the scan path: draws are keyed on the
    absolute sample index, so chunked runs reproduce one full run and reruns
    with the same seed are identical (the persistent kernel has the same
    property via its per-step reseed)."""
    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    ref_w, cond, _ = make_case(cfg, 2, 8, seed=37)
    eng = make_engine(cfg, 2, Impl.MANYBLOCK)
    eng.set_reference_weights(ref_w)
    eng.sampling_seed = 7
    eng.set_inputs(cond, selectors=None)
    y_full = eng.run(8, 2, mode="prng")
    eng.set_inputs(cond, selectors=None)
    y_a = eng.run_partial(0, 5, 2, mode="prng")
    y_b = eng.run_partial(5, 3, 2, mode="prng")
    assert np.array_equal(y_full, np.concatenate([y_a, y_b], axis=1))
    eng.sampling_seed = 8
    eng.set_inputs(cond, selectors=None)
    y_other = eng.run(8, 2, mode="prng")
    assert not np.array_equal(y_full, y_other)


def test_manyblock_bf16_weight_streaming():
    """weight_dtype=bfloat16 on MANYBLOCK streams cast weights (half the
    HBM traffic of the bound path).  bf16 weight storage is deterministic
    (exactly-rounded cast + canonical fp32 math), so MANYBLOCK and
    PERSISTENT must emit IDENTICAL integer sequences under it — the same
    cross-implementation exact-match contract as fp32 (distribution bounds
    vs fp32 live in tests/test_low_precision.py).  Also checks the cast
    cache refreshes when weights change."""
    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    import jax.numpy as jnp
    ref_w, cond, sel = make_case(cfg, 2, 6, seed=41)
    eng = make_engine(cfg, 2, Impl.MANYBLOCK, weight_dtype=jnp.bfloat16)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, sel)
    y1 = eng.run(6, 2)
    # exact cross-implementation match under bf16 weights
    per = make_engine(cfg, 2, Impl.PERSISTENT, weight_dtype=jnp.bfloat16)
    per.set_reference_weights(ref_w)
    per.set_inputs(cond, sel)
    y_per = per.run(6, 2)
    assert np.array_equal(y1, y_per)
    # weight updates take effect (upload invalidation)
    ref_w2 = params_lib.random_reference_weights(cfg, seed=42)
    eng.set_reference_weights(ref_w2)
    eng.set_inputs(cond, sel)
    y2 = eng.run(6, 2)
    assert not np.array_equal(y1, y2)


def test_streaming_feed_matches_full_run():
    """Incremental conditioning (begin_stream/feed with ragged chunk sizes)
    must reproduce one full run over the concatenated conditioning exactly —
    including injected-selector parity with the golden model."""
    from nv_wavenet_tpu.models.golden import WaveNetGolden

    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=4)
    B, T = 3, 17
    ref_w, cond, sel = make_case(cfg, B, T, seed=61)
    golden = WaveNetGolden(cfg, B, T)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    y_gold = golden.run(T, B)

    for impl in (Impl.PERSISTENT, Impl.MANYBLOCK):
        eng = make_engine(cfg, B, impl, chunk=8)
        eng.set_reference_weights(ref_w)
        eng.begin_stream(B)
        outs = []
        off = 0
        for n in (5, 1, 8, 3):  # ragged, non-chunk-aligned
            outs.append(eng.feed(cond[off:off + n], sel[off:off + n]))
            off += n
        y = np.concatenate(outs, axis=1)
        assert np.array_equal(y, y_gold), impl


def test_device_resident_inputs_and_weights():
    """Parity with the reference's inputsFromDevice/weightsFromDevice toggles
    (`nv_wavenet_test.cu:359-365`): staging inputs as device (jax) arrays
    must produce the identical sequence as host numpy upload."""
    import jax.numpy as jnp

    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    ref_w, cond, sel = make_case(cfg, 2, 8, seed=71)
    a = make_engine(cfg, 2)
    a.set_reference_weights(ref_w)
    a.set_inputs(cond, sel)
    y_host = a.run(8, 2)

    b = make_engine(cfg, 2)
    b.set_reference_weights({k: (jnp.asarray(v) if hasattr(v, "shape")
                                 else v) for k, v in ref_w.items()})
    b.set_inputs(jnp.asarray(cond), jnp.asarray(sel))
    y_dev = b.run(8, 2)
    assert np.array_equal(y_host, y_dev)


def test_streaming_feed_default_selectors_chunk_invariant():
    """With selectors=None, feed's default sampling stream is keyed on the
    ABSOLUTE sample index, so the generated audio must not depend on how the
    caller chunks the conditioning."""
    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    B, T = 2, 12
    ref_w, cond, _ = make_case(cfg, B, T, seed=83)

    def run_with_chunking(chunks):
        eng = make_engine(cfg, B, Impl.MANYBLOCK)
        eng.sampling_seed = 11
        eng.set_reference_weights(ref_w)
        eng.begin_stream(B)
        outs, off = [], 0
        for n in chunks:
            outs.append(eng.feed(cond[off:off + n]))
            off += n
        return np.concatenate(outs, axis=1)

    y_a = run_with_chunking([12])
    y_b = run_with_chunking([5, 1, 6])
    y_c = run_with_chunking([3, 3, 3, 3])
    assert np.array_equal(y_a, y_b)
    assert np.array_equal(y_a, y_c)


def test_mesh_batch_divisibility_asserts_early():
    """A batch not divisible by the mesh 'data' axis must fail with a clear
    message in set_inputs/begin_stream, not deep inside shard_map."""
    import pytest

    from nv_wavenet_tpu.parallel import mesh as mesh_lib

    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    eng = WaveNetInfer(num_layers=4, max_dilation=4, R=32, S=128, A=256,
                       max_batch=4, chunk_size=8, interpret=True,
                       mesh=mesh_lib.data_mesh(2))
    ref_w, cond, sel = make_case(cfg, 3, 8, seed=87)
    eng.set_reference_weights(ref_w)
    with pytest.raises(AssertionError, match="not divisible"):
        eng.set_inputs(cond, sel)
    with pytest.raises(AssertionError, match="not divisible"):
        eng.begin_stream(3)


def test_export_import_state_resumes_stream_exactly():
    """Mid-stream state snapshot/restore (serving migration): a stream
    continued in a FRESH engine from export_state must emit the identical
    integers as the uninterrupted stream — including the default selector
    stream (keyed on absolute t, so it survives migration too)."""
    cfg = WaveNetConfig(num_layers=4, R=32, S=64, A=256, max_dilation=4)
    B, T = 3, 14
    ref_w = params_lib.random_reference_weights(cfg, seed=91)
    rng = np.random.RandomState(9)
    cond = rng.uniform(-0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)

    def mk():
        eng = WaveNetInfer(num_layers=cfg.num_layers,
                           max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                           A=cfg.A, max_batch=B, chunk_size=8,
                           interpret=True)
        eng.set_reference_weights(ref_w)
        return eng

    # uninterrupted stream (default selectors)
    e0 = mk()
    e0.begin_stream(B)
    y_full = np.concatenate([e0.feed(cond[:6]), e0.feed(cond[6:])], axis=1)

    # interrupted: snapshot after 6 samples, restore into a fresh engine
    e1 = mk()
    e1.begin_stream(B)
    y_a = e1.feed(cond[:6])
    snap = e1.export_state()
    # snapshot round-trips through serialization-friendly numpy
    assert all(isinstance(v, np.ndarray) for v in snap.values())
    e2 = mk()
    e2.import_state({k: v.copy() for k, v in snap.items()})
    y_b = e2.feed(cond[6:])
    y_resumed = np.concatenate([y_a, y_b], axis=1)
    assert np.array_equal(y_resumed, y_full)

    # run_partial continuation restores too (ragged boundary state)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)
    e3 = mk()
    e3.set_inputs(cond, sel)
    y_ref = e3.run(T, B)
    e4 = mk()
    e4.set_inputs(cond, sel)
    e4.run_partial(0, 5, B)
    snap2 = e4.export_state()
    e5 = mk()
    e5.set_inputs(cond, sel)
    e5.run_partial(0, 5, B)          # warm a fresh state, then overwrite it
    e5.import_state(snap2)
    y_tail = e5.run_partial(5, T - 5, B)
    assert np.array_equal(y_tail, y_ref[:, 5:])


def test_selector_stream_properties():
    """The vectorized default-feed selector stream: uniform in [0, 1),
    chunk-invariant (keyed on the absolute sample index), decorrelated
    across batch rows / seeds / processes."""
    from nv_wavenet_tpu.engine.wavenet_infer import _selector_stream

    s = _selector_stream(7, 0, 4096, 4)
    assert s.shape == (4096, 4) and s.dtype == np.float32
    assert (s >= 0).all() and (s < 1).all()
    assert abs(s.mean() - 0.5) < 0.02 and abs(np.var(s) - 1 / 12) < 0.005
    # chunk invariance: [t0, t0+T) slices of one logical stream
    full = _selector_stream(7, 0, 64, 3)
    cat = np.concatenate([_selector_stream(7, 0, 10, 3),
                          _selector_stream(7, 10, 30, 3),
                          _selector_stream(7, 40, 24, 3)])
    assert np.array_equal(full, cat)
    # distinct rows / seeds / processes give distinct draws
    assert not np.array_equal(s[:, 0], s[:, 1])
    assert not np.array_equal(s, _selector_stream(8, 0, 4096, 4))
    assert not np.array_equal(s, _selector_stream(7, 0, 4096, 4, pidx=1))
