"""Multi-device scaling tests on the virtual 8-device CPU mesh: sharded
generation must produce exactly the same integer samples as single-device,
with weights replicated and the batch sharded (the reference's DP property,
`pytorch/distributed.py`, re-expressed as sharding)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.ops import persistent, scan_generate
from nv_wavenet_tpu.parallel import mesh as mesh_lib


def case(cfg, batch, samples, seed=17):
    ref_w = params_lib.random_reference_weights(cfg, seed=seed)
    params = {k: jnp.asarray(v) for k, v in
              params_lib.to_canonical(ref_w, cfg).items()}
    rng = np.random.RandomState(seed)
    cond = rng.uniform(-0.5, 0.5, (samples, cfg.num_layers, batch, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (samples, batch)).astype(np.float32)
    return params, cond, sel


def test_sharded_scan_matches_single_device():
    cfg = WaveNetConfig(num_layers=8, R=32, S=128, A=256, max_dilation=8)
    B, T = 8, 12
    params, cond, sel = case(cfg, B, T)

    state = scan_generate.init_state(cfg, B)
    _, y_single, _ = scan_generate.generate(params, state, jnp.asarray(cond),
                                            jnp.asarray(sel), cfg)

    m = mesh_lib.data_mesh(8)
    _, y_sharded = mesh_lib.sharded_generate_scan(params, cfg, m, cond, sel)
    assert np.array_equal(np.asarray(y_single), np.asarray(y_sharded))


def test_shardmap_persistent_matches_single_device():
    """Every device runs the fused kernel on its own utterances; outputs must
    equal the single-device kernel run (zero cross-chip traffic by
    construction)."""
    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=4)
    B, T, chunk = 8, 8, 4
    params, cond, sel = case(cfg, B, T)

    gen1 = persistent.make_persistent_generator(cfg, B, chunk, interpret=True)
    ring = persistent.init_ring(cfg, B)
    ys = jnp.full((2, B), cfg.silence_bin, jnp.int32)
    y_single = np.asarray(gen1(params, np.array([0]), jnp.asarray(cond),
                               jnp.asarray(sel), ring, ys)[0])

    m = mesh_lib.data_mesh(4)
    gen_sh = mesh_lib.make_sharded_persistent_generator(
        cfg, m, batch_per_device=2, chunk=chunk, interpret=True)
    y_sh, ring_o, ys_o = gen_sh(params, jnp.array([0, T, 0], jnp.int32),
                                jnp.asarray(cond), jnp.asarray(sel), ring, ys)
    assert np.array_equal(y_single, np.asarray(y_sh))
    assert ring_o.shape == ring.shape and ys_o.shape == ys.shape


def test_data_mesh_shapes():
    m = mesh_lib.data_mesh(8)
    assert m.shape["data"] == 8
    m2 = mesh_lib.data_mesh(4)
    assert m2.shape["data"] == 4


def test_mesh_engine_matches_golden_exactly():
    """The mesh-aware engine (batch sharded over 4 virtual devices, weights
    replicated, shard_map'd fused kernel) must bit-match the golden model
    through the public API, including ragged run_chunks boundaries."""
    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer
    from nv_wavenet_tpu.models.golden import WaveNetGolden
    from nv_wavenet_tpu.models import params as params_lib

    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=4)
    B, T = 8, 12
    ref_w = params_lib.random_reference_weights(cfg, seed=51)
    rng = np.random.RandomState(5)
    cond = rng.uniform(-0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)

    golden = WaveNetGolden(cfg, B, T)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    y_gold = golden.run(T, B)

    m = mesh_lib.data_mesh(4)
    eng = WaveNetInfer(num_layers=cfg.num_layers,
                       max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                       A=cfg.A, max_batch=B, chunk_size=8, interpret=True,
                       mesh=m)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, sel)
    y = eng.run_chunks(5, lambda *_: None, T, B)  # ragged: 5 + 5 + 2
    assert np.array_equal(y, y_gold)

    # MANYBLOCK under the same mesh must agree too
    eng2 = WaveNetInfer(num_layers=cfg.num_layers,
                        max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                        A=cfg.A, max_batch=B, chunk_size=8, interpret=True,
                        implementation=Impl.MANYBLOCK, mesh=m)
    eng2.set_reference_weights(ref_w)
    eng2.set_inputs(cond, sel)
    assert np.array_equal(eng2.run(T, B), y_gold)


def test_mesh_engine_streaming_feed():
    """Streaming feed under a mesh: sharded incremental chunks must
    reproduce the golden model exactly."""
    from nv_wavenet_tpu.engine.wavenet_infer import WaveNetInfer
    from nv_wavenet_tpu.models.golden import WaveNetGolden
    from nv_wavenet_tpu.models import params as params_lib

    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    B, T = 8, 10
    ref_w = params_lib.random_reference_weights(cfg, seed=81)
    rng = np.random.RandomState(8)
    cond = rng.uniform(-0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)
    golden = WaveNetGolden(cfg, B, T)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    y_gold = golden.run(T, B)

    eng = WaveNetInfer(num_layers=cfg.num_layers,
                       max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                       A=cfg.A, max_batch=B, chunk_size=8, interpret=True,
                       mesh=mesh_lib.data_mesh(4))
    eng.set_reference_weights(ref_w)
    eng.begin_stream(B)
    outs, off = [], 0
    for n in (4, 3, 3):
        outs.append(eng.feed(cond[off:off + n], sel[off:off + n]))
        off += n
    assert np.array_equal(np.concatenate(outs, axis=1), y_gold)


def test_mesh_engine_scoring_matches_single_device():
    """Mesh-capable scoring (VERDICT r4 #6): the time-parallel scorer is
    batch-parallel by construction, so under an 8-virtual-device mesh
    `score_device`/`score` must return p_seq matching the single-device
    scorer shard-for-shard, advance the carried state identically, and
    hand off to a subsequent sharded feed bit-exactly."""
    from nv_wavenet_tpu.engine.wavenet_infer import WaveNetInfer

    cfg = WaveNetConfig(num_layers=4, R=32, S=128, A=256, max_dilation=4)
    B, T1, T2 = 8, 9, 7
    ref_w = params_lib.random_reference_weights(cfg, seed=83)
    rng = np.random.RandomState(9)
    cond = rng.uniform(-0.5, 0.5, (T1 + T2, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T1 + T2, B)).astype(np.float32)

    def make(mesh):
        eng = WaveNetInfer(num_layers=cfg.num_layers,
                           max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                           A=cfg.A, max_batch=B, chunk_size=8,
                           interpret=True, mesh=mesh)
        eng.set_reference_weights(ref_w)
        eng.begin_stream(B)
        return eng

    # single-device reference: generate a prefix, then score it + continue
    eng1 = make(None)
    y1 = eng1.feed(cond[:T1], sel[:T1])
    eng1b = make(None)
    p_single = eng1b.score(cond[:T1], y1)
    y2_single = eng1b.feed(cond[T1:], sel[T1:])

    eng8 = make(mesh_lib.data_mesh(8))
    p_mesh = eng8.score(cond[:T1], y1)
    y2_mesh = eng8.feed(cond[T1:], sel[T1:])
    assert np.array_equal(p_mesh, p_single)
    assert np.array_equal(y2_mesh, y2_single)


def test_mesh_engine_dump_activations():
    """dump_activations under a mesh: per-shard dump outputs concatenate on
    the batch axis, so the full getter surface works exactly like
    single-device (the reference's dumpActivations + getters,
    `nv_wavenet.cuh:424-444`) — previously asserted out under a mesh."""
    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer
    from nv_wavenet_tpu.models.golden import WaveNetGolden
    from tests.test_golden_vs_scan import rel_close

    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=4)
    B, T = 8, 8
    ref_w = params_lib.random_reference_weights(cfg, seed=57)
    rng = np.random.RandomState(9)
    cond = rng.uniform(-0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)

    golden = WaveNetGolden(cfg, B, T)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    y_gold = golden.run(T, B)

    for impl in (None, Impl.MANYBLOCK):
        kw = {} if impl is None else {"implementation": impl}
        eng = WaveNetInfer(num_layers=cfg.num_layers,
                           max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                           A=cfg.A, max_batch=B, chunk_size=8, interpret=True,
                           mesh=mesh_lib.data_mesh(4), **kw)
        eng.set_reference_weights(ref_w)
        eng.set_inputs(cond, sel)
        y = eng.run(T, B, dump_activations=True)
        assert np.array_equal(y, y_gold)
        for l in range(cfg.num_layers):
            assert rel_close(golden.get_xt_out(l), eng.get_xt_out(l), 1e-2,
                             atol=3e-4)
            assert rel_close(golden.get_skip_out(l), eng.get_skip_out(l),
                             1e-2, atol=3e-4)
        assert rel_close(golden.get_zs(), eng.get_zs(), 1e-4, atol=2e-5)
        assert rel_close(golden.get_za(), eng.get_za(), 1e-4, atol=2e-5)
        assert rel_close(golden.get_p(), eng.get_p(), 1e-3)
        assert np.allclose(eng.get_p().sum(-1), 1.0, atol=1e-5)


def test_mesh_engine_int8_stream_matches_single_device():
    """int8 weight streaming under a mesh: the batch-sharded MANYBLOCK
    engine must emit the same integers as the single-device int8 engine
    (determinism contract composed with mesh exactness)."""
    from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer
    from nv_wavenet_tpu.models import params as params_lib

    cfg = WaveNetConfig(num_layers=6, R=32, S=128, A=256, max_dilation=4)
    B, T = 8, 12
    ref_w = params_lib.random_reference_weights(cfg, seed=61)
    rng = np.random.RandomState(6)
    cond = rng.uniform(-0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)

    def run(mesh):
        eng = WaveNetInfer(num_layers=cfg.num_layers,
                           max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                           A=cfg.A, max_batch=B, chunk_size=8,
                           implementation=Impl.MANYBLOCK,
                           stream_quant="int8", interpret=True, mesh=mesh)
        eng.set_reference_weights(ref_w)
        eng.set_inputs(cond, sel)
        return eng.run(T, B)

    y_single = run(None)
    y_mesh = run(mesh_lib.data_mesh(4))
    assert np.array_equal(y_mesh, y_single)


def test_mesh_engine_state_export_import():
    """State snapshot/restore composes with the mesh engine: a sharded
    stream resumed from export_state in a fresh mesh engine matches the
    uninterrupted sharded stream."""
    from nv_wavenet_tpu.engine.wavenet_infer import WaveNetInfer
    from nv_wavenet_tpu.models import params as params_lib

    cfg = WaveNetConfig(num_layers=4, R=32, S=64, A=256, max_dilation=4)
    B, T = 8, 12
    ref_w = params_lib.random_reference_weights(cfg, seed=71)
    rng = np.random.RandomState(7)
    cond = rng.uniform(-0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)

    def mk():
        eng = WaveNetInfer(num_layers=cfg.num_layers,
                           max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                           A=cfg.A, max_batch=B, chunk_size=8,
                           interpret=True, mesh=mesh_lib.data_mesh(4))
        eng.set_reference_weights(ref_w)
        return eng

    e0 = mk()
    e0.begin_stream(B)
    y_full = np.concatenate([e0.feed(cond[:7], sel[:7]),
                             e0.feed(cond[7:], sel[7:])], axis=1)
    e1 = mk()
    e1.begin_stream(B)
    y_a = e1.feed(cond[:7], sel[:7])
    e2 = mk()
    e2.import_state(e1.export_state())
    y_b = e2.feed(cond[7:], sel[7:])
    assert np.array_equal(np.concatenate([y_a, y_b], axis=1), y_full)
