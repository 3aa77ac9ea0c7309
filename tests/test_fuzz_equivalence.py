"""Randomized cross-implementation equivalence fuzz: seeded random
geometries (L, R, S, A, max_dilation, batch, T, tanh_embed) driven through
the numpy golden, the XLA scan generator, the interpret-mode Pallas kernel
and (where built) the native C++ oracle — every sampled integer must match
exactly.  Broadens the fixed test matrix the same way the reference's
srand-seeded runs do (`nv_wavenet_test.cu:343-394`), but over geometry too.
"""
import numpy as np
import pytest

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.engine.wavenet_infer import Impl, WaveNetInfer
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.models.golden import WaveNetGolden
from nv_wavenet_tpu.utils import native


def random_geometry(rng):
    R = int(rng.choice([32, 64, 128]))
    return dict(
        num_layers=int(rng.randint(1, 9)),
        R=R,
        S=int(rng.choice([64, 128, 256])),
        A=int(rng.choice([256, 512])),
        max_dilation=int(rng.choice([1, 2, 4, 8])),
        tanh_embed=bool(rng.randint(2)),
    )


@pytest.mark.parametrize("seed", range(6))
def test_random_geometry_exact_equivalence(seed):
    rng = np.random.RandomState(1000 + seed)
    cfg = WaveNetConfig(**random_geometry(rng))
    B = int(rng.randint(1, 5))
    T = int(rng.randint(3, 14))
    ref_w = params_lib.random_reference_weights(cfg, seed=2000 + seed)
    cond = rng.uniform(-0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)

    golden = WaveNetGolden(cfg, B, T)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    y_gold = golden.run(T, B)

    for impl in (Impl.PERSISTENT, Impl.MANYBLOCK):
        eng = WaveNetInfer(num_layers=cfg.num_layers,
                           max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                           A=cfg.A, max_batch=B, implementation=impl,
                           tanh_embed=cfg.tanh_embed, chunk_size=8,
                           interpret=True)
        eng.set_reference_weights(ref_w)
        eng.set_inputs(cond, sel)
        # ragged split exercises carried state at a random boundary
        cut = int(rng.randint(1, T))
        ya = eng.run_partial(0, cut, B)
        yb = eng.run_partial(cut, T - cut, B)
        y = np.concatenate([ya, yb], axis=1)
        assert np.array_equal(y, y_gold), (
            f"seed {seed} cfg {cfg} impl {impl} mismatch "
            f"(agree {np.mean(y == y_gold):.3f})")

    if native.available():
        nat = native.NativeGolden(cfg)
        nat.set_canonical_params(params_lib.to_canonical(ref_w, cfg))
        y_nat = nat.run(cond, sel)
        assert np.array_equal(y_nat, y_gold), f"seed {seed} C++ oracle mismatch"


@pytest.mark.parametrize("seed", range(4))
def test_random_geometry_streaming_knobs_exact(seed):
    """MANYBLOCK scheduling knobs fuzz: random group size (including one
    larger than L) and next-step prefetch are pure scheduling choices — the
    streamed kernel must stay bit-identical to the golden at random
    geometries and ragged split points."""
    rng = np.random.RandomState(4000 + seed)
    cfg = WaveNetConfig(**random_geometry(rng))
    B = int(rng.randint(1, 4))
    T = int(rng.randint(4, 14))
    ref_w = params_lib.random_reference_weights(cfg, seed=5000 + seed)
    cond = rng.uniform(-0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)

    golden = WaveNetGolden(cfg, B, T)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    y_gold = golden.run(T, B)

    gs = int(rng.randint(1, cfg.num_layers + 3))   # may exceed L
    eng = WaveNetInfer(num_layers=cfg.num_layers,
                       max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                       A=cfg.A, max_batch=B, implementation=Impl.MANYBLOCK,
                       tanh_embed=cfg.tanh_embed, chunk_size=8,
                       stream_group_size=gs,
                       stream_prefetch=bool(rng.randint(2)),
                       interpret=True)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, sel)
    cut = int(rng.randint(1, T))
    y = np.concatenate([eng.run_partial(0, cut, B),
                        eng.run_partial(cut, T - cut, B)], axis=1)
    assert np.array_equal(y, y_gold), (
        f"seed {seed} cfg {cfg} gs {gs} mismatch "
        f"(agree {np.mean(y == y_gold):.3f})")


@pytest.mark.parametrize("seed", range(3))
def test_random_geometry_int8_stream_deterministic(seed):
    """int8 weight streaming fuzz: at random geometries the quantized
    kernel must BIT-MATCH the scan generator fed the identical
    quantize->dequantize round-tripped weights (the determinism contract —
    int8 changes the distribution, never the reproducibility)."""
    import jax.numpy as jnp

    from nv_wavenet_tpu.ops import persistent, scan_generate

    rng = np.random.RandomState(6000 + seed)
    cfg = WaveNetConfig(**random_geometry(rng))
    B = int(rng.randint(1, 4))
    T = int(rng.randint(4, 12))
    ref_w = params_lib.random_reference_weights(cfg, seed=7000 + seed)
    cond = rng.uniform(-0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)

    eng = WaveNetInfer(num_layers=cfg.num_layers,
                       max_dilation=cfg.max_dilation, R=cfg.R, S=cfg.S,
                       A=cfg.A, max_batch=B, implementation=Impl.MANYBLOCK,
                       tanh_embed=cfg.tanh_embed, chunk_size=8,
                       stream_quant="int8", interpret=True)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, sel)
    y_q = eng.run(T, B)

    params = {k: jnp.asarray(v)
              for k, v in params_lib.to_canonical(ref_w, cfg).items()}
    params_dq = persistent.dequantize_stream_params(params)
    st = scan_generate.init_state(cfg, B)
    _, y_scan, _ = scan_generate.generate(params_dq, st, jnp.asarray(cond),
                                          jnp.asarray(sel), cfg)
    assert np.array_equal(np.asarray(y_scan), y_q), (
        f"seed {seed} int8 determinism mismatch "
        f"(agree {np.mean(np.asarray(y_scan) == y_q):.3f})")


@pytest.mark.parametrize("seed", range(2))
def test_flagship_geometry_exact_equivalence(seed):
    """Large-geometry fuzz (VERDICT r3 #8): flagship-scale config (20L 64R
    256S 256A maxD=512) at an odd batch — the lane-packed ring has
    multi-row lane packing and exotic R-multiple lane offsets here, which
    the small-geometry fuzz cases never reach.  (T is small for interpret-
    mode speed, not for exactness — the contract is horizon-free since the
    bit-identical transcendental library; see test_golden_vs_scan.
    test_horizon_65536_draws_exact.)"""
    rng = np.random.RandomState(8000 + seed)
    cfg = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=512,
                        tanh_embed=bool(seed % 2))
    B = 5  # odd: exercises ragged sublane batch against the packed ring
    T = int(rng.randint(12, 20))
    ref_w = params_lib.random_reference_weights(cfg, seed=9000 + seed)
    cond = rng.uniform(-0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)

    golden = WaveNetGolden(cfg, B, T)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, sel)
    y_gold = golden.run(T, B)

    eng = WaveNetInfer(num_layers=cfg.num_layers, max_dilation=cfg.max_dilation,
                       R=cfg.R, S=cfg.S, A=cfg.A, max_batch=B,
                       implementation=Impl.PERSISTENT,
                       tanh_embed=cfg.tanh_embed, chunk_size=8,
                       interpret=True)
    eng.set_reference_weights(ref_w)
    eng.set_inputs(cond, sel)
    cut = int(rng.randint(1, T))
    y = np.concatenate([eng.run_partial(0, cut, B),
                        eng.run_partial(cut, T - cut, B)], axis=1)
    assert np.array_equal(y, y_gold), (
        f"seed {seed} flagship-geometry mismatch "
        f"(agree {np.mean(y == y_gold):.3f})")

    if native.available():
        nat = native.NativeGolden(cfg)
        nat.set_canonical_params(params_lib.to_canonical(ref_w, cfg))
        assert np.array_equal(nat.run(cond, sel), y_gold), (
            f"seed {seed} flagship C++ oracle mismatch")
