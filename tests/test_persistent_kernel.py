"""Equivalence: Pallas persistent kernel vs the numpy golden model.

Runs in interpreter mode on CPU (hermetic); the identical kernel runs compiled
on real TPU via tools/perf.py and bench.py.  Contract mirrors
`nv_wavenet_test.cu`: exact integer sample match + activation tolerance
ladder, including deliberately uneven chunking.
"""

import numpy as np
import pytest

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.models.golden import WaveNetGolden
from nv_wavenet_tpu.ops import persistent, scan_generate

from tests.test_golden_vs_scan import make_case, rel_close


def run_kernel(cfg, params, cond, selectors, batch, chunk, mode="sample",
               dump=False, t0=0, ring=None, y_state=None):
    import jax.numpy as jnp
    T = cond.shape[0]
    pad = (-T) % chunk
    if pad:
        cond = np.concatenate([cond, np.zeros((pad,) + cond.shape[1:],
                                              cond.dtype)])
        selectors = np.concatenate([selectors,
                                    np.zeros((pad, batch), selectors.dtype)])
    gen = persistent.make_persistent_generator(
        cfg, batch, chunk, mode=mode, dump=dump, interpret=True)
    if ring is None:
        ring = persistent.init_ring(cfg, batch)
    if y_state is None:
        y_state = jnp.full((2, batch), cfg.silence_bin, jnp.int32)
    out = gen(params, np.array([t0]), jnp.asarray(cond), jnp.asarray(selectors),
              ring, y_state, n_valid=T)
    y, ring, y_state = out[0], out[1], out[2]
    dumps = out[3:] if dump else None
    return np.asarray(y)[:T].T, ring, y_state, dumps


CONFIGS = [
    (WaveNetConfig(num_layers=20, R=32, S=128, A=256, max_dilation=8), 4, 8, 4),
    (WaveNetConfig(num_layers=10, R=64, S=128, A=256, max_dilation=8), 2, 8, 8),
    (WaveNetConfig(num_layers=8, R=64, S=256, A=256, max_dilation=8), 2, 8, 4),
]


@pytest.mark.parametrize("cfg,batch,samples,chunk", CONFIGS)
def test_kernel_matches_golden(cfg, batch, samples, chunk):
    ref_w, cond, selectors = make_case(cfg, batch, samples, seed=11)
    golden = WaveNetGolden(cfg, max_batch=batch, max_samples=samples)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, selectors)
    y_gold = golden.run(samples, batch)

    params = params_lib.to_canonical(ref_w, cfg)
    y, _, _, dumps = run_kernel(cfg, params, cond, selectors, batch, chunk,
                                dump=True)
    assert np.array_equal(y_gold, y), f"golden {y_gold}\nkernel {y}"

    xt, skip, zs, za, p = [np.asarray(d) for d in dumps]
    for l in range(cfg.num_layers):
        assert rel_close(golden.get_xt_out(l), xt[l], 1e-2, atol=3e-4)
        assert rel_close(golden.get_skip_out(l), skip[l], 1e-2, atol=3e-4)
    assert rel_close(golden.get_zs(), zs, 1e-4, atol=2e-5)
    assert rel_close(golden.get_za(), za, 1e-4, atol=2e-5)
    assert rel_close(golden.get_p(), p, 1e-3)


def test_kernel_argmax_matches_golden():
    cfg = WaveNetConfig(num_layers=8, R=32, S=128, A=256, max_dilation=8)
    ref_w, cond, selectors = make_case(cfg, 2, 8, seed=5)
    golden = WaveNetGolden(cfg, max_batch=2, max_samples=8)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, selectors)
    y_gold = golden.run(8, 2, mode="argmax")
    params = params_lib.to_canonical(ref_w, cfg)
    y, _, _, _ = run_kernel(cfg, params, cond, selectors, 2, 4, mode="argmax")
    assert np.array_equal(y_gold, y)


def test_kernel_state_carries_across_calls():
    """Chunked run_partial parity: two kernel invocations with carried
    ring/y_state must equal one full run (`nv_wavenet.cuh:499-509`)."""
    cfg = WaveNetConfig(num_layers=8, R=32, S=128, A=256, max_dilation=4)
    ref_w, cond, selectors = make_case(cfg, 2, 12, seed=9)
    params = params_lib.to_canonical(ref_w, cfg)

    y_full, _, _, _ = run_kernel(cfg, params, cond, selectors, 2, 4)

    y1, ring, ys, _ = run_kernel(cfg, params, cond[:8], selectors[:8], 2, 4)
    y2, _, _, _ = run_kernel(cfg, params, cond[8:], selectors[8:], 2, 4,
                             t0=8, ring=ring, y_state=ys)
    assert np.array_equal(y_full, np.concatenate([y1, y2], axis=1))


# NOTE: the bf16 correctness contract (kernel-vs-scan EXACT integer match
# under bf16 weight storage + teacher-forced distribution-allclose for bf16
# compute / fast_math) lives in tests/test_low_precision.py.
