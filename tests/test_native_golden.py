"""Cross-check the native C++ oracle against the numpy golden model — three
independent implementations (C++, numpy, JAX) must agree on integer outputs.
"""

import numpy as np
import pytest

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.models.golden import WaveNetGolden
from nv_wavenet_tpu.utils import native

from tests.test_golden_vs_scan import make_case

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")


@pytest.mark.parametrize("cfg,batch,samples", [
    (WaveNetConfig(num_layers=20, R=32, S=128, A=256, max_dilation=8), 4, 24),
    (WaveNetConfig(num_layers=10, R=64, S=256, A=256, max_dilation=8), 2, 16),
])
def test_native_matches_numpy_golden(cfg, batch, samples):
    ref_w, cond, selectors = make_case(cfg, batch, samples, seed=55)
    golden = WaveNetGolden(cfg, max_batch=batch, max_samples=samples)
    golden.set_reference_weights(ref_w)
    golden.set_inputs(cond, selectors)
    y_np = golden.run(samples, batch)

    ng = native.NativeGolden(cfg)
    ng.set_canonical_params(params_lib.to_canonical(ref_w, cfg))
    y_cc = ng.run(cond, selectors)
    assert np.array_equal(y_np, y_cc), f"numpy {y_np}\nnative {y_cc}"

    y_np_am = golden.run(samples, batch, mode="argmax")
    y_cc_am = ng.run(cond, selectors, mode="argmax")
    assert np.array_equal(y_np_am, y_cc_am)


def test_native_state_carries():
    cfg = WaveNetConfig(num_layers=8, R=32, S=128, A=256, max_dilation=4)
    ref_w, cond, selectors = make_case(cfg, 2, 12, seed=3)
    ng = native.NativeGolden(cfg)
    ng.set_canonical_params(params_lib.to_canonical(ref_w, cfg))
    y_full = ng.run(cond, selectors)
    y1 = ng.run(cond[:5], selectors[:5])
    y2 = ng.run(cond[5:], selectors[5:], reset=False)
    assert np.array_equal(y_full, np.concatenate([y1, y2], axis=1))


def test_from_canonical_round_trip():
    """from_canonical is the exact inverse of to_canonical, and the golden's
    set_canonical_params reproduces set_reference_weights bit-for-bit."""
    import numpy as np

    from nv_wavenet_tpu.config import WaveNetConfig
    from nv_wavenet_tpu.models import params as params_lib
    from nv_wavenet_tpu.models.golden import WaveNetGolden

    cfg = WaveNetConfig(num_layers=5, R=32, S=64, A=256, max_dilation=4)
    ref = params_lib.random_reference_weights(cfg, seed=11)
    canon = params_lib.to_canonical(ref, cfg)
    back = params_lib.from_canonical(canon, cfg)
    assert np.array_equal(back["embed_prev"], ref["embed_prev"])
    for l in range(cfg.num_layers):
        for k in ("Wprev", "Wcur", "Bh", "Wres", "Bres", "Wskip", "Bskip"):
            assert np.array_equal(back[k][l], ref[k][l]), (k, l)
    for k in ("Wzs", "Bzs", "Wza", "Bza"):
        assert np.array_equal(back[k], ref[k])

    B, T = 2, 12
    rng = np.random.RandomState(2)
    cond = rng.uniform(-0.5, 0.5, (T, cfg.num_layers, B, 2 * cfg.R)
                       ).astype(np.float32)
    sel = rng.uniform(0, 1, (T, B)).astype(np.float32)
    g1 = WaveNetGolden(cfg, B, T)
    g1.set_reference_weights(ref)
    g1.set_inputs(cond, sel)
    g2 = WaveNetGolden(cfg, B, T)
    g2.set_canonical_params(canon)
    g2.set_inputs(cond, sel)
    assert np.array_equal(g1.run(T, B), g2.run(T, B))
