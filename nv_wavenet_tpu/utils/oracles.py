"""Shared value-oracles for hardware verification tools.

The int8 weight-streaming tier's exactness contract — the MANYBLOCK
kernel's in-kernel dequantize is exactly rounded, so its integer outputs
must BIT-MATCH the scan generator fed the quantize->dequantize
round-tripped weights — is checked by both the hardware self-test
(nv_wavenet_tpu/tools/verify_drive.py) and the full-size equivalence
matrix (tools/equivalence_tpu.py).  The oracle lives here once so the two
checks cannot drift.
"""

from __future__ import annotations

import numpy as np

from nv_wavenet_tpu.config import WaveNetConfig


def int8_dequant_scan_oracle(cfg: WaveNetConfig, ref_w: dict, cond, sel
                             ) -> np.ndarray:
    """Integer samples [B, T] from the scan generator fed the int8
    quantize->dequantize round-tripped weights — the value oracle for
    `WaveNetInfer(stream_quant="int8")` runs over the same inputs."""
    import jax.numpy as jnp

    from nv_wavenet_tpu.models import params as params_lib
    from nv_wavenet_tpu.ops import persistent, scan_generate

    params = {k: jnp.asarray(v)
              for k, v in params_lib.to_canonical(ref_w, cfg).items()}
    params_dq = persistent.dequantize_stream_params(params)
    st = scan_generate.init_state(cfg, np.shape(sel)[1])
    _, y_scan, _ = scan_generate.generate(params_dq, st, jnp.asarray(cond),
                                          jnp.asarray(sel), cfg)
    return np.asarray(y_scan)           # [B, T] (generate's convention)
