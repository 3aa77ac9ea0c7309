"""Persistent XLA compilation cache — makes recompiles of unchanged kernels
near-instant across processes (the remote TPU compile service otherwise costs
minutes per (config, batch, chunk) tuple).  Called by every CLI entry point.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get("NV_WAVENET_TPU_CACHE",
                             os.path.join(os.path.dirname(os.path.dirname(
                                 os.path.dirname(os.path.abspath(__file__)))),
                                 ".jax_cache"))


def enable_compilation_cache(cache_dir: str = DEFAULT_DIR) -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs — caching is an optimization only
