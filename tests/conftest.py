"""Force tests onto a virtual 8-device CPU mesh.

Real-TPU validation is done by bench.py / tools/perf.py and the driver's
__graft_entry__ checks; unit tests must be hermetic and runnable anywhere.

NOTE: this environment's sitecustomize force-sets jax_platforms to
"axon,cpu" (tunneled TPU), overriding the JAX_PLATFORMS env var — so the
config must be updated programmatically after importing jax.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
