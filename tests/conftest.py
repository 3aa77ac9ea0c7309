"""Force tests onto a virtual 8-device CPU mesh.

Real-TPU validation is done by bench.py / tools/perf.py and the driver's
__graft_entry__ checks; unit tests must be hermetic and runnable anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
