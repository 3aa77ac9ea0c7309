"""nv_wavenet_tpu — a TPU-native autoregressive WaveNet vocoder framework.

From-scratch JAX/Pallas/pjit rebuild with the capabilities of
NVIDIA/nv-wavenet (see SURVEY.md for the reference analysis and the
design-translation rationale).
"""

__version__ = "0.1.0"

from nv_wavenet_tpu.config import WaveNetConfig, dilation_schedule  # noqa: F401
