"""Model / engine configuration for the TPU-native WaveNet framework.

The reference (NVIDIA/nv-wavenet) fixes the channel sizes R/S/A at *compile
time* as C++ template parameters (`/root/reference/nv_wavenet.cuh:220`,
`pytorch/wavenet_infer.cu:35-37`).  Here they are plain static Python values:
changing them triggers a JAX retrace instead of an nvcc rebuild.

Terminology (kept from the reference so the parity mapping is obvious):
  R = residual channels, S = skip channels, A = audio quantization channels
  (mu-law bins), L = number of residual layers, max_dilation = largest
  dilation in the cycling schedule (`nv_wavenet_reference.cpp:285-289`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


def dilation_schedule(num_layers: int, max_dilation: int) -> Tuple[int, ...]:
    """Cycling power-of-two dilations: 1, 2, ..., max_dilation, 1, 2, ...

    Mirrors the reference schedule (`nv_wavenet_reference.cpp:285-289`): the
    dilation doubles each layer and resets to 1 once it exceeds max_dilation.
    The training-side model uses the same cycle (`pytorch/wavenet.py:82-84`).
    """
    if max_dilation < 1 or (max_dilation & (max_dilation - 1)) != 0:
        raise ValueError(f"max_dilation must be a power of two, got {max_dilation}")
    dils = []
    d = 1
    for _ in range(num_layers):
        dils.append(d)
        d *= 2
        if d > max_dilation:
            d = 1
    return tuple(dils)


@dataclasses.dataclass(frozen=True)
class WaveNetConfig:
    """Static shape/behavior config shared by the golden model, the XLA scan
    generator, the Pallas persistent kernel, the engine and the trainer."""

    num_layers: int = 20
    R: int = 64           # residual channels
    S: int = 128          # skip channels
    A: int = 256          # output channels (mu-law bins)
    max_dilation: int = 512
    tanh_embed: bool = True   # apply tanh after the 2-tap embedding sum
                              # (`nv_wavenet_singleblock.cuh:97-99`)
    silence_bin: int = 128    # initial yPrev/yCur and sampler fallback value
                              # (`nv_wavenet_reference.cpp:237-240`, `softmax.cuh:155`)

    def __post_init__(self):
        assert self.num_layers >= 1
        assert self.A >= 2

    @property
    def dilations(self) -> Tuple[int, ...]:
        return dilation_schedule(self.num_layers, self.max_dilation)

    @property
    def ring_offsets(self) -> Tuple[int, ...]:
        """Start offset of each layer's circular dilation queue.

        TPU-native replacement for the reference's shared (max_dilation+1)-deep
        activation ring (`nv_wavenet.cuh:101-102,335`): instead of one ring of
        depth maxD+1 holding every layer's activations, each layer l keeps a
        FIFO of exactly depth d_l (the "Fast WaveNet" queue), packed into one
        buffer.  Slot for layer l at time t is offsets[l] + (t mod d_l); the
        value read is x^l_{t-d_l}, and x^l_t is written back to the same slot.
        """
        offs = []
        acc = 0
        for d in self.dilations:
            offs.append(acc)
            acc += d
        return tuple(offs)

    @property
    def ring_size(self) -> int:
        return sum(self.dilations)

    def packed_ring_plan(self, lane_width: int = 128):
        """Lane-packed ring layout for the persistent kernel.

        A [slots, B, R] ring wastes lanes when R < 128 (the minor dim pads to
        128).  Layers with EQUAL dilation (the cycling schedule repeats every
        cycle, `nv_wavenet_reference.cpp:288-289`) index the same FIFO slot at
        every t, so up to 128//R of them can share one 128-lane row, each in
        its own R-lane column block.  Returns (rows, pack, row_offs, lane_slots):
        rows = total packed rows, pack = layers per row (1 if R >= lane_width,
        then the layout degenerates to the unpacked one), row_offs[l] /
        lane_slots[l] = layer l's FIFO base row and column block index.
        """
        pack = max(1, lane_width // self.R)
        by_d: dict = {}
        for l, d in enumerate(self.dilations):
            by_d.setdefault(d, []).append(l)
        row_offs = [0] * self.num_layers
        lane_slots = [0] * self.num_layers
        rows = 0
        for d in sorted(by_d):
            group = by_d[d]
            for i in range(0, len(group), pack):
                for q, l in enumerate(group[i:i + pack]):
                    row_offs[l] = rows
                    lane_slots[l] = q
                rows += d
        return rows, pack, tuple(row_offs), tuple(lane_slots)

    @property
    def receptive_field(self) -> int:
        return sum(self.dilations) + 1

    def param_count(self) -> int:
        L, R, S, A = self.num_layers, self.R, self.S, self.A
        return (2 * A * R                      # embeddings (prev + cur)
                + L * (2 * R * 2 * R + 2 * R)  # dilated conv W + b
                + L * (R * R + R)              # residual W + b
                + L * (S * R + S)              # skip W + b
                + A * S + A                    # out (Zs) W + b
                + A * A + A)                   # end (Za) W + b

    def weight_bytes(self, dtype_bytes: int = 4) -> int:
        return self.param_count() * dtype_bytes

    def ring_bytes(self, batch: int, dtype_bytes: int = 4) -> int:
        return self.ring_size * batch * self.R * dtype_bytes


# Configs used by the reference test matrix (`nv_wavenet_test.cu:345-394`) and
# the BASELINE.json required configs.
TEST_CONFIG_SMALL = WaveNetConfig(num_layers=20, R=32, S=128, A=256, max_dilation=8)
TEST_CONFIG_MED = WaveNetConfig(num_layers=20, R=64, S=128, A=256, max_dilation=8)
TEST_CONFIG_LARGE = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=8)
FLAGSHIP_CONFIG = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=512)
