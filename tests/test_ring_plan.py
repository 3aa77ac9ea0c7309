"""Invariants of the lane-packed ring layout (WaveNetConfig.packed_ring_plan):
every (row-range, lane-slot) a layer owns must be disjoint from every other
layer's, rows must cover exactly the packed FIFO space, and the plan must
degenerate to the unpacked layout when R fills the lane width."""
import pytest

from nv_wavenet_tpu.config import WaveNetConfig


@pytest.mark.parametrize("L,R,md", [
    (20, 64, 512), (24, 64, 128), (30, 64, 128), (40, 128, 128),
    (20, 32, 8), (16, 128, 128), (7, 32, 4), (1, 64, 1), (13, 256, 64),
])
def test_packed_slots_disjoint_and_complete(L, R, md):
    cfg = WaveNetConfig(num_layers=L, R=R, S=128, A=256, max_dilation=md)
    rows, pack, row_offs, lane_slots = cfg.packed_ring_plan()
    assert pack == max(1, 128 // R)
    owned = set()
    for l, d in enumerate(cfg.dilations):
        assert 0 <= lane_slots[l] < pack
        for r in range(row_offs[l], row_offs[l] + d):
            assert r < rows
            cell = (r, lane_slots[l])
            assert cell not in owned, f"layer {l} collides at {cell}"
            owned.add(cell)
    # every FIFO slot of every layer is represented exactly once
    assert len(owned) == cfg.ring_size
    # packing never wastes more than (pack-1) partial rows per dilation group
    assert rows <= cfg.ring_size
    n_groups = len(set(cfg.dilations))
    assert rows * pack < cfg.ring_size + pack * sum(
        d for d in set(cfg.dilations))


def test_pack_one_is_unpacked_layout():
    cfg = WaveNetConfig(num_layers=8, R=128, S=128, A=256, max_dilation=8)
    rows, pack, row_offs, lane_slots = cfg.packed_ring_plan()
    assert pack == 1 and rows == cfg.ring_size
    assert all(q == 0 for q in lane_slots)


def test_flagship_halves_ring_rows():
    cfg = WaveNetConfig(num_layers=20, R=64, S=256, A=256, max_dilation=512)
    rows, pack, _, _ = cfg.packed_ring_plan()
    assert pack == 2
    assert rows == cfg.ring_size // 2  # 2 full dilation cycles pair exactly
