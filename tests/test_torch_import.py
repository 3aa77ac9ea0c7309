"""Reference-checkpoint migration (`engine/torch_import.py`).

Builds a state_dict exactly shaped like the reference's trainable WaveNet
(`/root/reference/pytorch/wavenet.py:54-100`: Conv wrappers around Conv1d,
ConvTranspose1d upsampler, Embedding), cross-checks the numpy conditioning
path against REAL torch modules carrying the same weights, and runs the
migrated weights end-to-end through NVWaveNet.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nv_wavenet_tpu.engine.nv_wavenet import NVWaveNet
from nv_wavenet_tpu.engine.torch_import import (cond_input_from_state_dict,
                                                export_weights_from_state_dict)

L, R, S, A, C = 4, 32, 64, 256, 20          # layers, res, skip, out, cond
W_UP, STRIDE = 32, 8                         # upsample window / stride
MAXD = 4


def make_state_dict(seed=0):
    rng = np.random.RandomState(seed)

    def t(*shape, scale=0.1):
        return torch.from_numpy(
            rng.uniform(-scale, scale, shape).astype(np.float32))

    sd = {
        "embed.weight": t(A, R),
        "conv_out.conv.weight": t(A, S, 1),
        "conv_end.conv.weight": t(A, A, 1),
        "upsample.weight": t(C, C, W_UP),
        "upsample.bias": t(C),
        "cond_layers.conv.weight": t(2 * R * L, C, 1),
        "cond_layers.conv.bias": t(2 * R * L),
    }
    for i in range(L):
        sd[f"dilate_layers.{i}.conv.weight"] = t(2 * R, R, 2)
        sd[f"dilate_layers.{i}.conv.bias"] = t(2 * R)
        sd[f"skip_layers.{i}.conv.weight"] = t(S, R, 1)
        sd[f"skip_layers.{i}.conv.bias"] = t(S)
        if i < L - 1:
            sd[f"res_layers.{i}.conv.weight"] = t(R, R, 1)
            sd[f"res_layers.{i}.conv.bias"] = t(R)
    return sd


def torch_get_cond_input(sd, mels):
    """The reference's get_cond_input (`pytorch/wavenet.py:190-202`) with
    real torch modules loaded from the state_dict."""
    up = torch.nn.ConvTranspose1d(C, C, W_UP, STRIDE)
    up.weight.data = sd["upsample.weight"]
    up.bias.data = sd["upsample.bias"]
    cond_layers = torch.nn.Conv1d(C, 2 * R * L, 1)
    cond_layers.weight.data = sd["cond_layers.conv.weight"]
    cond_layers.bias.data = sd["cond_layers.conv.bias"]
    with torch.no_grad():
        x = up(torch.from_numpy(mels))
        x = x[:, :, :-(W_UP - STRIDE)]
        z = cond_layers(x)
    z = z.view(z.size(0), L, -1, z.size(2))
    return z.permute(2, 0, 1, 3).numpy()


def test_cond_input_matches_torch():
    sd = make_state_dict()
    rng = np.random.RandomState(3)
    mels = rng.uniform(-1, 1, (2, C, 12)).astype(np.float32)
    got = cond_input_from_state_dict(sd, mels, upsamp_stride=STRIDE)
    want = torch_get_cond_input(sd, mels)
    assert got.shape == want.shape == (2 * R, 2, L, 12 * STRIDE)
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_export_and_infer_end_to_end():
    """state_dict -> export dict -> NVWaveNet -> generation (shape/range),
    deterministic under a fixed seed."""
    sd = make_state_dict()
    d = export_weights_from_state_dict(sd, max_dilation=MAXD)
    assert d["use_embed_tanh"] is False
    assert len(d["dilate_weights"]) == L and len(d["res_weights"]) == L - 1
    assert d["embedding_prev"].shape == (A, R)
    assert not d["embedding_prev"].any()

    net = NVWaveNet(**d)
    assert (net.num_layers, net.R, net.S, net.A) == (L, R, S, A)
    rng = np.random.RandomState(5)
    mels = rng.uniform(-1, 1, (2, C, 4)).astype(np.float32)
    cond = cond_input_from_state_dict(sd, mels, upsamp_stride=STRIDE)
    y1 = net.infer(cond, seed=0)
    y2 = net.infer(cond, seed=0)
    assert y1.shape == (2, 4 * STRIDE)
    assert 0 <= y1.min() and y1.max() < A
    assert np.array_equal(y1, y2)
