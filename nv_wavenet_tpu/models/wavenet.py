"""Trainable WaveNet (teacher-forced, convolutional over whole segments) in
flax.linen — functional parity with the reference training model
(`/root/reference/pytorch/wavenet.py:54-202`):

  * sample embedding of mu-law bins (A -> R),
  * mel conditioning upsampled with a transposed conv
    (window/stride from config) then a single 1x1 conv producing ALL layers'
    conditioning at once (n_cond -> 2R*L),
  * L causal dilated convs (k=2, cycling power-of-two dilations),
  * gated tanh/sigmoid activation, residual convs for the first L-1 layers,
    skip convs accumulated across layers,
  * relu -> conv_out (S->A, no bias) -> relu -> conv_end (A->A, no bias),
  * output logits shifted right one step (next-sample prediction targets).

Activations are channels-last [B, T, C] (TPU-friendly: C on lanes), unlike
the reference's [B, C, T].

`export_weights()`/`export_canonical()` convert trained params into the
inference-engine format, reproducing the reference's export conventions
(`pytorch/wavenet.py:147-188` + `pytorch/nv_wavenet.py:98-141`):
zero embedding_prev, tanh_embed=False, Wprev = dilated-conv tap 0 and
Wcur = tap 1, an all-zero extra residual layer appended for the last layer,
and zero biases on the two output convs (`pytorch/wavenet_infer.cu:75-82`).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nv_wavenet_tpu.config import WaveNetConfig, dilation_schedule


class MelUpsample(nn.Module):
    """Transposed-conv mel upsampler as einsum + overlap-add.

    Numerically equivalent to `nn.ConvTranspose(padding="VALID")` with the
    same "kernel"/"bias" parameters (checkpoint-compatible drop-in; the lax
    conv_transpose kernel convention corresponds to the window-reversed
    overlap-add, hence the flip).  The big-kernel strided ConvTranspose
    (window 800, stride 200) lowers catastrophically on TPU — measured 70 ms
    of a 75 ms training forward; this formulation is one MXU einsum over the
    frames plus window/stride shifted adds (<1 ms)."""

    features: int
    window: int
    stride: int
    precision: Any = "highest"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:   # [B, F, C] -> [B, T, D]
        assert self.window % self.stride == 0, (
            "MelUpsample requires window % stride == 0 "
            f"(got {self.window} % {self.stride})")
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.window, x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        B, F, _ = x.shape
        J = self.window // self.stride
        chunks = jnp.einsum("bfc,kcd->bfkd", x, k[::-1],
                            precision=self.precision)
        chunks = chunks.reshape(B, F, J, self.stride, self.features)
        out = jnp.zeros((B, F + J - 1, self.stride, self.features),
                        chunks.dtype)
        for j in range(J):
            out = out.at[:, j:j + F].add(chunks[:, :, j])
        # (F + J - 1) * stride == (F - 1) * stride + window: the full VALID
        # transposed-conv output, no trim needed here
        return out.reshape(B, (F + J - 1) * self.stride, self.features) + b


class WaveNetTrain(nn.Module):
    n_in_channels: int = 256      # A
    n_layers: int = 16
    max_dilation: int = 128
    n_residual_channels: int = 64   # R
    n_skip_channels: int = 256      # S
    n_out_channels: int = 256       # A
    n_cond_channels: int = 80       # mel bins
    upsamp_window: int = 800
    upsamp_stride: int = 200
    # exact-fp32 matmuls/convs: the default precision on TPU (and some CPU
    # paths) is bf16-level, which breaks the train-vs-inference exact
    # equivalence contract
    precision: str = "highest"

    def setup(self):
        A, R, S = self.n_out_channels, self.n_residual_channels, self.n_skip_channels
        L = self.n_layers
        self.embed = nn.Embed(self.n_in_channels, R)
        self.upsample = MelUpsample(
            features=self.n_cond_channels,
            window=self.upsamp_window,
            stride=self.upsamp_stride,
            precision=self.precision,
            name="upsample")
        self.cond_layer = nn.Conv(features=2 * R * L, kernel_size=(1,),
                                  precision=self.precision, name="cond_layer")
        dils = dilation_schedule(L, self.max_dilation)
        self.dilate_layers = [
            nn.Conv(features=2 * R, kernel_size=(2,), kernel_dilation=(d,),
                    padding="VALID", precision=self.precision,
                    name=f"dilate_{i}")
            for i, d in enumerate(dils)]
        self.res_layers = [
            nn.Conv(features=R, kernel_size=(1,), precision=self.precision,
                    name=f"res_{i}")
            for i in range(L - 1)]
        self.skip_layers = [
            nn.Conv(features=S, kernel_size=(1,), precision=self.precision,
                    name=f"skip_{i}")
            for i in range(L)]
        self.conv_out = nn.Conv(features=A, kernel_size=(1,), use_bias=False,
                                precision=self.precision, name="conv_out")
        self.conv_end = nn.Conv(features=A, kernel_size=(1,), use_bias=False,
                                precision=self.precision, name="conv_end")
        self._dilations = dils

    def _cond_acts(self, mel: jax.Array, length: int) -> jax.Array:
        """mel [B, T_mel, n_cond] -> per-layer conditioning [B, length, L, 2R].

        Upsample via transposed conv, crop to the audio length, then one 1x1
        conv for every layer's conditioning at once
        (`pytorch/wavenet.py:105-115`)."""
        up = self.upsample(mel)          # [B, T_up, n_cond]
        assert up.shape[1] >= length, (
            f"upsampled conditioning covers {up.shape[1]} samples < audio "
            f"length {length} (mel too short for this segment; the reference "
            f"asserts the same, `pytorch/wavenet.py:110`)")
        up = up[:, :length]
        cond = self.cond_layer(up)       # [B, T, 2R*L]
        B, T, _ = cond.shape
        return cond.reshape(B, T, self.n_layers, 2 * self.n_residual_channels)

    def __call__(self, mel: jax.Array, audio: jax.Array) -> jax.Array:
        """Teacher-forced forward.

        mel: [B, T_mel, n_cond]; audio: [B, T] int mu-law bins.
        Returns logits [B, T, A] where logits[:, t] predicts audio[:, t]
        (right-shifted by one: position 0 gets zeros, the model's output for
        position T-1 is dropped — `pytorch/wavenet.py:136-143`)."""
        R = self.n_residual_channels
        B, T = audio.shape
        cond = self._cond_acts(mel, T)                 # [B, T, L, 2R]
        x = self.embed(audio)                          # [B, T, R]

        output = None
        for i, d in enumerate(self._dilations):
            x_pad = jnp.pad(x, ((0, 0), (d, 0), (0, 0)))   # causal pad k=2
            in_act = self.dilate_layers[i](x_pad) + cond[:, :, i]
            t_act = jnp.tanh(in_act[..., :R])
            s_act = jax.nn.sigmoid(in_act[..., R:])
            acts = t_act * s_act
            if i < len(self.res_layers):
                x = self.res_layers[i](acts) + x
            s = self.skip_layers[i](acts)
            output = s if output is None else output + s

        output = jax.nn.relu(output)
        output = self.conv_out(output)
        output = jax.nn.relu(output)
        output = self.conv_end(output)                 # [B, T, A]
        # next-sample shift: drop last step, prepend zeros
        return jnp.concatenate(
            [jnp.zeros_like(output[:, :1]), output[:, :-1]], axis=1)

    def get_cond_input(self, mel: jax.Array) -> jax.Array:
        """Inference conditioning: [B, T_mel, n_cond] -> [T, L, B, 2R], the
        engine's set_inputs layout (`pytorch/wavenet.py:190-202`).  The
        transposed-conv tail artifact (window - stride frames) is trimmed."""
        up = self.upsample(mel)
        cutoff = self.upsamp_window - self.upsamp_stride
        up = up[:, :up.shape[1] - cutoff]
        cond = self.cond_layer(up)
        B, T, _ = cond.shape
        cond = cond.reshape(B, T, self.n_layers, 2 * self.n_residual_channels)
        return jnp.transpose(cond, (1, 2, 0, 3))       # [T, L, B, 2R]


def config_of(model: WaveNetTrain) -> WaveNetConfig:
    return WaveNetConfig(num_layers=model.n_layers,
                         R=model.n_residual_channels,
                         S=model.n_skip_channels,
                         A=model.n_out_channels,
                         max_dilation=model.max_dilation,
                         tanh_embed=False)


def export_canonical(params: Dict[str, Any], model: WaveNetTrain) -> Dict[str, np.ndarray]:
    """Trained flax params -> the engine's canonical inference pytree.

    Conventions reproduced from the reference export path:
      * embedding_prev = zeros, tanh_embed=False (`pytorch/wavenet.py:152-154,186`)
      * flax Conv kernels are [k, in, out]; tap 0 (older sample) is Wprev,
        tap 1 is Wcur (`pytorch/nv_wavenet.py:107-108`)
      * an all-zero residual layer is appended for the last layer
        (`pytorch/nv_wavenet.py:139-141`)
      * conv_out/conv_end have no biases -> zero out_b/end_b
        (`pytorch/wavenet_infer.cu:75-82`)
    """
    L = model.n_layers
    R = model.n_residual_channels
    S = model.n_skip_channels
    A = model.n_out_channels
    p = params["params"] if "params" in params else params

    embed_cur = np.asarray(p["embed"]["embedding"], np.float32)      # [A, R]
    embed = np.concatenate([np.zeros_like(embed_cur), embed_cur], axis=0)

    dil_w = np.zeros((L, 2 * R, 2 * R), np.float32)
    dil_b = np.zeros((L, 2 * R), np.float32)
    rs_w = np.zeros((L, R, R + S), np.float32)
    rs_b = np.zeros((L, R + S), np.float32)
    for i in range(L):
        k = np.asarray(p[f"dilate_{i}"]["kernel"], np.float32)       # [2, R, 2R]
        dil_w[i, :R] = k[0]
        dil_w[i, R:] = k[1]
        dil_b[i] = np.asarray(p[f"dilate_{i}"]["bias"], np.float32)
        if i < L - 1:
            rs_w[i, :, :R] = np.asarray(p[f"res_{i}"]["kernel"], np.float32)[0]
            rs_b[i, :R] = np.asarray(p[f"res_{i}"]["bias"], np.float32)
        rs_w[i, :, R:] = np.asarray(p[f"skip_{i}"]["kernel"], np.float32)[0]
        rs_b[i, R:] = np.asarray(p[f"skip_{i}"]["bias"], np.float32)

    return {
        "embed": embed,
        "dil_w": dil_w, "dil_b": dil_b,
        "rs_w": rs_w, "rs_b": rs_b,
        "out_w": np.asarray(p["conv_out"]["kernel"], np.float32)[0],  # [S, A]
        "out_b": np.zeros((A,), np.float32),
        "end_w": np.asarray(p["conv_end"]["kernel"], np.float32)[0],  # [A, A]
        "end_b": np.zeros((A,), np.float32),
    }


def export_weights(params: Dict[str, Any], model: WaveNetTrain) -> Dict[str, Any]:
    """Reference-format export dict (`pytorch/wavenet.py:147-188` key-for-key):
    tensors in the reference's math shapes, for API parity consumers."""
    L, R = model.n_layers, model.n_residual_channels
    p = params["params"] if "params" in params else params
    embed_cur = np.asarray(p["embed"]["embedding"], np.float32)      # [A, R]
    out = {
        "embedding_prev": np.zeros_like(embed_cur),
        "embedding_curr": embed_cur,
        "conv_out_weight": np.asarray(p["conv_out"]["kernel"], np.float32)[0].T,
        "conv_end_weight": np.asarray(p["conv_end"]["kernel"], np.float32)[0].T,
        "dilate_weights": [], "dilate_biases": [],
        "res_weights": [], "res_biases": [],
        "skip_weights": [], "skip_biases": [],
        "max_dilation": model.max_dilation,
        "use_embed_tanh": False,
    }
    for i in range(L):
        k = np.asarray(p[f"dilate_{i}"]["kernel"], np.float32)       # [2, R, 2R]
        # reference layout: [2R out, R in, 2 taps]
        out["dilate_weights"].append(np.stack([k[0].T, k[1].T], axis=-1))
        out["dilate_biases"].append(np.asarray(p[f"dilate_{i}"]["bias"], np.float32))
        if i < L - 1:
            out["res_weights"].append(
                np.asarray(p[f"res_{i}"]["kernel"], np.float32)[0].T)
            out["res_biases"].append(np.asarray(p[f"res_{i}"]["bias"], np.float32))
        out["skip_weights"].append(
            np.asarray(p[f"skip_{i}"]["kernel"], np.float32)[0].T)
        out["skip_biases"].append(np.asarray(p[f"skip_{i}"]["bias"], np.float32))
    return out
