"""TRU-Net: depthwise-separable conv encoder, bidirectional frequency GRU,
unidirectional time GRU, transposed-conv decoder (vendored third-party model
in the reference; trunet.py:122-158, input (B, 4, 257) -> output (B, 5, 257)).

BatchNorm runs in inference mode against imported running statistics; params
keep torch state-dict names so reference weights load unchanged.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from audio_denoising_tpu.models import base
from audio_denoising_tpu.models.gru import GRU
from audio_denoising_tpu.ops.convs import conv1d, conv_transpose1d

Params = base.Params


def batch_norm_1d(x: jnp.ndarray, params: Params, name: str,
                  eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode nn.BatchNorm1d on (B, C, L)."""
    mean = params[f"{name}.running_mean"][None, :, None]
    var = params[f"{name}.running_var"][None, :, None]
    w = params[f"{name}.weight"][None, :, None]
    b = params[f"{name}.bias"][None, :, None]
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


class TRUNet:
    # (in, out, kernel, stride) per block, mirroring trunet.py:125-138
    DOWNS = [("down1", 4, 64, 5, 2, "std"),
             ("down2", 64, 128, 3, 1, "dws"),
             ("down3", 128, 128, 5, 2, "dws"),
             ("down4", 128, 128, 3, 1, "dws"),
             ("down5", 128, 128, 5, 2, "dws"),
             ("down6", 128, 128, 3, 2, "dws")]
    UPS = [("up1", 64, 64, 3, 2, "first"),
           ("up2", 192, 64, 5, 2, "mid"),
           ("up3", 192, 64, 3, 1, "mid"),
           ("up4", 192, 64, 5, 2, "mid"),
           ("up5", 192, 64, 3, 1, "mid"),
           ("up6", 128, 5, 5, 2, "last")]

    def __init__(self):
        self.fgru = GRU(128, 64, bidirectional=True, param_prefix="FGRU.GRU.")
        self.tgru = GRU(64, 128, bidirectional=False, param_prefix="TGRU.GRU.")

    # --- blocks ----------------------------------------------------------
    def _std_conv(self, params, name, x, k, s):
        seq = f"{name}.StandardConv1d"
        x = conv1d(x, params[f"{seq}.0.weight"], params[f"{seq}.0.bias"],
                   stride=s, padding=s // 2)
        return jax.nn.relu(x)

    def _dws_conv(self, params, name, x, k, s):
        seq = f"{name}.DepthwiseSeparableConv1d"
        x = conv1d(x, params[f"{seq}.0.weight"], params[f"{seq}.0.bias"])
        x = jax.nn.relu(batch_norm_1d(x, params, f"{seq}.1"))
        ch = x.shape[1]
        x = conv1d(x, params[f"{seq}.3.weight"], params[f"{seq}.3.bias"],
                   stride=s, padding=k // 2, groups=ch)
        return jax.nn.relu(batch_norm_1d(x, params, f"{seq}.4"))

    def _gru_block(self, params, gru: GRU, name, x):
        """x: (B, T, C_in) -> (B, C_out, T) (trunet.py:45-58)."""
        out, _ = gru.apply(params, x)
        out = jnp.swapaxes(out, 1, 2)
        out = conv1d(out, params[f"{name}.conv.0.weight"],
                     params[f"{name}.conv.0.bias"])
        return jax.nn.relu(batch_norm_1d(out, params, f"{name}.conv.1"))

    def _tr_seq(self, params, seq, x, k, s, final_bn_relu=True):
        x = conv1d(x, params[f"{seq}.0.weight"], params[f"{seq}.0.bias"])
        x = jax.nn.relu(batch_norm_1d(x, params, f"{seq}.1"))
        x = conv_transpose1d(x, params[f"{seq}.3.weight"],
                             params[f"{seq}.3.bias"], stride=s, padding=s // 2)
        if final_bn_relu:
            x = jax.nn.relu(batch_norm_1d(x, params, f"{seq}.4"))
        return x

    @staticmethod
    def _pad_cat(x1, x2):
        """Pad (or crop — torch F.pad with negative pads crops) x1's length
        to x2's, then concat channels (trunet.py:95-98)."""
        diff = x2.shape[-1] - x1.shape[-1]
        left, right = diff // 2, diff - diff // 2
        if left < 0 or right < 0:
            x1 = x1[..., max(0, -left): x1.shape[-1] - max(0, -right)]
        x1 = jnp.pad(x1, ((0, 0), (0, 0), (max(0, left), max(0, right))))
        return jnp.concatenate([x1, x2], axis=1)

    # --- forward -----------------------------------------------------------
    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        x1 = self._std_conv(params, "down1", x, 5, 2)
        x2 = self._dws_conv(params, "down2", x1, 3, 1)
        x3 = self._dws_conv(params, "down3", x2, 5, 2)
        x4 = self._dws_conv(params, "down4", x3, 3, 1)
        x5 = self._dws_conv(params, "down5", x4, 5, 2)
        x6 = self._dws_conv(params, "down6", x5, 3, 2)
        x7 = jnp.swapaxes(x6, 1, 2)                      # (B, L, 128)
        x8 = self._gru_block(params, self.fgru, "FGRU", x7)
        x9 = jnp.swapaxes(x8, 1, 2)
        x10 = self._gru_block(params, self.tgru, "TGRU", x9)
        x11 = self._tr_seq(params, "up1.FirstTrCNN", x10, 3, 2)
        x12 = self._tr_seq(params, "up2.TrCNN", self._pad_cat(x11, x5), 5, 2)
        x13 = self._tr_seq(params, "up3.TrCNN", self._pad_cat(x12, x4), 3, 1)
        x14 = self._tr_seq(params, "up4.TrCNN", self._pad_cat(x13, x3), 5, 2)
        x15 = self._tr_seq(params, "up5.TrCNN", self._pad_cat(x14, x2), 3, 1)
        x16 = self._tr_seq(params, "up6.LastTrCNN", self._pad_cat(x15, x1),
                           5, 2, final_bn_relu=False)
        return x16

    def __call__(self, params, x):
        return self.apply(params, x)
