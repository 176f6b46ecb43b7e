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

    # --- init (round 3: TRUNet goes live — framework-trainable weights;
    # the reference ships none, trunet.py:160-168 is only a shape test) ---
    @staticmethod
    def _init_bn(params, name, ch):
        """Identity running stats: batch_norm_1d runs in inference mode,
        so during training BN acts as a learnable per-channel affine."""
        params[f"{name}.weight"] = jnp.ones((ch,), jnp.float32)
        params[f"{name}.bias"] = jnp.zeros((ch,), jnp.float32)
        params[f"{name}.running_mean"] = jnp.zeros((ch,), jnp.float32)
        params[f"{name}.running_var"] = jnp.ones((ch,), jnp.float32)

    def init(self, key) -> Params:
        params: Params = {}
        keys = iter(jax.random.split(key, 64))
        # down1: StandardConv1d(4 -> 64, k5 s2)
        w, b = base.init_conv(next(keys), 64, 4, 5)
        params["down1.StandardConv1d.0.weight"] = w
        params["down1.StandardConv1d.0.bias"] = b
        # down2..down6: pointwise (in->out,1) + BN + depthwise (out,1,k) + BN
        for name, cin, cout, k, _s, kind in self.DOWNS[1:]:
            seq = f"{name}.DepthwiseSeparableConv1d"
            w, b = base.init_conv(next(keys), cout, cin, 1)
            params[f"{seq}.0.weight"], params[f"{seq}.0.bias"] = w, b
            self._init_bn(params, f"{seq}.1", cout)
            w, b = base.init_conv(next(keys), cout, 1, k)
            params[f"{seq}.3.weight"], params[f"{seq}.3.bias"] = w, b
            self._init_bn(params, f"{seq}.4", cout)
        # GRU blocks (torch nn.GRU param names) + their 1x1 conv + BN
        params.update(self.fgru.init(next(keys)))
        params.update(self.tgru.init(next(keys)))
        for name, gin in (("FGRU", 128), ("TGRU", 128)):
            w, b = base.init_conv(next(keys), 64, gin, 1)
            params[f"{name}.conv.0.weight"] = w
            params[f"{name}.conv.0.bias"] = b
            self._init_bn(params, f"{name}.conv.1", 64)
        # ups: pointwise (in->out,1) + BN + ConvTranspose(out->out,k) [+ BN]
        for name, cin, cout, k, _s, kind in self.UPS:
            seq = {"first": f"{name}.FirstTrCNN", "mid": f"{name}.TrCNN",
                   "last": f"{name}.LastTrCNN"}[kind]
            w, b = base.init_conv(next(keys), cout, cin, 1)
            params[f"{seq}.0.weight"], params[f"{seq}.0.bias"] = w, b
            self._init_bn(params, f"{seq}.1", cout)
            w, b = base.init_conv_transpose(next(keys), cout, cout, k)
            params[f"{seq}.3.weight"], params[f"{seq}.3.bias"] = w, b
            if kind != "last":
                self._init_bn(params, f"{seq}.4", cout)
        return params

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


class TRUNetDenoiser:
    """TRUNet wired into the framework's residual-denoising contract
    (round 3 — VERDICT r2 task 5: 'make TRUNet live').

    The reference vendors TRUNet but never connects it to audio
    (trunet.py:160-168 is only a shape smoke test), so the featurization
    and serving semantics here are OURS, designed to the model's
    (B, 4, F) -> (B, 5, F) per-frame contract (trunet.py:122-158):

    - each spectrogram frame becomes 4 input channels over the F=257
      frequency bins: [log1p magnitude, temporal delta (frame t minus
      t-1 — the only temporal context; the vendored TGRU recurs over the
      compressed FREQUENCY axis, not time), frequency delta, and a
      normalized bin-position ramp (the role GaussianSmearing plays in
      the sibling models)];
    - output channel 0 is the predicted residual log-magnitude (the
      framework contract: reconstruction = input - residual); channels
      1-4 of the vendored 5-channel head are unused and stay near init.

    The adapter exposes the stateless-U-Net surface (``compatible_frames``
    + image-in/image-out ``apply``), so training (TrainingContext),
    offline denoise (pipeline.offline_denoise_stateless), evaluation, and
    cadence-locked segment streaming (engine mode 'unet') all work
    unchanged."""

    def __init__(self, num_bins: int = 257):
        self.net = TRUNet()
        self.num_bins = num_bins
        self._pos = jnp.linspace(0.0, 1.0, num_bins, dtype=jnp.float32)

    def init(self, key) -> Params:
        return self.net.init(key)

    def compatible_frames(self, t: int) -> int:
        return t                       # per-frame model: any frame count

    def apply(self, params: Params, img: jnp.ndarray,
              dropout_rng=None, dropout: float = 0.0) -> jnp.ndarray:
        """img: (B, F, T) log1p magnitude -> (B, F, T) residual."""
        del dropout_rng, dropout       # vendored net has no dropout
        B, F, T = img.shape
        frames = jnp.swapaxes(img, 1, 2).reshape(B * T, F)
        dt = img - jnp.pad(img[..., :-1], ((0, 0), (0, 0), (1, 0)))
        dt = jnp.swapaxes(dt, 1, 2).reshape(B * T, F)
        df = frames - jnp.pad(frames[:, :-1], ((0, 0), (1, 0)))
        pos = jnp.broadcast_to(self._pos, (B * T, F))
        x = jnp.stack([frames, dt, df, pos], axis=1)      # (B*T, 4, F)
        resid = self.net.apply(params, x)[:, 0, :F]       # (B*T, F)
        return jnp.swapaxes(resid.reshape(B, T, F), 1, 2)

    def __call__(self, params, img, **kw):
        return self.apply(params, img, **kw)
