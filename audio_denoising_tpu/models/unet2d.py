"""2D conv U-Net family over (freq=241, time) log-magnitude spectrograms.

Covers the reference's UNet2d (unet.py:116), UNet2d3 (unet3.py:116),
UNet2d4 (unet4.py:116 — the all-64-channel "unet4" named in the baseline
configs) and the wide UNet2d4 variant (unet2.py:116), all sharing one
block grammar:

- DownConvBlock2d: Conv2d(p=1) -> InstanceNorm2d (optional) -> PReLU
  (unet4.py:233-248); dropout is identity at inference, elementwise at
  training when apply() is given a dropout_rng (the reference trains with
  nn.Dropout(0.01) after each block, unet4.py:118).
- UpConvBlock2d: ConvTranspose2d(p=1, fixed output_padding) -> InstanceNorm
  -> PReLU, then skip concat (unet4.py:211-230).
- A GaussianSmearing positional field over sqrt-spaced bin positions is
  concatenated to the input (unet4.py:158).

These are stateless (no recurrence): batch x time parallel, so on TPU they
vmap/shard trivially over both.
"""

from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from audio_denoising_tpu.models import base
from audio_denoising_tpu.ops.convs import conv2d, conv_transpose2d

Params = base.Params


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def instance_norm_2d(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """nn.InstanceNorm2d default: affine=False, track_running_stats=False —
    per-(sample, channel) statistics at inference time too."""
    mean = x.mean(axis=(-2, -1), keepdims=True)
    var = ((x - mean) ** 2).mean(axis=(-2, -1), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def prelu(x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


# Layer specs: downs: (in, out, kernel, stride, norm); ups: (in, out, kernel,
# stride, output_padding). ucl_0: (in, out, kernel, stride) with p=1, op from
# spec. Channel letters follow the reference init bodies.
def _spec(widths: Sequence[int], wide_g: int = None) -> Dict:
    A, B, C, D, E, F = widths
    return {
        "downs": [
            ("dcl_1", None, A, 3, 2, True),   # in filled at build (1 + S)
            ("dcl_2", A, B, 3, 2, True),
            ("dcl_3", B, C, 3, 2, True),
            ("dcl_4", C, D, 3, 2, True),
            ("dcl_5", D, E, 3, 2, False),
            ("dcl_6", E, F, (4, 3), (3, 2), False),
        ],
        "ups": [
            ("ucl_1", F, E, (4, 3), (3, 2), 0),
            ("ucl_2", E + E, D, 3, 2, (1, 1)),
            ("ucl_3", D + D, C, 3, 2, (0, 1)),
            ("ucl_4", C + C, B, 3, 2, 0),
            ("ucl_5", B + B, A, 3, 2, (0, 1)),
        ],
        "final": ("ucl_0", A + A, 3, 2, 0),
    }


_UNET2D_SPEC = {  # unet.py: channels 64/64/128/128/256/256, all k3 s2
    "downs": [
        ("dcl_1", None, 64, 3, 2, True),
        ("dcl_2", 64, 64, 3, 2, True),
        ("dcl_3", 64, 128, 3, 2, True),
        ("dcl_4", 128, 128, 3, 2, True),
        ("dcl_5", 128, 256, 3, 2, False),
        ("dcl_6", 256, 256, 3, 2, False),
    ],
    "ups": [
        ("ucl_1", 256, 256, 3, 2, (1, 0)),
        ("ucl_2", 512, 128, 3, 2, (1, 1)),
        ("ucl_3", 256, 128, 3, 2, (0, 1)),
        ("ucl_4", 256, 64, 3, 2, 0),
        ("ucl_5", 128, 64, 3, 2, (0, 1)),
    ],
    "final": ("ucl_0", 128, 3, 2, 0),
}

_UNET2D3_SPEC = {  # unet3.py: 3 levels, mixed kernels
    "downs": [
        ("dcl_1", None, 64, 7, (5, 3), True),
        ("dcl_2", 64, 128, 5, 3, True),
        ("dcl_3", 128, 256, (9, 3), 3, True),
    ],
    "ups": [
        ("ucl_1", 256, 128, (9, 3), 3, (0, 1)),
        ("ucl_2", 256, 64, 5, 3, (0, 2)),
    ],
    "final": ("ucl_0", 128, 7, (5, 3), 1),
}

SPECS = {
    "UNet2d": _UNET2D_SPEC,
    "UNet2d3": _UNET2D3_SPEC,
    "UNet2d4": _spec([64, 64, 64, 64, 64, 64]),        # unet4.py
    "UNet2d4Wide": _spec([64, 64, 128, 128, 256, 256]),  # unet2.py
}


class UNet2d:
    def __init__(self, arch: str = "UNet2d4", chnls_in: int = 1,
                 chnls_out: int = 1, chnls_gs: int = 32, bins: int = 241):
        self.arch = arch
        self.spec = SPECS[arch]
        self.chnls_in = chnls_in
        self.chnls_out = chnls_out
        self.chnls_gs = chnls_gs
        self.bins = bins
        # (S, bins): gs over sqrt positions (unet4.py:158)
        self.smear = jnp.asarray(base.gaussian_smearing(
            bins, chnls_gs, sqrt_positions=True))

    def init(self, key) -> Params:
        params: Params = {}
        downs = self.spec["downs"]
        ups = self.spec["ups"]
        n = len(downs) + len(ups) + 1
        keys = jax.random.split(key, n)
        ki = 0
        for (name, cin, cout, k, s, norm) in downs:
            cin = cin if cin is not None else self.chnls_in + self.chnls_gs
            kh, kw = _pair(k)
            kk1, kk2, kk3 = jax.random.split(keys[ki], 3)
            fan = cin * kh * kw
            params[f"{name}.layers.0.weight"] = base.uniform_init(
                kk1, (cout, cin, kh, kw), fan)
            params[f"{name}.layers.0.bias"] = base.uniform_init(kk2, (cout,), fan)
            pi = 2 if norm else 1
            params[f"{name}.layers.{pi}.weight"] = jnp.full((1,), 0.25)
            ki += 1
        for (name, cin, cout, k, s, op) in ups:
            kh, kw = _pair(k)
            kk1, kk2, kk3 = jax.random.split(keys[ki], 3)
            fan = cout * kh * kw
            params[f"{name}.layers.0.weight"] = base.uniform_init(
                kk1, (cin, cout, kh, kw), fan)
            params[f"{name}.layers.0.bias"] = base.uniform_init(kk2, (cout,), fan)
            params[f"{name}.layers.2.weight"] = jnp.full((1,), 0.25)
            ki += 1
        name, cin, k, s, op = self.spec["final"]
        kh, kw = _pair(k)
        kk1, kk2 = jax.random.split(keys[ki])
        fan = self.chnls_out * kh * kw
        params[f"{name}.weight"] = base.uniform_init(
            kk1, (cin, self.chnls_out, kh, kw), fan)
        params[f"{name}.bias"] = base.uniform_init(kk2, (self.chnls_out,), fan)
        return params

    def apply(self, params: Params, logmag: jnp.ndarray,
              dropout_rng=None, dropout: float = 0.0) -> jnp.ndarray:
        """logmag: (C, bins, T) -> residual (C, bins', T'); the reference
        treats the channel axis as the conv batch axis (unet4.py:147-194).

        ``dropout_rng``/``dropout``: training-time elementwise dropout
        after each block's PReLU, matching the reference's nn.Dropout
        placement (unet4.py:211-248, default 0.01 at unet4.py:118). With
        dropout_rng=None (the default) the layer is an identity —
        inference semantics are unchanged."""
        def drop(h, idx):
            if dropout_rng is None or dropout <= 0.0:
                return h
            keep = 1.0 - dropout
            mask = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, idx), keep, h.shape)
            return jnp.where(mask, h / keep, 0.0)

        n_ch, _, t = logmag.shape
        x = logmag[:, None, :, :]  # (C, 1, bins, T)
        smear = jnp.broadcast_to(self.smear[None, :, :, None],
                                 (n_ch,) + self.smear.shape + (t,))
        x = jnp.concatenate([x, smear], axis=1)

        encs: List[jnp.ndarray] = []
        for li, (name, _cin, _cout, k, s, norm) in enumerate(
                self.spec["downs"]):
            x = conv2d(x, params[f"{name}.layers.0.weight"],
                       params[f"{name}.layers.0.bias"],
                       stride=_pair(s), padding=1)
            if norm:
                x = instance_norm_2d(x)
                x = prelu(x, params[f"{name}.layers.2.weight"])
            else:
                x = prelu(x, params[f"{name}.layers.1.weight"])
            x = drop(x, li)
            encs.append(x)

        n_down = len(encs)
        h = encs[-1]
        for i, (name, _cin, _cout, k, s, op) in enumerate(self.spec["ups"]):
            h = conv_transpose2d(h, params[f"{name}.layers.0.weight"],
                                 params[f"{name}.layers.0.bias"],
                                 stride=_pair(s), padding=1,
                                 output_padding=_pair(op))
            h = instance_norm_2d(h)
            h = prelu(h, params[f"{name}.layers.2.weight"])
            h = drop(h, n_down + i)
            h = jnp.concatenate([h, encs[n_down - 2 - i]], axis=1)

        name, _cin, k, s, op = self.spec["final"]
        h = conv_transpose2d(h, params[f"{name}.weight"],
                             params[f"{name}.bias"], stride=_pair(s),
                             padding=1, output_padding=_pair(op))
        return h[:, 0, :, :]

    def __call__(self, params, x):
        return self.apply(params, x)

    # ---- shape compatibility ------------------------------------------------
    def _round_trip(self, bins: int, t: int):
        """Simulate encoder/decoder spatial sizes; returns final (bins', t')
        or None if a decoder level mismatches its skip (concat would fail).
        The reference uses FIXED output_paddings chosen at construction
        (unet4.py:211-230), so only specific frame counts are valid."""
        sizes = [(bins, t)]
        for (_n, _ci, _co, k, s, _norm) in self.spec["downs"]:
            kh, kw = _pair(k)
            sh, sw = _pair(s)
            h, w = sizes[-1]
            sizes.append(((h + 2 - kh) // sh + 1, (w + 2 - kw) // sw + 1))
        h, w = sizes[-1]
        n_down = len(self.spec["downs"])
        for i, (_n, _ci, _co, k, s, op) in enumerate(self.spec["ups"]):
            kh, kw = _pair(k)
            sh, sw = _pair(s)
            oph, opw = _pair(op)
            h = (h - 1) * sh - 2 + kh + oph
            w = (w - 1) * sw - 2 + kw + opw
            skip = sizes[n_down - 1 - i]
            if (h, w) != skip:
                return None
        _n, _ci, k, s, op = self.spec["final"]
        kh, kw = _pair(k)
        sh, sw = _pair(s)
        oph, opw = _pair(op)
        return ((h - 1) * sh - 2 + kh + oph, (w - 1) * sw - 2 + kw + opw)

    def compatible_frames(self, t: int, max_extra: int = 512) -> int:
        """Smallest t' >= t the network accepts with output t'' >= t
        (pad the spectrogram to t', crop the output back)."""
        for t2 in range(t, t + max_extra):
            rt = self._round_trip(self.bins, t2)
            if rt is not None and rt[0] >= self.bins and rt[1] >= t:
                return t2
        raise ValueError(f"no compatible frame count near {t} "
                         f"for {self.arch}")
