"""MOMO family — the recurrent-U-Net lineage (reference momo.py, momo2.py,
momo3.py).

- MOMO (v1, momo.py:205-270): hidden state is a full-resolution spectrogram
  frame; two whole U-Nets emit 3-channel gate maps over it; a separate
  output U-Net reads the updated state.
- MOMO2 (momo2.py:210-336): refactor to a compressed-latent hidden state —
  the design GRUUNet2 reuses — with smearing applied once at the input.
- MOMO3 (momo3.py): MOMO2 plus a first-order temporal delta: the cell input
  is ``cat([x_t, x_t - x_{t-1}])`` (momo3.py:286-289), so the scan carry is
  (hx, prev_frame).

Shipped checkpoint: MOMO3-4d4ea0 (bins 22 -> 3, hidden 16, 9,185 params).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from audio_denoising_tpu.config import ModelConfig
from audio_denoising_tpu.models import base
from audio_denoising_tpu.ops.convs import (
    conv1d, conv_transpose1d, transpose_output_padding,
)


class _MomoUNetParts:
    """Static geometry shared by MOMO2/MOMO3 cells (smear-at-input style)."""

    def __init__(self, config: ModelConfig, num_bins: int, in_ch: int):
        c = config
        self.levels = len(c.hidden_sizes)
        self.hidden = c.hidden_sizes[-1]
        self.compressed = c.num_compressed_bins
        self.in_ch = in_ch
        self.bin_sizes = base.down_bin_sizes(num_bins, c.kernel_sizes,
                                             c.strides, c.paddings)
        assert self.bin_sizes[-1] == self.compressed
        g = c.num_gaussians
        self.smear_in = jnp.asarray(base.gaussian_smearing(num_bins, g))
        self.smear_hx = jnp.asarray(base.gaussian_smearing(self.compressed, g))
        self.up_output_paddings = [
            transpose_output_padding(
                self.bin_sizes[self.levels - i],
                self.bin_sizes[self.levels - 1 - i],
                c.kernel_sizes[::-1][i], c.strides[::-1][i],
                c.paddings[::-1][i])
            for i in range(self.levels)
        ]


class MOMO3:
    """MOMO3 (and MOMO2 via ``delta=False``)."""

    def __init__(self, config: ModelConfig, num_bins: int = 22,
                 delta: bool = True):
        self.config = config
        self.num_bins = num_bins
        self.delta = delta
        in_ch = config.in_size + (1 if delta else 0)
        self.geo = _MomoUNetParts(config, num_bins, in_ch)

    def init(self, key) -> base.Params:
        c = self.config
        geo = self.geo
        params = {}
        gate_ch = 3 * geo.hidden
        sizes = [geo.in_ch + c.num_gaussians] + list(c.hidden_sizes[:-1]) + [gate_ch]
        keys = jax.random.split(key, 2 * geo.levels + 2)
        ki = 0
        for i in range(geo.levels):
            w, b = base.init_conv(keys[ki], sizes[i + 1], sizes[i],
                                  c.kernel_sizes[i])
            params[f"cell.input_gate.downs.{i}.conv.weight"] = w
            params[f"cell.input_gate.downs.{i}.conv.bias"] = b
            ki += 1
        w, b = base.init_conv(keys[ki], gate_ch,
                              geo.hidden + c.num_gaussians, 3)
        params["cell.reset_gate.downs.0.conv.weight"] = w
        params["cell.reset_gate.downs.0.conv.bias"] = b
        ki += 1
        rev = ([1] + list(c.hidden_sizes))[::-1]
        for i in range(geo.levels):
            in_ch = rev[i] if i == 0 else 2 * rev[i]
            w, b = base.init_conv_transpose(keys[ki], in_ch, rev[i + 1],
                                            c.kernel_sizes[::-1][i])
            params[f"cell.output_gate.ups.{i}.conv.weight"] = w
            params[f"cell.output_gate.ups.{i}.conv.bias"] = b
            ki += 1
        return params

    def cell(self, params: base.Params, x_t: jnp.ndarray, carry):
        """x_t: (B, F). carry = (hx, prev) for MOMO3, hx for MOMO2."""
        c = self.config
        geo = self.geo
        if self.delta:
            hx, prev = carry
            xin = jnp.stack([x_t, x_t - prev], axis=1)  # (B, 2, F)
        else:
            hx = carry
            xin = x_t[:, None, :]
        b = x_t.shape[0]

        smear = jnp.broadcast_to(geo.smear_in[None], (b,) + geo.smear_in.shape)
        h = jnp.concatenate([xin, smear], axis=1)
        skips = [h]
        for i in range(geo.levels):
            h = jax.nn.relu(conv1d(
                skips[-1], params[f"cell.input_gate.downs.{i}.conv.weight"],
                params[f"cell.input_gate.downs.{i}.conv.bias"],
                stride=c.strides[i], padding=c.paddings[i]))
            skips.append(h)

        smear_h = jnp.broadcast_to(geo.smear_hx[None], (b,) + geo.smear_hx.shape)
        gate_h = jax.nn.relu(conv1d(
            jnp.concatenate([hx, smear_h], axis=1),
            params["cell.reset_gate.downs.0.conv.weight"],
            params["cell.reset_gate.downs.0.conv.bias"], stride=1, padding=1))

        i_r, i_i, i_n = jnp.split(skips[-1], 3, axis=1)
        h_r, h_i, h_n = jnp.split(gate_h, 3, axis=1)
        inputgate = jax.nn.sigmoid(i_i + h_i)
        resetgate = jax.nn.sigmoid(i_r + h_r)
        newgate = jnp.tanh(i_n + resetgate * h_n)
        hi = newgate + inputgate * (hx - newgate)

        # decoder skips (hi is level-0's input, never a skip;
        # mirrors gruunet.py)
        ups_in = skips[:-1]
        h = hi
        for i in range(geo.levels):
            s = ups_in[geo.levels - 1 - i]
            h = conv_transpose1d(
                h, params[f"cell.output_gate.ups.{i}.conv.weight"],
                params[f"cell.output_gate.ups.{i}.conv.bias"],
                stride=c.strides[::-1][i], padding=c.paddings[::-1][i],
                output_padding=geo.up_output_paddings[i])
            if i != geo.levels - 1:
                h = jnp.concatenate([jax.nn.relu(h), s], axis=1)
        y = h[:, 0, :]
        new_carry = (hi, x_t) if self.delta else hi
        return y, new_carry

    def init_state(self, batch: int, dtype=jnp.float32):
        hx = jnp.zeros((batch, self.geo.hidden, self.geo.compressed), dtype)
        return hx

    # -- streaming carry (the fast serving path steps cell-by-cell) ---------
    def init_carry(self, batch: int, dtype=jnp.float32):
        """Full cell carry: (hx, prev frame) for delta models — streaming
        must persist prev across hops or the delta feature silently
        degenerates to zero.

        prev starts at zeros rather than the reference's prev_0 = x_0
        (apply() semantics): in streaming the analysis ring also starts
        zeroed, so x_0 is the mel of near-silence (~0) and the first-hop
        delta differs from the offline path by ~log1p(first-hop
        magnitude) only — gone once the ring fills."""
        hx = self.init_state(batch, dtype)
        if self.delta:
            return (hx, jnp.zeros((batch, self.num_bins), dtype))
        return hx

    def decay_carry(self, carry, factor):
        """State decay (server.py:214) applies to hx only — prev is the
        previous input frame, not decaying state."""
        if self.delta:
            hx, prev = carry
            return (hx * factor, prev)
        return carry * factor

    def apply(self, params: base.Params, x: jnp.ndarray,
              hx: Optional[jnp.ndarray] = None,
              prev: Optional[jnp.ndarray] = None):
        x, squeezed = base.maybe_batch(x)
        if hx is None:
            hx = self.init_state(x.shape[0], x.dtype)
        if self.delta:
            # reference initializes prev to the first frame (delta 0 at t=0)
            if prev is None:
                prev = x[:, 0, :]
            carry = (hx, prev)
        else:
            carry = hx
        y, carry = base.scan_cell(self.cell, params, x, carry)
        hx = carry[0] if self.delta else carry
        if squeezed:
            y = y[0]
        return y, hx

    def __call__(self, params, x, hx=None, prev=None):
        return self.apply(params, x, hx, prev)


class MOMO2(MOMO3):
    def __init__(self, config: ModelConfig, num_bins: int = 22):
        super().__init__(config, num_bins=num_bins, delta=False)


class MOMO:
    """MOMO v1 (momo.py:205-270): full-resolution state, three whole U-Nets
    named input_gate / reset_gate (in the cell) / output_gate (on the model)."""

    def __init__(self, config: ModelConfig, num_bins: int = 22):
        assert config.in_size == 1
        self.config = config
        self.num_bins = num_bins
        c = config
        self.levels = len(c.hidden_sizes)
        self.bin_sizes = base.down_bin_sizes(num_bins, c.kernel_sizes,
                                             c.strides, c.paddings)
        g = c.num_gaussians
        self.smear_in = jnp.asarray(base.gaussian_smearing(num_bins, g))
        self.up_output_paddings = [
            transpose_output_padding(
                self.bin_sizes[self.levels - i],
                self.bin_sizes[self.levels - 1 - i],
                c.kernel_sizes[::-1][i], c.strides[::-1][i],
                c.paddings[::-1][i])
            for i in range(self.levels)
        ]

    def _unet_init(self, key, prefix: str, out_ch: int) -> base.Params:
        c = self.config
        params = {}
        sizes = [c.in_size + c.num_gaussians] + list(c.hidden_sizes)
        keys = jax.random.split(key, 2 * self.levels)
        for i in range(self.levels):
            w, b = base.init_conv(keys[i], sizes[i + 1], sizes[i],
                                  c.kernel_sizes[i])
            params[f"{prefix}.downs.{i}.conv.weight"] = w
            params[f"{prefix}.downs.{i}.conv.bias"] = b
        rev = sizes[::-1]
        for i in range(self.levels):
            in_ch = rev[i] if i == 0 else 2 * rev[i]
            oc = out_ch if i == self.levels - 1 else rev[i + 1]
            if i == self.levels - 1:
                in_ch = 2 * rev[i]  # momo.py:129 rebuilds the last up block
            w, b = base.init_conv_transpose(keys[self.levels + i], in_ch, oc,
                                            c.kernel_sizes[::-1][i])
            params[f"{prefix}.ups.{i}.conv.weight"] = w
            params[f"{prefix}.ups.{i}.conv.bias"] = b
        return params

    def init(self, key) -> base.Params:
        k1, k2, k3 = jax.random.split(key, 3)
        params = {}
        params.update(self._unet_init(k1, "cell.input_gate", 3))
        params.update(self._unet_init(k2, "cell.reset_gate", 3))
        params.update(self._unet_init(k3, "output_gate", self.config.in_size))
        return params

    def _unet(self, params: base.Params, prefix: str, x: jnp.ndarray):
        """x: (B, F) -> (B, out_ch, F)."""
        c = self.config
        b = x.shape[0]
        smear = jnp.broadcast_to(self.smear_in[None], (b,) + self.smear_in.shape)
        h = jnp.concatenate([x[:, None, :], smear], axis=1)
        skips = [h]
        for i in range(self.levels):
            h = jax.nn.relu(conv1d(
                skips[-1], params[f"{prefix}.downs.{i}.conv.weight"],
                params[f"{prefix}.downs.{i}.conv.bias"],
                stride=c.strides[i], padding=c.paddings[i]))
            skips.append(h)
        h = skips[-1]
        for i in range(self.levels):
            s = skips[self.levels - 1 - i]
            h = conv_transpose1d(
                h, params[f"{prefix}.ups.{i}.conv.weight"],
                params[f"{prefix}.ups.{i}.conv.bias"],
                stride=c.strides[::-1][i], padding=c.paddings[::-1][i],
                output_padding=self.up_output_paddings[i])
            if i != self.levels - 1:
                h = jnp.concatenate([jax.nn.relu(h), s], axis=1)
        return h

    def cell(self, params: base.Params, x_t: jnp.ndarray, hx: jnp.ndarray):
        gate_x = self._unet(params, "cell.input_gate", x_t)   # (B, 3, F)
        gate_h = self._unet(params, "cell.reset_gate", hx)    # (B, 3, F)
        i_r, i_i, i_n = gate_x[:, 0], gate_x[:, 1], gate_x[:, 2]
        h_r, h_i, h_n = gate_h[:, 0], gate_h[:, 1], gate_h[:, 2]
        inputgate = jax.nn.sigmoid(i_i + h_i)
        resetgate = jax.nn.sigmoid(i_r + h_r)
        newgate = jnp.tanh(i_n + resetgate * h_n)
        hy = newgate + inputgate * (hx - newgate)
        y = self._unet(params, "output_gate", hy)[:, 0, :]
        return y, hy

    def init_state(self, batch: int, dtype=jnp.float32):
        return jnp.zeros((batch, self.num_bins), dtype)

    def apply(self, params: base.Params, x: jnp.ndarray,
              hx: Optional[jnp.ndarray] = None):
        x, squeezed = base.maybe_batch(x)
        if hx is None:
            hx = self.init_state(x.shape[0], x.dtype)
        y, hx = base.scan_cell(self.cell, params, x, hx)
        if squeezed:
            y = y[0]
        return y, hx

    def __call__(self, params, x, hx=None):
        return self.apply(params, x, hx)
