"""GRUUNet2 / GRUUNet — the primary model family.

GRU gating where the gate projections are a conv U-Net (reference
gruunet2.py:202-306): ``input_gate`` is a strided Conv1d encoder whose last
level emits 3x channels for the r/z/n gates, ``reset_gate`` is one conv on
the compressed hidden state, and ``output_gate`` is a ConvTranspose1d
decoder with skip concatenations. GaussianSmearing bin encodings are
concatenated at every level (gruunet2.py:139-143) — precomputed constants
here. GRUUNet (v1, gruunet.py:246-300) is numerically identical for 3D
inputs; both are served by this implementation.

Recurrence: ``lax.scan`` over frames; hidden state is an explicit carry
(B, hidden, compressed_bins) — no mutable module state, which also removes
the reference's thread-safety hazard (SURVEY §5 race detection).
"""

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from audio_denoising_tpu.config import ModelConfig
from audio_denoising_tpu.models import base
from audio_denoising_tpu.ops.convs import (
    conv1d, conv_transpose1d, transpose_output_padding,
)


class GRUUNet2:
    def __init__(self, config: ModelConfig, num_bins: int = 64):
        assert config.in_size == 1
        self.config = config
        self.num_bins = num_bins
        c = config
        self.levels = len(c.hidden_sizes)
        self.hidden = c.hidden_sizes[-1]
        self.compressed = c.num_compressed_bins
        self.gate_ch = 3 * self.hidden

        # spatial sizes down the encoder: [64, 32, 16, 8, 4] for the default
        self.bin_sizes = base.down_bin_sizes(num_bins, c.kernel_sizes,
                                             c.strides, c.paddings)
        assert self.bin_sizes[-1] == self.compressed, (
            f"config num_compressed_bins={self.compressed} inconsistent with "
            f"encoder output {self.bin_sizes[-1]}")

        g = c.num_gaussians
        # smear constants per encoder level input (G, bins)
        self.smears_down = [jnp.asarray(base.gaussian_smearing(b, g))
                            for b in self.bin_sizes[:-1]]
        self.smear_hx = jnp.asarray(base.gaussian_smearing(self.compressed, g))
        # decoder: level i upsamples bin_sizes[L-i] -> bin_sizes[L-1-i]
        self.smears_up = [jnp.asarray(base.gaussian_smearing(
            self.bin_sizes[self.levels - i], g)) for i in range(self.levels)]
        self.up_output_paddings = [
            transpose_output_padding(
                self.bin_sizes[self.levels - i], self.bin_sizes[self.levels - 1 - i],
                c.kernel_sizes[::-1][i], c.strides[::-1][i], c.paddings[::-1][i])
            for i in range(self.levels)
        ]

    # ---- parameters -----------------------------------------------------
    def init(self, key) -> base.Params:
        c = self.config
        params = {}
        sizes = [c.in_size] + list(c.hidden_sizes[:-1]) + [self.gate_ch]
        keys = jax.random.split(key, 2 * self.levels + 2)
        ki = 0
        for i in range(self.levels):
            w, b = base.init_conv(keys[ki], sizes[i + 1],
                                  sizes[i] + c.num_gaussians, c.kernel_sizes[i])
            params[f"cell.input_gate.downs.{i}.conv.weight"] = w
            params[f"cell.input_gate.downs.{i}.conv.bias"] = b
            ki += 1
        w, b = base.init_conv(keys[ki], self.gate_ch,
                              self.hidden + c.num_gaussians, 3)
        params["cell.reset_gate.downs.0.conv.weight"] = w
        params["cell.reset_gate.downs.0.conv.bias"] = b
        ki += 1
        # decoder sizes: [1, h0, h1, ..., h_{L-1}] reversed
        up_sizes = [1] + list(c.hidden_sizes)
        rev = up_sizes[::-1]
        for i in range(self.levels):
            in_ch = (rev[i] if i == 0 else 2 * rev[i]) + c.num_gaussians
            w, b = base.init_conv_transpose(keys[ki], in_ch, rev[i + 1],
                                            c.kernel_sizes[::-1][i])
            params[f"cell.output_gate.ups.{i}.conv.weight"] = w
            params[f"cell.output_gate.ups.{i}.conv.bias"] = b
            ki += 1
        return params

    # ---- one frame ------------------------------------------------------
    def cell(self, params: base.Params, x_t: jnp.ndarray,
             hx: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x_t: (B, F); hx: (B, hidden, compressed) -> (y_t (B, F), hx')."""
        c = self.config
        b = x_t.shape[0]
        h = x_t[:, None, :]  # (B, 1, F)

        skips = [h]
        for i in range(self.levels):
            smear = jnp.broadcast_to(self.smears_down[i][None],
                                     (b,) + self.smears_down[i].shape)
            inp = jnp.concatenate([skips[-1], smear], axis=1)
            out = conv1d(inp, params[f"cell.input_gate.downs.{i}.conv.weight"],
                         params[f"cell.input_gate.downs.{i}.conv.bias"],
                         stride=c.strides[i], padding=c.paddings[i])
            skips.append(jax.nn.relu(out))

        gate_x = skips[-1]  # (B, 3*hidden, compressed)
        smear_h = jnp.broadcast_to(self.smear_hx[None],
                                   (b,) + self.smear_hx.shape)
        gate_h = jax.nn.relu(conv1d(
            jnp.concatenate([hx, smear_h], axis=1),
            params["cell.reset_gate.downs.0.conv.weight"],
            params["cell.reset_gate.downs.0.conv.bias"],
            stride=1, padding=1))

        i_r, i_i, i_n = jnp.split(gate_x, 3, axis=1)
        h_r, h_i, h_n = jnp.split(gate_h, 3, axis=1)
        inputgate = jax.nn.sigmoid(i_i + h_i)
        resetgate = jax.nn.sigmoid(i_r + h_r)
        newgate = jnp.tanh(i_n + resetgate * h_n)
        hi = newgate + inputgate * (hx - newgate)

        # decoder skips: [x, d1, ..., d_{L-1}] (hi itself is the level-0
        # input; x at index 0 is never consumed — last level has no concat)
        ups_in = skips[:-1]
        h = hi
        for i in range(self.levels):
            s = ups_in[self.levels - 1 - i]
            smear = jnp.broadcast_to(self.smears_up[i][None],
                                     (b,) + self.smears_up[i].shape)
            informed = jnp.concatenate([h, smear], axis=1)
            h = conv_transpose1d(
                informed, params[f"cell.output_gate.ups.{i}.conv.weight"],
                params[f"cell.output_gate.ups.{i}.conv.bias"],
                stride=c.strides[::-1][i], padding=c.paddings[::-1][i],
                output_padding=self.up_output_paddings[i])
            if i != self.levels - 1:
                h = jnp.concatenate([jax.nn.relu(h), s], axis=1)
        return h[:, 0, :], hi

    # ---- sequences ------------------------------------------------------
    def init_state(self, batch: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((batch, self.hidden, self.compressed), dtype=dtype)

    def apply(self, params: base.Params, x: jnp.ndarray,
              hx: Optional[jnp.ndarray] = None):
        """x: (B, T, F) or (T, F) -> (residual prediction, hx')."""
        x, squeezed = base.maybe_batch(x)
        if hx is None:
            hx = self.init_state(x.shape[0], x.dtype)
        y, hx = base.scan_cell(self.cell, params, x, hx)
        if squeezed:
            y = y[0]
        return y, hx

    def __call__(self, params, x, hx=None):
        return self.apply(params, x, hx)


# GRUUNet v1 (gruunet.py) is the same computation for batched inputs.
GRUUNet = GRUUNet2
