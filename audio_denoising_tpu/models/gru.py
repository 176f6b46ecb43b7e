"""Torch-compatible GRU as a ``lax.scan``.

The reference carries a hand-unrolled per-timestep GRU for torch.compile
friendliness (gru.py:70-231; its ``_gru_cell`` has a latent missing-import
bug). On TPU the idiomatic form is a scan whose step is two MXU matmuls;
gate order and update equations follow torch's GRU exactly (r, z, n;
h' = (1 - z) * n + z * h) so ``nn.GRU`` weights import unchanged.

Used standalone (models.GRU) and by TRUNet's FGRU/TGRU blocks.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from audio_denoising_tpu.models import base


def gru_cell(x_t: jnp.ndarray, h: jnp.ndarray, w_ih: jnp.ndarray,
             b_ih: jnp.ndarray, w_hh: jnp.ndarray, b_hh: jnp.ndarray):
    """x_t: (B, I), h: (B, H); weights in torch layout (3H, I) / (3H, H)."""
    gx = x_t @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    i_r, i_z, i_n = jnp.split(gx, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return n + z * (h - n)


def gru_layer(x: jnp.ndarray, h0: jnp.ndarray, w_ih, b_ih, w_hh, b_hh,
              reverse: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (B, T, I) -> (outputs (B, T, H), h_T (B, H))."""
    xt = jnp.swapaxes(x, 0, 1)

    def step(h, x_t):
        h2 = gru_cell(x_t, h, w_ih, b_ih, w_hh, b_hh)
        return h2, h2

    h, ys = jax.lax.scan(step, h0, xt, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1), h


class GRU:
    """Multi-layer (optionally bidirectional) GRU with torch param names
    (``weight_ih_l{k}``, ``weight_hh_l{k}``, biases, ``_reverse`` suffix)."""

    def __init__(self, input_size: int, hidden_size: int, num_layers: int = 1,
                 bidirectional: bool = False, param_prefix: str = ""):
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.bidirectional = bidirectional
        self.prefix = param_prefix
        self.num_directions = 2 if bidirectional else 1

    def init(self, key) -> base.Params:
        params = {}
        keys = jax.random.split(key, self.num_layers * self.num_directions)
        ki = 0
        h = self.hidden_size
        for layer in range(self.num_layers):
            in_sz = (self.input_size if layer == 0
                     else h * self.num_directions)
            for d in range(self.num_directions):
                sfx = "_reverse" if d == 1 else ""
                k1, k2, k3, k4 = jax.random.split(keys[ki], 4)
                ki += 1
                params[f"{self.prefix}weight_ih_l{layer}{sfx}"] = \
                    base.uniform_init(k1, (3 * h, in_sz), h)
                params[f"{self.prefix}weight_hh_l{layer}{sfx}"] = \
                    base.uniform_init(k2, (3 * h, h), h)
                params[f"{self.prefix}bias_ih_l{layer}{sfx}"] = \
                    base.uniform_init(k3, (3 * h,), h)
                params[f"{self.prefix}bias_hh_l{layer}{sfx}"] = \
                    base.uniform_init(k4, (3 * h,), h)
        return params

    def apply(self, params: base.Params, x: jnp.ndarray,
              h0: Optional[jnp.ndarray] = None):
        """x: (B, T, I); h0: (num_layers * num_directions, B, H)."""
        b = x.shape[0]
        nd = self.num_directions
        if h0 is None:
            h0 = jnp.zeros((self.num_layers * nd, b, self.hidden_size), x.dtype)
        p = self.prefix
        h_finals = []
        out = x
        for layer in range(self.num_layers):
            ys, hT = gru_layer(
                out, h0[layer * nd],
                params[f"{p}weight_ih_l{layer}"],
                params[f"{p}bias_ih_l{layer}"],
                params[f"{p}weight_hh_l{layer}"],
                params[f"{p}bias_hh_l{layer}"])
            if self.bidirectional:
                ys_r, hT_r = gru_layer(
                    out, h0[layer * nd + 1],
                    params[f"{p}weight_ih_l{layer}_reverse"],
                    params[f"{p}bias_ih_l{layer}_reverse"],
                    params[f"{p}weight_hh_l{layer}_reverse"],
                    params[f"{p}bias_hh_l{layer}_reverse"],
                    reverse=True)
                ys = jnp.concatenate([ys, ys_r], axis=-1)
                h_finals += [hT, hT_r]
            else:
                h_finals.append(hT)
            out = ys
        return out, jnp.stack(h_finals, axis=0)

    def __call__(self, params, x, h0=None):
        return self.apply(params, x, h0)
