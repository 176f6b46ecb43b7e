"""Shared model-zoo building blocks.

Models are functional: a model object holds only static config (shapes,
strides, precomputed constants); parameters live in a flat dict keyed
exactly like the reference torch state dicts (``cell.input_gate.downs.0.
conv.weight``), so imported ``.pth`` weights drop in unchanged. Sequence
processing is ``lax.scan`` over frames — the reference's per-timestep
Python loop (gruunet2.py:271) becomes a single compiled scan.
"""

from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


def gaussian_smearing(num_bins: int, num_gaussians: int = 6,
                      start: float = 0.0, stop: float = 1.0,
                      sqrt_positions: bool = False) -> np.ndarray:
    """RBF embedding of the normalized bin index — (num_gaussians, num_bins).

    The reference recomputes this every frame at every level
    (gruunet2.py:139-143); it depends only on (num_bins, num_gaussians), so
    here it is a precomputed constant folded into the compiled graph.
    ``sqrt_positions`` matches the 2D U-Nets' ``linspace(0,1,BINS).sqrt()``
    variant (unet4.py:158).
    """
    offset = np.linspace(start, stop, num_gaussians)
    coeff = -0.5 / float(offset[1] - offset[0]) ** 2
    pos = np.linspace(0.0, 1.0, num_bins)
    if sqrt_positions:
        pos = np.sqrt(pos)
    dist = pos[:, None] - offset[None, :]
    return np.exp(coeff * dist * dist).T.astype(np.float32)  # (G, bins)


def conv_out_len(length: int, kernel: int, stride: int, padding: int,
                 dilation: int = 1) -> int:
    return (length + 2 * padding - dilation * (kernel - 1) - 1) // stride + 1


def down_bin_sizes(num_bins: int, kernels: Sequence[int],
                   strides: Sequence[int], paddings: Sequence[int]) -> List[int]:
    """Spatial sizes [input, after level 0, ..., after level L-1]."""
    sizes = [num_bins]
    for k, s, p in zip(kernels, strides, paddings):
        sizes.append(conv_out_len(sizes[-1], k, s, p))
    return sizes


def uniform_init(key, shape, fan_in: int) -> jnp.ndarray:
    """torch Conv/Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound,
                              dtype=jnp.float32)


def init_conv(key, out_ch: int, in_ch: int, kernel: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel
    return (uniform_init(kw, (out_ch, in_ch, kernel), fan_in),
            uniform_init(kb, (out_ch,), fan_in))


def init_conv_transpose(key, in_ch: int, out_ch: int, kernel: int):
    kw, kb = jax.random.split(key)
    fan_in = out_ch * kernel  # torch ConvTranspose fan_in uses weight.size(1)*k
    return (uniform_init(kw, (in_ch, out_ch, kernel), fan_in),
            uniform_init(kb, (out_ch,), fan_in))


def as_jnp(params: Dict[str, np.ndarray]) -> Params:
    return {k: jnp.asarray(v) for k, v in params.items()}


def scan_cell(cell_fn, params: Params, x: jnp.ndarray, carry):
    """Run ``cell_fn(params, x_t, carry) -> (y_t, carry)`` over the time
    axis of x: (B, T, F) -> (B, T, F_out)."""
    xt = jnp.swapaxes(x, 0, 1)  # (T, B, F)

    def step(c, x_t):
        y_t, c2 = cell_fn(params, x_t, c)
        return c2, y_t

    carry, ys = jax.lax.scan(step, carry, xt)
    return jnp.swapaxes(ys, 0, 1), carry


def maybe_batch(x: jnp.ndarray):
    """Reference models accept (T, F) by unsqueezing a batch dim
    (gruunet2.py:290-293)."""
    if x.ndim == 2:
        return x[None], True
    return x, False
