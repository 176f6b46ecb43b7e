"""Polyphase sinc resampling, torchaudio ``Resample`` semantics.

The reference instantiates 44.1k<->48k resamplers globally (utils.py:48-49)
and resamples uploads to 48 kHz (app.py:180-195). This is the standard
windowed-sinc polyphase algorithm (``sinc_interp_hann``): a bank of
``new_freq/gcd`` FIR phases applied as one strided conv — a single
conv_general_dilated call on TPU.
"""

import math
from functools import lru_cache, partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@lru_cache(maxsize=32)
def _sinc_kernel_np(orig_freq: int, new_freq: int,
                    lowpass_filter_width: int = 6,
                    rolloff: float = 0.99) -> Tuple[np.ndarray, int]:
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    base_freq = min(orig, new) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig / base_freq))

    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t = np.clip(t * base_freq, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t = t * np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * (base_freq / orig)
    return kernel.astype(np.float32)[:, None, :], width  # (new, 1, taps)


def resample_kernel(orig_freq: int, new_freq: int,
                    lowpass_filter_width: int = 6,
                    rolloff: float = 0.99) -> Tuple[jnp.ndarray, int]:
    k, w = _sinc_kernel_np(orig_freq, new_freq, lowpass_filter_width, rolloff)
    return jnp.asarray(k), w


@partial(jax.jit, static_argnames=("orig_freq", "new_freq",
                                   "lowpass_filter_width", "rolloff"))
def resample(x: jnp.ndarray, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 6, rolloff: float = 0.99) -> jnp.ndarray:
    """x: (..., L) at orig_freq -> (..., ceil(L * new/orig)) at new_freq."""
    if orig_freq == new_freq:
        return x
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    kernel, width = resample_kernel(orig_freq, new_freq,
                                    lowpass_filter_width, rolloff)
    shape = x.shape
    length = shape[-1]
    flat = x.reshape(-1, 1, length)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (width, width + orig)))
    out = lax.conv_general_dilated(
        flat, kernel,
        window_strides=(orig,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, new, T')
    out = out.swapaxes(-1, -2).reshape(flat.shape[0], -1)
    target = int(math.ceil(new * length / orig))
    return out[..., :target].reshape(shape[:-1] + (target,))
