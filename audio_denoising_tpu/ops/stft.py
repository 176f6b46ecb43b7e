"""STFT / iSTFT with torch.stft / torch.istft semantics.

The reference computes spectrograms through torchaudio's ``Spectrogram``
(power=None) and inverts with ``InverseSpectrogram`` / ``GriffinLim``
(app2.py:142-160, server.py:173-174); both are thin wrappers over
``torch.stft`` / ``torch.istft`` with center=True and reflect padding.
These functions reproduce that numerics exactly (golden-tested against
torch core) while staying statically shaped and jit-friendly.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from audio_denoising_tpu.ops.windows import hann_window


def num_frames(length: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    """Number of STFT frames torch.stft produces for a signal of ``length``."""
    if center:
        length = length + 2 * (n_fft // 2)
    return 1 + (length - n_fft) // hop_length


def _pad_center_reflect(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad the last axis by ``pad`` on both sides (torch 'reflect')."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def _full_window(window: Optional[jnp.ndarray], n_fft: int, win_length: int):
    """Zero-pad a win_length window to n_fft, centered (torch.stft rule)."""
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        window = jnp.pad(window, (left, n_fft - win_length - left))
    return window


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int,
                 center: bool = True) -> jnp.ndarray:
    """Slice (..., L) into overlapping frames (..., T, n_fft)."""
    if center:
        x = _pad_center_reflect(x, n_fft // 2)
    length = x.shape[-1]
    t = 1 + (length - n_fft) // hop_length
    idx = (jnp.arange(t)[:, None] * hop_length + jnp.arange(n_fft)[None, :])
    return x[..., idx]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "center"))
def stft(x: jnp.ndarray, n_fft: int, hop_length: int,
         win_length: Optional[int] = None, window: Optional[jnp.ndarray] = None,
         center: bool = True) -> jnp.ndarray:
    """Complex STFT of (..., L) -> (..., n_fft//2 + 1, T).

    Matches ``torch.stft(center=True, pad_mode='reflect', normalized=False,
    onesided=True, return_complex=True)``.
    """
    win_length = win_length or n_fft
    window = _full_window(window, n_fft, win_length)
    frames = frame_signal(x, n_fft, hop_length, center=center)
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)  # (..., freq, T)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length",
                                   "center", "length"))
def istft(spec: jnp.ndarray, n_fft: int, hop_length: int,
          win_length: Optional[int] = None, window: Optional[jnp.ndarray] = None,
          center: bool = True, length: Optional[int] = None) -> jnp.ndarray:
    """Inverse STFT of (..., freq, T) -> (..., L), matching ``torch.istft``.

    Overlap-add of windowed irfft frames, normalized by the window-square
    envelope (guarded where the envelope is ~0 rather than raising, unlike
    torch which errors on zero envelope bins).
    """
    win_length = win_length or n_fft
    window = _full_window(window, n_fft, win_length)

    t = spec.shape[-1]
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window  # (..., T, n_fft)

    out_len = n_fft + hop_length * (t - 1)
    idx = (jnp.arange(t)[:, None] * hop_length + jnp.arange(n_fft)[None, :]).reshape(-1)

    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, t * n_fft))
    out = jnp.zeros((flat.shape[0], out_len), dtype=frames.dtype)
    out = out.at[:, idx].add(flat)
    out = out.reshape(batch_shape + (out_len,))

    env = jnp.zeros((out_len,), dtype=frames.dtype)
    env = env.at[idx].add(jnp.tile(window * window, t))
    out = out / jnp.where(jnp.abs(env) > 1e-11, env, 1.0)

    # torch.istft trimming: with center, drop n_fft//2 from the start; the
    # end is trimmed to (out_len - n_fft//2) ONLY when no explicit length is
    # requested — a given length is taken from the start offset directly.
    start = n_fft // 2 if center else 0
    if length is None:
        end = out_len - start if center else out_len
    else:
        end = start + length
    if end > out_len:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, end - out_len)])
    return out[..., start:end]
