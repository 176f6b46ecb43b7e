"""Mel filterbank and (inverse) mel projection.

Reproduces torchaudio's ``MelScale`` defaults as used by the reference
(app2.py:147-155, server.py:175-176): HTK mel scale, no filterbank norm,
f_min=0, f_max=sr/2. The inverse projection replaces torchaudio's per-call
least-squares solve (``InverseMelScale``) with a precomputed minimum-norm
solve (pinv), which satisfies the same linear system ``fb.T @ X = mel``
exactly on the filterbank's row space but is a single matmul per frame —
the right trade for a TPU serving path (SURVEY §7 hard-part #1).
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


def hz_to_mel(f):
    """HTK mel scale (torchaudio default for MelScale)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@lru_cache(maxsize=32)
def _mel_filterbank_np(n_stft: int, n_mels: int, sample_rate: int,
                       f_min: float = 0.0, f_max=None) -> np.ndarray:
    """Triangular mel filterbank (n_stft, n_mels), torchaudio
    ``melscale_fbanks(norm=None, mel_scale='htk')`` semantics."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_stft)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_stft, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_filterbank(n_stft: int, n_mels: int, sample_rate: int,
                   f_min: float = 0.0, f_max=None) -> jnp.ndarray:
    return jnp.asarray(_mel_filterbank_np(n_stft, n_mels, sample_rate, f_min, f_max))


@lru_cache(maxsize=32)
def _inverse_mel_matrix_np(n_stft: int, n_mels: int, sample_rate: int,
                           f_min: float = 0.0, f_max=None) -> np.ndarray:
    """Precomputed minimum-norm right-inverse of fb.T: shape (n_stft, n_mels).

    X = pinv(fb.T) @ mel is the minimum-norm solution of fb.T X = mel —
    deterministic, one matmul per frame, and exact on the row space of fb
    (torchaudio's lstsq solution differs only in null-space components).
    """
    fb = _mel_filterbank_np(n_stft, n_mels, sample_rate, f_min, f_max)
    inv = np.linalg.pinv(fb.T.astype(np.float64), rcond=1e-8)
    return inv.astype(np.float32)


def inverse_mel_matrix(n_stft: int, n_mels: int, sample_rate: int,
                       f_min: float = 0.0, f_max=None) -> jnp.ndarray:
    return jnp.asarray(_inverse_mel_matrix_np(n_stft, n_mels, sample_rate, f_min, f_max))


def mel_scale(spec: jnp.ndarray, fb: jnp.ndarray) -> jnp.ndarray:
    """(..., n_stft, T) magnitude -> (..., n_mels, T); torchaudio MelScale
    applies ``matmul(spec.transpose(-1,-2), fb).transpose(-1,-2)``."""
    return jnp.einsum("...ft,fm->...mt", spec, fb)


def inverse_mel_scale(mel: jnp.ndarray, inv_fb: jnp.ndarray) -> jnp.ndarray:
    """(..., n_mels, T) -> (..., n_stft, T) non-negative magnitude estimate.

    relu(pinv solve), mirroring torchaudio InverseMelScale's relu-after-lstsq.
    """
    spec = jnp.einsum("...mt,fm->...ft", mel, inv_fb)
    return jnp.maximum(spec, 0.0)
