"""Denoising quality metrics (the reference has no evaluation beyond
training-loss records — SURVEY §4): SNR, SI-SDR, and log-spectral
distance, all pure-JAX and batched."""

import jax.numpy as jnp


def snr_db(clean: jnp.ndarray, estimate: jnp.ndarray,
           eps: float = 1e-8) -> jnp.ndarray:
    """Signal-to-noise ratio in dB over the last axis."""
    noise = estimate - clean
    num = jnp.sum(clean ** 2, axis=-1)
    den = jnp.sum(noise ** 2, axis=-1)
    return 10.0 * jnp.log10((num + eps) / (den + eps))


def si_sdr_db(clean: jnp.ndarray, estimate: jnp.ndarray,
              eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SDR (Le Roux et al. 2019) over the last axis —
    invariant to the pipeline's gain conventions (e.g. the reference's
    x3 output gain, server.py:213)."""
    clean = clean - clean.mean(axis=-1, keepdims=True)
    estimate = estimate - estimate.mean(axis=-1, keepdims=True)
    dot = jnp.sum(clean * estimate, axis=-1, keepdims=True)
    energy = jnp.sum(clean ** 2, axis=-1, keepdims=True)
    target = dot / (energy + eps) * clean
    noise = estimate - target
    num = jnp.sum(target ** 2, axis=-1)
    den = jnp.sum(noise ** 2, axis=-1)
    return 10.0 * jnp.log10((num + eps) / (den + eps))


def log_spectral_distance(clean: jnp.ndarray, estimate: jnp.ndarray,
                          n_fft: int = 512, hop: int = 256,
                          eps: float = 1e-5) -> jnp.ndarray:
    """RMS distance between log-magnitude spectrograms (dB-ish)."""
    from audio_denoising_tpu.ops import stft, hann_window
    win = hann_window(n_fft)
    a = jnp.log(jnp.abs(stft(clean, n_fft, hop, n_fft, window=win)) + eps)
    b = jnp.log(jnp.abs(stft(estimate, n_fft, hop, n_fft, window=win)) + eps)
    return jnp.sqrt(jnp.mean((a - b) ** 2, axis=(-2, -1)))
