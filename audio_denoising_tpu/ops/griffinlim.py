"""Griffin-Lim phase reconstruction as a ``lax.fori_loop``.

Mirrors torchaudio's ``GriffinLim(power=1.0, n_iter=32, momentum=0.99)`` as
instantiated on the reference WebRTC path (app2.py:156-160); the iteration
structure (momentum-accelerated fast Griffin-Lim) follows torchaudio's
functional.griffinlim. torchaudio defaults to random phase init; for
deterministic serving we default to unit phase (``init='ones'``) and expose
``init='random'`` with an explicit key.

The 32 rfft/irfft rounds per hop are the dominant reference cost (SURVEY
§3.1); here the whole loop is one fused XLA computation, batched over
streams, so the FFTs vectorize across the stream batch.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from audio_denoising_tpu.ops.stft import stft, istft


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length",
                                   "n_iter", "momentum", "length", "init",
                                   "return_angles"))
def griffin_lim(magnitude: jnp.ndarray, n_fft: int, hop_length: int,
                win_length: Optional[int] = None,
                window: Optional[jnp.ndarray] = None,
                n_iter: int = 32, momentum: float = 0.99,
                length: Optional[int] = None, init: str = "ones",
                key: Optional[jax.Array] = None,
                init_angles: Optional[jnp.ndarray] = None,
                return_angles: bool = False):
    """magnitude: (..., freq, T) non-negative -> waveform (..., L).

    ``init_angles`` seeds the phase estimate (RTISI-style streaming warm
    start: pass the previous hop's converged angles, run far fewer
    iterations); ``return_angles`` also returns the converged angles for
    carrying."""
    assert 0 <= momentum < 1
    mom = momentum / (1 + momentum)

    if init_angles is not None:
        angles = init_angles.astype(jnp.complex64)
    elif init == "random":
        if key is None:
            key = jax.random.PRNGKey(0)
        kr, ki = jax.random.split(key)
        angles = (jax.random.uniform(kr, magnitude.shape) +
                  1j * jax.random.uniform(ki, magnitude.shape)).astype(jnp.complex64)
    else:
        angles = jnp.full(magnitude.shape, 1.0 + 0.0j, dtype=jnp.complex64)

    mag = magnitude.astype(jnp.float32)

    def body(_, carry):
        angles, tprev = carry
        inverse = istft(mag * angles, n_fft, hop_length, win_length,
                        window=window, length=length)
        rebuilt = stft(inverse, n_fft, hop_length, win_length, window=window)
        upd = rebuilt - mom * tprev
        upd = upd / (jnp.abs(upd) + 1e-16)
        return (upd, rebuilt)

    zero = jnp.zeros_like(angles)
    angles, _ = jax.lax.fori_loop(0, n_iter, body, (angles, zero))
    out = istft(mag * angles, n_fft, hop_length, win_length,
                window=window, length=length)
    if return_angles:
        return out, angles
    return out
