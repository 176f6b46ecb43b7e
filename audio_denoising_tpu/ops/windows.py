"""Window functions matching torch conventions."""

import jax.numpy as jnp


def hann_window(window_length: int, periodic: bool = True, dtype=jnp.float32):
    """Periodic Hann window, identical to ``torch.hann_window`` (the window
    used throughout the reference DSP chain, e.g. app2.py:144-162,195).

    w[n] = 0.5 * (1 - cos(2*pi*n / N)) for n in [0, N) when periodic.
    """
    if window_length == 1:
        return jnp.ones((1,), dtype=dtype)
    n = jnp.arange(window_length, dtype=jnp.float32)
    denom = window_length if periodic else window_length - 1
    w = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * n / denom))
    return w.astype(dtype)
