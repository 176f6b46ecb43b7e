"""Model-independent input-SNR estimation: per-bin noise-floor tracking.

Minimum-statistics-style tracker (Martin '01 simplified to a jit-able
O(bins) carry): per-bin spectral power is EMA-smoothed (the raw chi²(2)
power's minima run to zero — smoothing bounds the min bias), then the
floor follows the smoothed power DOWN instantly and UP only at a bounded
exponential rate, so vocal/speech energy — sparse in time — rides above
the floor while steady noise defines it. Both time constants are
expressed in SECONDS and converted per (hop, sample_rate); the residual
min bias at the defaults measures ~1.2x (calibrated on chi²(2) noise),
compensated in the SNR estimate.

Used by the serving-side SNR gate (ServingConfig.snr_gate_db): the output
magnitude blends toward passthrough on near-clean input — the causal
models otherwise DAMAGE clean audio (manifest v2, docs/BENCHMARKS.md:
every causal checkpoint measures negative ΔSI-SDR at +10 dB input SNR).
The reference has no counterpart (its serving applies the model
unconditionally, server.py:207-216); this is a production-safety feature
a "Discord-like noise suppressor" (reference README.md:3) needs.
"""

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# Time constants (seconds): power-smoothing EMA, the floor's rise
# (doubling) time, and the long total-power EMA the stream-level SNR is
# computed from; the bias factor compensates the smoothed-min's residual
# underestimate of the mean noise power.
SMOOTH_TAU_SECONDS = 0.1
FLOOR_DOUBLE_SECONDS = 0.4
TOTAL_TAU_SECONDS = 2.0
FLOOR_BIAS = 1.2
_EPS = 1e-12


class FloorState(NamedTuple):
    smooth: jnp.ndarray   # (B, F) EMA of per-bin power
    floor: jnp.ndarray    # (B, F) tracked noise floor
    total: jnp.ndarray    # (B,) long EMA of mean frame power


def floor_rise_per_frame(hop_length: int, sample_rate: int,
                         double_seconds: float = FLOOR_DOUBLE_SECONDS
                         ) -> float:
    """Multiplicative per-frame rise bound: floor doubles in
    ``double_seconds`` of audio when the input is persistently louder."""
    frames_per_double = double_seconds * sample_rate / hop_length
    return float(2.0 ** (1.0 / max(frames_per_double, 1.0)))


def smooth_beta_per_frame(hop_length: int, sample_rate: int,
                          tau_seconds: float = SMOOTH_TAU_SECONDS) -> float:
    """EMA retention per frame for a ``tau_seconds`` time constant."""
    return float(np.exp(-hop_length / (sample_rate * tau_seconds)))


def total_beta_per_frame(hop_length: int, sample_rate: int,
                         tau_seconds: float = TOTAL_TAU_SECONDS) -> float:
    """EMA retention for the stream-level total-power average."""
    return smooth_beta_per_frame(hop_length, sample_rate, tau_seconds)


def floor_init(power0: jnp.ndarray) -> FloorState:
    """Seed from the first frame's power (the floor can only go down from
    there, so a loud first frame biases clean-ward briefly — the safe
    direction)."""
    return FloorState(smooth=power0, floor=power0,
                      total=jnp.mean(power0, axis=-1))


def floor_step(state: FloorState, power_t: jnp.ndarray, beta: float,
               rise: float, beta_tot: float) -> FloorState:
    """One causal frame update; power_t (B, F) linear spectral power.

    A multiplicative rise cannot leave zero, so an all-zero carry (a
    freshly admitted stream slot — engine slots zero their state) LATCHES
    to the current smoothed power instead of staying pinned at 0 (which
    would read as +inf SNR and force passthrough forever)."""
    smooth = beta * state.smooth + (1.0 - beta) * power_t
    fresh = state.floor <= 0.0
    floor = jnp.where(fresh, smooth,
                      jnp.minimum(smooth, state.floor * rise))
    p_mean = jnp.mean(power_t, axis=-1)
    total = jnp.where(state.total <= 0.0, p_mean,
                      beta_tot * state.total + (1.0 - beta_tot) * p_mean)
    return FloorState(smooth=smooth, floor=floor, total=total)


def noise_floor_scan(power: jnp.ndarray, rise: float, beta: float,
                     beta_tot: float, init: FloorState = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, FloorState]:
    """Causal per-bin floor + stream-level total over a frame sequence.

    power: (B, F, T) linear spectral power -> (floors (B, F, T),
    totals (B, T), final FloorState). ``init`` seeds the carry
    (streaming)."""
    state = floor_init(power[..., 0]) if init is None else init

    def step(s, p):
        s = floor_step(s, p, beta, rise, beta_tot)
        return s, (s.floor, s.total)

    last, (floors, totals) = jax.lax.scan(step, state,
                                          jnp.moveaxis(power, -1, 0))
    return jnp.moveaxis(floors, 0, -1), jnp.moveaxis(totals, 0, -1), last


def snr_db_from_floor(total: jnp.ndarray, floor_mean: jnp.ndarray,
                      bias: float = FLOOR_BIAS) -> jnp.ndarray:
    """STREAM-level input-SNR estimate in dB from the long total-power
    EMA and the bin-MEAN of the tracked floor (caller reduces the bin
    axis; both args must broadcast together).

    Energy-weighted on purpose: a per-frame estimate passes loud vocal
    bursts through even in noisy streams (a burst frame IS high-SNR);
    the long EMA weighs the whole recent signal, separating clean
    streams from noisy ones (measured on the tuning set: per-frame
    gating destroyed the -5 dB bracket, stream-level keeps it)."""
    nf = bias * floor_mean
    sig = jnp.maximum(total - nf, 0.0)
    return 10.0 * jnp.log10((sig + _EPS) / (nf + _EPS))


def gate_alpha(snr_db: jnp.ndarray, gate_db: float,
               width_db: float) -> jnp.ndarray:
    """Denoise weight in [0, 1]: 1 below the gate (noisy -> denoise),
    0 far above it (clean -> passthrough)."""
    return jax.nn.sigmoid((gate_db - snr_db) / max(width_db, 1e-3))
