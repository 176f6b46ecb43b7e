"""Input-SNR estimation for the serving-side SNR gate.

Two estimators (ServingConfig.snr_gate_estimator):

``floor`` — model-independent per-bin noise-floor tracking.
Minimum-statistics-style tracker (Martin '01 simplified to a jit-able
O(bins) carry): per-bin spectral power is EMA-smoothed (the raw chi²(2)
power's minima run to zero — smoothing bounds the min bias), then the
floor follows the smoothed power DOWN instantly and UP only at a bounded
exponential rate, so vocal/speech energy — sparse in time — rides above
the floor while steady noise defines it. Both time constants are
expressed in SECONDS and converted per (hop, sample_rate); the residual
min bias at the defaults measures ~1.2x (calibrated on chi²(2) noise),
compensated in the SNR estimate.

``removed`` (default) — model-informed: the denoiser itself is the best
noise estimator in the chain. Per frame, the power the model REMOVED
(mean over bins of (P_in - P_out) clipped at 0) estimates the noise and
the output power estimates the signal; both run through long EMAs
(TOTAL_TAU_SECONDS) and their ratio is the stream SNR. On the frozen
manifest-v2 mixtures (round 4, nonstationary kaggle noise) this
estimator separates true -5/0 dB inputs from +10 dB with 0.92 threshold
accuracy vs the floor tracker's 0.81 — min-statistics under-reads
nonstationary noise (est. spread sd ~7 dB, worst true -5 dB stream read
as +23 dB "clean", which made the floor-gated blend DAMAGE the -5 dB
bracket by -1.8 dB SI-SDR, paired, either checkpoint). ``removed`` costs
two scalar EMAs per stream vs the floor tracker's two (B, F) planes.

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


# 'both' estimator: the floor tracker VETOES the removed estimator's
# false-cleans. The two fail on DISJOINT streams (measured on manifest
# v2's mixtures, tools-level distribution probe, round 4): clean
# streams' floor estimates sit >= 7.4 dB while 11 of the 16 noisy
# streams the removed estimator over-reads have floor estimates < 1.8 —
# so a full veto at <= FLOOR_VETO_GATE - FLOOR_VETO_WIDTH (2 dB) that
# fades out by +7 dB blocks the leaks without touching a single clean
# stream. Constants derive from estimator DISTRIBUTIONS (threshold
# accuracy 0.91/1.00 clean/noisy vs 0.91/0.97 for removed alone), not
# from metric tuning on the frozen manifest.
FLOOR_VETO_GATE_DB = 4.5
FLOOR_VETO_WIDTH_DB = 2.5


def estimator_planes(estimator: str) -> Tuple[bool, bool]:
    """(uses_removed, uses_floor): which estimator state sets a gate
    configuration carries. THE single predicate — every serving path's
    state init and step must agree on it ('both' carries all five
    planes; a drifted hand-rolled copy crashed engine mode 'unet' under
    the tuned default in round 4)."""
    if estimator not in ("removed", "floor", "both"):
        raise ValueError(f"unknown snr_gate_estimator {estimator!r}")
    return (estimator in ("removed", "both"),
            estimator in ("floor", "both"))


def gate_alpha(snr_db: jnp.ndarray, gate_db: float,
               width_db: float) -> jnp.ndarray:
    """Denoise weight in [0, 1]: 1 at/below gate - width (noisy ->
    denoise), 0 at/above gate + width (clean -> passthrough), linear
    between. A clipped RAMP, not a sigmoid: the sigmoid's tails leak —
    at the tuned (gate 1, width 6) a correctly-read -5 dB stream still
    got sigmoid((1+5)/6) = 27% passthrough of raw noise, which cost the
    -5 dB bracket -1.6 dB SI-SDR paired on manifest v2. The ramp is
    EXACTLY full-denoise below the foot, so a sound estimator stops
    paying for its own transition band."""
    w = max(width_db, 1e-3)
    return jnp.clip((gate_db + w - snr_db) / (2.0 * w), 0.0, 1.0)


# --------------------------------------------------------------------------
# Model-informed estimator: SNR from what the model removed
# --------------------------------------------------------------------------

class RemovedState(NamedTuple):
    """Carry for the 'removed' estimator: long EMAs of the model's output
    power (signal proxy) and removed power (noise proxy), both (B,)."""
    out: jnp.ndarray
    rem: jnp.ndarray


def removed_init(batch: int, dtype=jnp.float32) -> RemovedState:
    """Zeros latch to the first frame's powers (see ``removed_step``)."""
    return RemovedState(out=jnp.zeros((batch,), dtype),
                        rem=jnp.zeros((batch,), dtype))


def removed_powers(power_in: jnp.ndarray, power_out: jnp.ndarray,
                   axis: int = -1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame (signal, noise) power proxies from the model's own pass:
    bin-mean output power, and bin-mean of the power the model removed
    (clipped at 0 per bin — bins the model AMPLIFIED say nothing about
    the noise). ``axis`` is the bin axis of linear spectral powers."""
    p_out = jnp.mean(power_out, axis=axis)
    p_rem = jnp.mean(jnp.maximum(power_in - power_out, 0.0), axis=axis)
    return p_out, p_rem


def removed_step(state: RemovedState, p_out_t: jnp.ndarray,
                 p_rem_t: jnp.ndarray, beta_tot: float) -> RemovedState:
    """One causal frame update of both EMAs. An all-zero carry (freshly
    admitted engine slot) LATCHES to the current powers, like
    ``floor_step`` — a zero 'rem' EMA would otherwise read +inf SNR and
    force passthrough on a stream that just started mid-noise."""
    fresh = (state.out + state.rem) <= 0.0
    out = jnp.where(fresh, p_out_t,
                    beta_tot * state.out + (1.0 - beta_tot) * p_out_t)
    rem = jnp.where(fresh, p_rem_t,
                    beta_tot * state.rem + (1.0 - beta_tot) * p_rem_t)
    return RemovedState(out=out, rem=rem)


def removed_snr_db(state: RemovedState) -> jnp.ndarray:
    """Stream-level SNR estimate (B,) from the EMA pair."""
    return 10.0 * jnp.log10((state.out + _EPS) / (state.rem + _EPS))


def removed_snr_scan(p_out: jnp.ndarray, p_rem: jnp.ndarray,
                     beta_tot: float, init: RemovedState = None
                     ) -> Tuple[jnp.ndarray, RemovedState]:
    """Causal SNR trajectory over a frame sequence.

    p_out, p_rem: (B, T) per-frame powers -> (snr_db (B, T), final
    RemovedState). ``init`` seeds the carry (streaming)."""
    state = removed_init(p_out.shape[0], p_out.dtype) if init is None \
        else init

    def step(s, pv):
        s = removed_step(s, pv[0], pv[1], beta_tot)
        return s, removed_snr_db(s)

    last, snrs = jax.lax.scan(step, state, (p_out.T, p_rem.T))
    return snrs.T, last
