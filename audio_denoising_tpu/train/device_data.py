"""Device-resident training data pipeline.

The host-side MixtureSampler moves ~24 MB of waveforms to the device per
step — on a remote-attached chip that transfer dwarfs the 31 ms compute
step (measured ~300 ms for 12 MB). TPU-native fix: upload the WHOLE corpus
to HBM once (the reference corpus is 24 MB — smaller than one batch of
features) and synthesize every batch on device inside the jitted step:

- clean crops: random windows into the concatenated corpus buffer
  (windows may straddle file boundaries — equivalent to the reference's
  collect-files-until-buffer-met concatenation, utils.py:121-164);
- noise: random crops of a second device-resident REAL noise buffer (the
  reference's kaggle webm corpus, decoded via io/codec.py), or the
  white+brown synthetic mixture from the on-device PRNG when no noise
  corpus is given;
- mixture: clip(clean + gain * noise) (combine_audio, utils.py:368-372).

Per-step host<->device traffic: one PRNG key in, one loss scalar out.

Performance note (hard-won): the corpus buffers must ride as jit
ARGUMENTS. A first version closed over them as traced constants and the
runtime re-staged the 230 MB corpus per dispatch — ~1 s/step on the relay
(mis-blamed on "big-buffer gather" in round 1). With buffers as arguments
the same loop runs **45 ms/step** (vs 464 ms for host sampling + per-step
transfer): 10× faster, and the on-device noise is the real corpus.
"""

from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from audio_denoising_tpu.io.cache import AudioCache


class DeviceCorpus:
    """Concatenated mono corpus resident on device."""

    def __init__(self, buffer: jnp.ndarray, sample_rate: int):
        self.buffer = buffer
        self.sample_rate = sample_rate

    @classmethod
    def from_paths(cls, paths: Sequence[str], sample_rate: int = 48000,
                   max_samples: int = 200_000_000) -> "DeviceCorpus":
        """Loads, monotizes and (once, grouped by source rate) resamples
        the corpus to ``sample_rate``, then uploads one buffer."""
        from audio_denoising_tpu.ops.resample import resample

        cache = AudioCache()
        by_rate = {}
        total = 0
        for p in paths:
            samples, sr = cache.load(p)
            mono = samples[0] if samples.ndim == 2 else samples
            by_rate.setdefault(sr, []).append(mono.astype(np.float32))
            total += mono.shape[-1]
            if total >= max_samples:
                break
        pieces = []
        for sr, chunks in sorted(by_rate.items()):
            buf = np.concatenate(chunks)
            if sr != sample_rate:
                buf = np.asarray(resample(jnp.asarray(buf)[None], sr,
                                          sample_rate)[0])
            pieces.append(buf)
        if not pieces:
            raise ValueError("no usable corpus files")
        return cls(jnp.asarray(np.concatenate(pieces)), sample_rate)

    def __len__(self):
        return int(self.buffer.shape[0])


def make_device_sampler(corpus: DeviceCorpus, crop_samples: int,
                        batch_size: int,
                        noise_gain: Tuple[float, float] = (0.2, 1.0),
                        noise_corpus: "DeviceCorpus" = None,
                        snr_range_db: Tuple[float, float] = None,
                        identity_prob: float = 0.0):
    """-> jittable ``sample(key, buf[, noise_buf]) -> (mixture, clean)``,
    both (batch, crop_samples), computed entirely on device.

    The corpus buffers are ARGUMENTS of the returned function, not traced
    constants: a captured jnp constant can be re-materialized per dispatch
    by the compiler/runtime, while an argument is guaranteed device-
    resident across calls. ``noise_corpus`` switches the noise source from
    the synthetic white+brown mixture to random crops of a real noise
    buffer (the reference's kaggle corpus decodes via io/codec.py).

    ``snr_range_db``: SNR-targeted curriculum (round 3). When set, each
    mixture's noise gain is solved from the crop energies to hit a
    uniform target SNR in [lo, hi] dB, instead of a uniform amplitude
    gain — the batch then covers easy AND hard conditions evenly rather
    than whatever SNR the corpus energies happen to produce. Gain is
    clamped to [0.02, 6] so silent clean crops still carry audible noise
    and loud noise crops cannot blow past the clip.

    ``identity_prob``: per-example probability of mixing ZERO noise
    (mixture == clean) — easy-input preservation (VERDICT r3 #1). The
    curriculum's 0.02 gain floor means the model otherwise never sees a
    clean input and learns to always suppress, which is what damaged
    near-clean audio (-3.2 dB SI-SDR at +10 dB input SNR on manifest
    v2) in the reference's own serving regime (server.py:207-216)."""
    n = int(corpus.buffer.shape[0])
    assert n >= crop_samples, "corpus shorter than one crop"
    n_noise = (int(noise_corpus.buffer.shape[0])
               if noise_corpus is not None else 0)
    if noise_corpus is not None:
        assert n_noise >= crop_samples, "noise corpus shorter than one crop"

    def _crop_from(buf, start):
        return jax.lax.dynamic_slice(buf, (start,), (crop_samples,))

    def sample(key, buf, noise_buf=None):
        k_pos, k_noise, k_gain = jax.random.split(key, 3)
        starts = jax.random.randint(k_pos, (batch_size,), 0,
                                    n - crop_samples)
        clean = jax.vmap(_crop_from, in_axes=(None, 0))(buf, starts)

        if noise_buf is not None:
            nstarts = jax.random.randint(k_noise, (batch_size,), 0,
                                         n_noise - crop_samples)
            noise = jax.vmap(_crop_from, in_axes=(None, 0))(noise_buf,
                                                            nstarts)
        else:
            white = jax.random.normal(k_noise, (batch_size, crop_samples))
            brown = jnp.cumsum(white, axis=-1)
            brown = brown / jnp.maximum(
                jnp.max(jnp.abs(brown), axis=-1, keepdims=True), 1e-6)
            wn = white / jnp.maximum(
                jnp.max(jnp.abs(white), axis=-1, keepdims=True), 1e-6)
            noise = 0.7 * wn + 0.3 * brown
            noise = noise / jnp.maximum(
                jnp.max(jnp.abs(noise), axis=-1, keepdims=True), 1e-6)

        if snr_range_db is not None:
            snr = jax.random.uniform(k_gain, (batch_size, 1),
                                     minval=snr_range_db[0],
                                     maxval=snr_range_db[1])
            e_c = jnp.mean(clean ** 2, axis=-1, keepdims=True)
            e_n = jnp.mean(noise ** 2, axis=-1, keepdims=True)
            gain = jnp.sqrt(e_c / jnp.maximum(e_n, 1e-10)) \
                * 10.0 ** (-snr / 20.0)
            gain = jnp.clip(gain, 0.02, 6.0)
        else:
            lo, hi = noise_gain
            gain = jax.random.uniform(k_gain, (batch_size, 1), minval=lo,
                                      maxval=hi)
        if identity_prob > 0.0:
            # k_gain was already CONSUMED by the uniform above — splitting
            # it would hand bernoulli the same threefry counters that
            # produced the gains (JAX's never-reuse-a-key rule), coupling
            # which examples go identity to the sampled gains. fold_in at
            # index 3 is exactly the would-be 4th child of the original
            # split(key, 3), so existing recipes' sample streams (and
            # their bit-exact reproducibility) are unchanged.
            k_id = jax.random.fold_in(key, 3)
            noisy = jax.random.bernoulli(k_id, 1.0 - identity_prob,
                                         (batch_size, 1))
            gain = gain * noisy
        mixture = jnp.clip(clean + gain * noise, -1.0, 1.0)
        return mixture.astype(jnp.float32), clean.astype(jnp.float32)

    return sample
