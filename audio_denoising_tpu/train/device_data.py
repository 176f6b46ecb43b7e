"""Device-resident training data pipeline.

The host-side MixtureSampler moves ~24 MB of waveforms to the device per
step — on a remote-attached chip that transfer dwarfs the 31 ms compute
step (measured ~300 ms for 12 MB). TPU-native fix: upload the WHOLE corpus
to HBM once (the reference corpus is 24 MB — smaller than one batch of
features) and synthesize every batch on device inside the jitted step:

- clean crops: random windows into the concatenated corpus buffer
  (windows may straddle file boundaries — equivalent to the reference's
  collect-files-until-buffer-met concatenation, utils.py:121-164);
- noise: the sampler's white+brown synthetic mixture, generated with the
  on-device PRNG (the reference's webm noise corpus is undecodable here);
- mixture: clip(clean + gain * noise) (combine_audio, utils.py:368-372).

Per-step host<->device traffic: one PRNG key in, one loss scalar out.

Measured tradeoff: on a DIRECTLY-attached chip this removes the per-step
transfer entirely. On this environment's remote-attached chip the big
corpus-buffer gather itself streams through the relay (~1 s/step vs
0.46 s for host sampling + transfer), so the host sampler remains the CLI
default; pass --device-data where the chip is local.
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
                        noise_gain: Tuple[float, float] = (0.2, 1.0)):
    """-> jittable ``sample(key) -> (mixture, clean)``, both
    (batch, crop_samples), computed entirely on device."""
    buf = corpus.buffer
    n = buf.shape[0]
    assert n >= crop_samples, "corpus shorter than one crop"

    def _crop(start):
        return jax.lax.dynamic_slice(buf, (start,), (crop_samples,))

    def sample(key):
        k_pos, k_white, k_gain = jax.random.split(key, 3)
        starts = jax.random.randint(k_pos, (batch_size,), 0,
                                    n - crop_samples)
        clean = jax.vmap(_crop)(starts)

        white = jax.random.normal(k_white, (batch_size, crop_samples))
        brown = jnp.cumsum(white, axis=-1)
        brown = brown / jnp.maximum(
            jnp.max(jnp.abs(brown), axis=-1, keepdims=True), 1e-6)
        wn = white / jnp.maximum(
            jnp.max(jnp.abs(white), axis=-1, keepdims=True), 1e-6)
        noise = 0.7 * wn + 0.3 * brown
        noise = noise / jnp.maximum(
            jnp.max(jnp.abs(noise), axis=-1, keepdims=True), 1e-6)

        lo, hi = noise_gain
        gain = jax.random.uniform(k_gain, (batch_size, 1), minval=lo,
                                  maxval=hi)
        mixture = jnp.clip(clean + gain * noise, -1.0, 1.0)
        return mixture.astype(jnp.float32), clean.astype(jnp.float32)

    return sample
