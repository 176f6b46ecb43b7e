"""audio_denoising_tpu — a TPU-native real-time voice-cleaning framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``belacks/audio-denoising`` project (real-time microphone noise suppression
with recurrent U-Nets over mel log-magnitude spectrograms):

- ``ops``      — pure-JAX DSP chain (STFT, mel, Griffin-Lim, iSTFT, resample)
                 with torch/torchaudio-compatible numerics, plus fused Pallas
                 kernels for the hot path.
- ``models``   — the model zoo (GRUUNet2, GRUUNet, MOMO1-3, UNet2d family,
                 TRUNet, GRU) as functional pytree modules; sequence mode is
                 ``lax.scan`` over frames with carried hidden state.
- ``compat``   — torch ``.pth`` checkpoint import and ONNX parity tooling.
- ``pipeline`` — end-to-end offline and streaming denoise graphs.
- ``runtime``  — stateful multi-stream serving engine (batched, jitted).
- ``parallel`` — device-mesh sharding utilities (pjit over a streams axis).
- ``train``    — optax training loop (AdamW + exponential decay) with the
                 reference's mixture-synthesis data pipeline.
- ``io``       — host-side audio I/O (WAV codec, PCM conversion, caching).
"""

__version__ = "0.1.0"

from audio_denoising_tpu import config  # noqa: F401
