"""Host-side audio I/O (the L1 layer): decode, cache, chunk, mix.

The reference decodes any container through PyAV/FFmpeg (utils.py:178-199).
This environment has no FFmpeg, so the native WAV codec (stdlib-based, with
an optional C++ fast path) covers the shipped corpora; other containers are
gated behind an ffmpeg-binary subprocess decoder when one is present.
"""

from audio_denoising_tpu.io.wavio import read_wav, write_wav, pcm_to_float32, float32_to_pcm16
from audio_denoising_tpu.io.cache import AudioCache
from audio_denoising_tpu.io.stream import (
    buffer_stream, limit_stream, combine_audio, clip_audio_to_same_size,
    stream_audio,
)
from audio_denoising_tpu.io.ffmpeg import ffmpeg_available, read_audio_ffmpeg

__all__ = [
    "read_wav", "write_wav", "pcm_to_float32", "float32_to_pcm16",
    "AudioCache", "buffer_stream", "limit_stream", "combine_audio",
    "clip_audio_to_same_size", "stream_audio",
    "ffmpeg_available", "read_audio_ffmpeg",
]
