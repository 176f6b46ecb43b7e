"""Pure-JAX DSP ops with torch/torchaudio-compatible numerics.

Every op here is functional, statically shaped, and jit/vmap/scan friendly.
The hot-path compositions (frame→window→rfft→mel→log1p and the inverse
chain) additionally have fused Pallas TPU kernels in ``ops.pallas``.
"""

from audio_denoising_tpu.ops.windows import hann_window
from audio_denoising_tpu.ops.stft import stft, istft, frame_signal, num_frames
from audio_denoising_tpu.ops.mel import (
    hz_to_mel, mel_to_hz, mel_filterbank, mel_scale, inverse_mel_scale,
    inverse_mel_matrix,
)
from audio_denoising_tpu.ops.compress import (
    signed_log_clamp, signed_log_unclamp, log1p_compress, expm1_expand,
    wrap_complex, unwrap_complex, normalize_stds, denormalize_stds, STDS,
)
from audio_denoising_tpu.ops.griffinlim import griffin_lim
from audio_denoising_tpu.ops.resample import resample, resample_kernel
from audio_denoising_tpu.ops.convs import (
    conv1d, conv_transpose1d, conv2d, conv_transpose2d,
    transpose_output_padding,
)

__all__ = [
    "hann_window", "stft", "istft", "frame_signal", "num_frames",
    "hz_to_mel", "mel_to_hz", "mel_filterbank", "mel_scale",
    "inverse_mel_scale", "inverse_mel_matrix",
    "signed_log_clamp", "signed_log_unclamp", "log1p_compress", "expm1_expand",
    "wrap_complex", "unwrap_complex", "normalize_stds", "denormalize_stds", "STDS",
    "griffin_lim", "resample", "resample_kernel",
    "conv1d", "conv_transpose1d", "conv2d", "conv_transpose2d",
    "transpose_output_padding",
]
