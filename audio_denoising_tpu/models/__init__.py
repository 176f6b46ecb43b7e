"""Model zoo registry.

Every recurrent model exposes ``init(key)``, ``cell(params, x_t, carry)``
and ``apply(params, x, hx=None) -> (y, hx')`` (reference contract:
gruunet2.py:290-306, momo3.py:297-323). U-Nets expose
``apply(params, logmag) -> residual`` (unet4.py:147-194).
"""

from typing import Optional

from audio_denoising_tpu.config import ModelConfig
from audio_denoising_tpu.models.gruunet import GRUUNet, GRUUNet2
from audio_denoising_tpu.models.momo import MOMO, MOMO2, MOMO3
from audio_denoising_tpu.models.unet2d import UNet2d
from audio_denoising_tpu.models.gru import GRU
from audio_denoising_tpu.models.trunet import TRUNet

_RECURRENT = {   # None num_bins -> each class's reference default
    "GRUUNet2": lambda cfg, nb: GRUUNet2(cfg, num_bins=nb or 64),
    "GRUUNet": lambda cfg, nb: GRUUNet(cfg, num_bins=nb or 64),
    "MOMO3": lambda cfg, nb: MOMO3(cfg, num_bins=nb or 22),
    "MOMO2": lambda cfg, nb: MOMO2(cfg, num_bins=nb or 22),
    "MOMO": lambda cfg, nb: MOMO(cfg, num_bins=nb or 22),
}

_UNETS = {"UNet2d", "UNet2d3", "UNet2d4", "UNet2d4Wide"}


def build_model(config: ModelConfig, num_bins: Optional[int] = None):
    """Build a model object from a (checkpoint-derived) ModelConfig."""
    arch = config.arch
    if arch in _RECURRENT:
        return _RECURRENT[arch](config, num_bins)
    if arch in _UNETS:
        return UNet2d(arch=arch, chnls_in=config.chnls_in,
                      chnls_out=config.chnls_out, chnls_gs=config.chnls_gs,
                      bins=num_bins or 241)
    if arch == "TRUNet":
        return TRUNet()
    if arch == "TRUNetDenoiser":
        from audio_denoising_tpu.models.trunet import TRUNetDenoiser
        return TRUNetDenoiser(num_bins or 257)
    raise ValueError(f"unknown arch {arch!r}")


__all__ = ["GRUUNet", "GRUUNet2", "MOMO", "MOMO2", "MOMO3", "UNet2d",
           "GRU", "TRUNet", "build_model"]
