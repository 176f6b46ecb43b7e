"""Interop with the reference's artifacts: torch ``.pth`` checkpoints
(app.py:43-91 dict format) and ONNX cell exports (momo2_01/02.onnx)."""

from audio_denoising_tpu.compat.torch_loader import (
    load_torch_checkpoint, load_torch_pickle, state_dict_to_params,
)
from audio_denoising_tpu.compat.npz_store import save_params_npz, load_params_npz

__all__ = [
    "load_torch_checkpoint", "load_torch_pickle", "state_dict_to_params",
    "save_params_npz", "load_params_npz",
]
