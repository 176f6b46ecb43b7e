"""Training (the L4 layer): optax AdamW + exponential decay, residual-MSE
objective on mixture-synthesized batches — the contract reconstructed from
the reference's TrainingContext + checkpoint metadata (SURVEY §3.5; the
actual loop lived in the repo's missing main.ipynb)."""

from audio_denoising_tpu.train.context import TrainingContext, TrainState
from audio_denoising_tpu.train.data import MixtureSampler
from audio_denoising_tpu.train.losses import mse, mae

__all__ = ["TrainingContext", "TrainState", "MixtureSampler", "mse", "mae"]
