"""Teacher-student distillation (round 5, VERDICT r4 #5).

``TrainConfig.distill_from`` swaps the training target from the clean
crop to the TEACHER checkpoint's denoised output on each mixture
(train/distill.py) — on both the host and the device-resident data
paths. These tests lock the plumbing: the teacher actually changes the
objective, its params ride as jit arguments, the config round-trips
through checkpoints (so segmented --resume keeps distilling), and rate
mismatches fail loudly.

No reference counterpart: the reference trains against clean targets
only (TrainingContext contract, server.py:86-142).
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from audio_denoising_tpu.config import Config, DSPConfig, ModelConfig, TrainConfig
from audio_denoising_tpu.models import build_model
from audio_denoising_tpu.train.context import TrainingContext


def _teacher_ckpt(tmp_path):
    """A tiny stateless U-Net teacher checkpoint at 48 kHz."""
    from audio_denoising_tpu.config import PRESETS
    cfg = PRESETS["unet4-raw480"]
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, batch_size=2, crop_samples=6000))
    model = build_model(cfg.model, num_bins=cfg.dsp.n_stft)
    ctx = TrainingContext(cfg, model, seed=1)
    path = str(tmp_path / "teacher.npz")
    ctx.save(path)
    return path


def _student_cfg(teacher_path, crop=6000):
    return Config(
        dsp=DSPConfig(sample_rate=48000, n_fft=256, hop_length=128,
                      n_mels=32, domain="mel", reconstruction="phase"),
        model=ModelConfig(arch="GRUUNet2", hidden_sizes=(6, 6, 6),
                          kernel_sizes=(3, 3, 3), strides=(2, 2, 2),
                          paddings=(1, 1, 1), num_compressed_bins=4),
        train=TrainConfig(batch_size=2, crop_samples=crop,
                          objective="recon_mrstft",
                          distill_from=teacher_path),
    )


def test_load_teacher_runs_and_gates_off(tmp_path, rng):
    from audio_denoising_tpu.train.distill import load_teacher
    path = _teacher_ckpt(tmp_path)
    tp, fn = load_teacher(path, _student_cfg(path))
    wave = jnp.asarray(rng.standard_normal((2, 6000)).astype(np.float32)
                       * 0.3)
    out = fn(tp, wave)
    assert out.shape == wave.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_distill_changes_the_objective_host_path(tmp_path, rng):
    """Same params, same batch: the distilled loss must differ from the
    clean-target loss (catches a silently ignored teacher), and one
    distilled step must execute and record."""
    path = _teacher_ckpt(tmp_path)
    cfg_d = _student_cfg(path)
    cfg_0 = dataclasses.replace(cfg_d, train=dataclasses.replace(
        cfg_d.train, distill_from=None))
    model = build_model(cfg_d.model, num_bins=cfg_d.dsp.n_mels)
    mixture = (0.3 * rng.standard_normal((2, 6000))).astype(np.float32)
    clean = mixture * 0.5
    ctx_d = TrainingContext(cfg_d, model, seed=0)
    ctx_0 = TrainingContext(cfg_0, model, seed=0)
    l_d = ctx_d.train_step(mixture, clean)
    l_0 = ctx_0.train_step(mixture, clean)
    assert np.isfinite(l_d) and np.isfinite(l_0)
    assert abs(l_d - l_0) > 1e-9


def test_distill_device_path(tmp_path, rng):
    """fit_on_device with a teacher: the teacher's params ride as jit
    arguments inside the scanned dispatch; losses stay finite and differ
    from the clean-target run under identical sampling seeds."""
    from audio_denoising_tpu.train.device_data import DeviceCorpus
    path = _teacher_ckpt(tmp_path)
    cfg_d = _student_cfg(path)
    cfg_0 = dataclasses.replace(cfg_d, train=dataclasses.replace(
        cfg_d.train, distill_from=None))
    model = build_model(cfg_d.model, num_bins=cfg_d.dsp.n_mels)
    buf = jnp.asarray((0.3 * rng.standard_normal(30000)).astype(np.float32))
    corpus = DeviceCorpus(buf, 48000)
    rec_d = TrainingContext(cfg_d, model, seed=0).fit_on_device(
        corpus, iters=2, steps_per_dispatch=2, seed=7)
    rec_0 = TrainingContext(cfg_0, model, seed=0).fit_on_device(
        corpus, iters=2, steps_per_dispatch=2, seed=7)
    assert all(np.isfinite(v) for v in rec_d.values())
    assert abs(rec_d[1] - rec_0[1]) > 1e-9


def test_distill_from_round_trips_checkpoint(tmp_path, rng):
    """A distilled student's checkpoint carries distill_from in
    full_config, so segmented --resume rebuilds the teacher (the round-4
    resume-rebuilds-config contract)."""
    from audio_denoising_tpu.hub import load_pretrained
    path = _teacher_ckpt(tmp_path)
    cfg = _student_cfg(path)
    model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
    ctx = TrainingContext(cfg, model, seed=0)
    mixture = (0.3 * rng.standard_normal((2, 6000))).astype(np.float32)
    ctx.train_step(mixture, mixture * 0.5)
    out = str(tmp_path / "student.npz")
    ctx.save(out)
    cfg2, model2, _ = load_pretrained(out)
    assert cfg2.train.distill_from == path
    ctx2 = TrainingContext.load(out, cfg2, model2)
    assert ctx2._teacher is not None


def test_distill_rate_mismatch_raises(tmp_path):
    path = _teacher_ckpt(tmp_path)          # 48 kHz teacher
    cfg = _student_cfg(path)
    cfg = dataclasses.replace(cfg, dsp=dataclasses.replace(
        cfg.dsp, sample_rate=16000))
    model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
    with pytest.raises(ValueError, match="Hz"):
        TrainingContext(cfg, model)
