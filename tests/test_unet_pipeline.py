"""Stateless U-Net offline pipeline (BASELINE config 3: unet4 on the same
STFT front-end, no recurrence)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_denoising_tpu.config import PRESETS
from audio_denoising_tpu.models import build_model
from audio_denoising_tpu.pipeline import offline_denoise_stateless


@pytest.fixture(scope="module")
def unet():
    cfg = PRESETS["unet4-raw480"]
    model = build_model(cfg.model, num_bins=cfg.dsp.n_stft)
    params = model.init(jax.random.PRNGKey(0))
    return cfg, model, params


class TestCompatibleFrames:
    def test_golden_shape_is_compatible(self, unet):
        _cfg, model, _p = unet
        assert model.compatible_frames(91) == 91

    def test_padding_search(self, unet):
        _cfg, model, _p = unet
        t = model.compatible_frames(60)
        assert t >= 60
        assert model.compatible_frames(t) == t

    def test_incompatible_raises(self, unet):
        _cfg, model, _p = unet
        with pytest.raises(ValueError):
            model.compatible_frames(10, max_extra=2)


class TestOfflineStateless:
    def test_shapes_and_finite(self, unet, rng):
        cfg, model, params = unet
        audio = jnp.asarray(0.1 * rng.standard_normal(24000), jnp.float32)
        out = offline_denoise_stateless(cfg, model, params, audio)
        assert out.shape == (24000,)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_batched(self, unet, rng):
        cfg, model, params = unet
        audio = jnp.asarray(0.1 * rng.standard_normal((2, 12000)),
                            jnp.float32)
        out = offline_denoise_stateless(cfg, model, params, audio)
        assert out.shape == (2, 12000)

    def test_zero_residual_is_near_identity(self, unet, rng):
        """With a zero-output model the pipeline reduces to
        STFT -> log1p -> expm1 -> iSTFT == identity (COLA window)."""
        cfg, model, params = unet

        class ZeroModel:
            bins = model.bins
            compatible_frames = model.compatible_frames

            def apply(self, params, x):
                return jnp.zeros_like(x)

        audio = jnp.asarray(0.05 * rng.standard_normal(24000), jnp.float32)
        out = offline_denoise_stateless(cfg, ZeroModel(), None, audio)
        # mid region (edges lose window overlap)
        a, b = 2000, 22000
        np.testing.assert_allclose(np.asarray(out[a:b]),
                                   np.asarray(audio[a:b]), atol=5e-3)
