"""Evaluation subsystem tests: metric correctness + the eval harness."""

import numpy as np
import jax.numpy as jnp

from audio_denoising_tpu.train.eval_metrics import (
    log_spectral_distance, si_sdr_db, snr_db)


class TestMetrics:
    def test_snr_perfect_and_noisy(self, rng):
        clean = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32)
        assert float(snr_db(clean, clean).min()) > 70
        noisy = clean + 0.1 * jnp.asarray(
            rng.standard_normal((2, 4000)), jnp.float32)
        v = snr_db(clean, noisy)
        assert 15 < float(v.mean()) < 25    # 10*log10(1/0.01) = 20 dB

    def test_si_sdr_scale_invariant(self, rng):
        clean = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32)
        est = clean + 0.05 * jnp.asarray(
            rng.standard_normal((2, 4000)), jnp.float32)
        a = si_sdr_db(clean, est)
        b = si_sdr_db(clean, 3.0 * est)     # reference's x3 output gain
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.05)
        # plain SNR is NOT invariant
        assert abs(float(snr_db(clean, est).mean()
                         - snr_db(clean, 3.0 * est).mean())) > 3

    def test_lsd_zero_on_identity(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8000)), jnp.float32)
        assert float(log_spectral_distance(x, x).max()) < 1e-5
        y = x + 0.5 * jnp.asarray(rng.standard_normal((1, 8000)),
                                  jnp.float32)
        assert float(log_spectral_distance(x, y).mean()) > 0.1


class TestEvaluateHarness:
    def test_evaluate_reports_all_fields(self, tmp_path, rng):
        from audio_denoising_tpu.io.wavio import write_wav
        from audio_denoising_tpu.apps.evaluate import evaluate
        t = np.arange(96000) / 48000.0
        for i in range(3):
            sig = 0.4 * np.sin(2 * np.pi * (300 + 100 * i) * t)
            write_wav(str(tmp_path / f"c{i}.wav"),
                      sig[None].astype(np.float32), 48000)
        rep = evaluate("gruunet2-good", str(tmp_path), n_examples=2,
                       crop_seconds=1.0, noise_gain=0.3)
        for k in ("input_si_sdr_db", "output_si_sdr_db",
                  "si_sdr_improvement_db", "input_lsd", "output_lsd"):
            assert k in rep
        assert np.isfinite(rep["si_sdr_improvement_db"])

    def test_evaluate_with_real_noise_dir_and_gl(self, tmp_path, rng):
        """noise_dir feeds a decodable corpus (here a synthesized webm via
        the in-test muxer) and --reconstruction overrides the back-end;
        the report names the noise source and carries the level-matched
        metrics."""
        import pytest
        from audio_denoising_tpu.io.codec import opus_available
        if not opus_available():
            pytest.skip("libopus absent")
        from test_codec import _mux_webm, _opus_encode
        from audio_denoising_tpu.io.wavio import write_wav
        from audio_denoising_tpu.apps.evaluate import evaluate

        t = np.arange(96000) / 48000.0
        for i in range(2):
            sig = 0.4 * np.sin(2 * np.pi * (300 + 150 * i) * t)
            write_wav(str(tmp_path / f"c{i}.wav"),
                      sig[None].astype(np.float32), 48000)
        ndir = tmp_path / "realnoise"
        ndir.mkdir()
        noise = (0.1 * rng.standard_normal(48000)).astype(np.float32)
        pkts, preskip = _opus_encode(noise, 48000)
        (ndir / "n.webm").write_bytes(_mux_webm(pkts, preskip, channels=1))

        rep = evaluate("gruunet2-good", str(tmp_path), n_examples=2,
                       crop_seconds=1.0, noise_gain=1.0,
                       noise_dir=str(ndir), reconstruction="griffin_lim",
                       gl_iters=4)
        assert rep["noise_source"] == "realnoise"
        assert rep["reconstruction"] == "griffin_lim"
        for k in ("output_snr_matched_db", "output_lsd_matched"):
            assert np.isfinite(rep[k])
