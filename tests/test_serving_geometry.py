"""Streaming-geometry plumbing: the round-5 frontier knobs
(``unet_seg_hops`` / ``unet_ctx_samples`` / ``unet_xfade_samples`` /
``unet_ctx_left_samples``) must be expressible on EVERY serving surface
— `eval --streamed` (covered in test_unet_pipeline.py), the engine
daemon, the WS daemon and the offline CLI — through the one shared
helper ``config.with_unet_geometry``. No reference counterpart (the
reference never streams the segment models, unet4.py:147-194)."""

import dataclasses
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_denoising_tpu.config import (PRESETS, ServingConfig,
                                        recommended_streaming_geometry,
                                        with_unet_geometry)
from audio_denoising_tpu.models import build_model


@pytest.fixture(scope="module")
def unet_ckpt(tmp_path_factory):
    from audio_denoising_tpu.compat.npz_store import save_params_npz
    cfg = PRESETS["unet4-raw480"]
    model = build_model(cfg.model, num_bins=cfg.dsp.n_stft)
    params = {k: np.asarray(v)
              for k, v in model.init(jax.random.PRNGKey(0)).items()}
    path = str(tmp_path_factory.mktemp("geom") / "unet.npz")
    save_params_npz(path, params,
                    {"full_config": json.loads(cfg.to_json())})
    return path, cfg, model, params


def test_with_unet_geometry_noop():
    cfg = PRESETS["unet4-raw480"]
    assert with_unet_geometry(cfg) is cfg


def test_with_unet_geometry_overrides():
    cfg = with_unet_geometry(PRESETS["unet4-raw480"], seg_hops=8,
                             ctx=960, xfade=384, ctx_left=41472)
    assert cfg.serving.unet_seg_hops == 8
    assert cfg.serving.unet_ctx_samples == 960
    assert cfg.serving.unet_xfade_samples == 384
    assert cfg.serving.unet_ctx_left_samples == 41472


def test_with_unet_geometry_partial_keeps_checkpoint_values():
    base = PRESETS["unet4-raw480"]
    cfg = with_unet_geometry(base, xfade=384)
    assert cfg.serving.unet_xfade_samples == 384
    assert cfg.serving.unet_seg_hops == base.serving.unet_seg_hops
    assert cfg.serving.unet_ctx_samples == base.serving.unet_ctx_samples


def test_engine_daemon_geometry_flags(unet_ckpt):
    from audio_denoising_tpu.apps.engine_serve import EngineDaemon
    path, cfg, _model, _params = unet_ckpt
    d = EngineDaemon(path, max_streams=2, mode="unet",
                     unet_seg_hops=4, unet_ctx=480, unet_xfade=192,
                     unet_ctx_left=960)
    try:
        srv = d.cfg.serving
        assert (srv.unet_seg_hops, srv.unet_ctx_samples,
                srv.unet_xfade_samples, srv.unet_ctx_left_samples) == \
            (4, 480, 192, 960)
        # latency accounting reflects the OVERRIDDEN geometry, not the
        # checkpoint default (ctx_left/xfade stay latency-free)
        assert (d.engine.algorithmic_latency_samples
                == 4 * cfg.dsp.hop_length + 480)
    finally:
        d.tick.stop()


def test_ws_daemon_mode_unet_geometry(unet_ckpt):
    from audio_denoising_tpu.apps.ws_serve import WSDaemon
    path, cfg, _model, _params = unet_ckpt
    d = WSDaemon(path, port=0, max_streams=2, mode="unet",
                 unet_seg_hops=4, unet_ctx=480, unet_xfade=192)
    try:
        assert d.cfg.serving.unet_seg_hops == 4
        assert d.cfg.serving.unet_xfade_samples == 192
        assert (d.engine.algorithmic_latency_samples
                == 4 * cfg.dsp.hop_length + 480)
    finally:
        d.tick.stop()


class TestOfflineStreamed:
    def test_streamed_matches_pipeline(self, unet_ckpt, rng):
        """denoise_array(streamed=True) == pipeline.offline_denoise_streamed
        with the override geometry, modulo the chain's peak
        normalization (compared pre-quantization — a random-weight unet
        amplifies past the int16 WAV range)."""
        from audio_denoising_tpu.apps.offline import denoise_array
        from audio_denoising_tpu.pipeline import offline_denoise_streamed
        _path, cfg, model, params = unet_ckpt

        x = (0.1 * rng.standard_normal(12000)).astype(np.float32)
        cfg2 = with_unet_geometry(cfg, seg_hops=4, ctx=480, xfade=192)
        got = denoise_array(cfg2, model, params, x, cfg.dsp.sample_rate,
                            streamed=True)
        peak = float(np.max(np.abs(x)))
        with jax.default_matmul_precision("float32"):
            want = np.asarray(offline_denoise_streamed(
                cfg2, model, params, jnp.asarray(x / peak))) * peak
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)

    def test_streamed_differs_from_whole_clip(self, unet_ckpt, rng):
        """The bounded-latency chain is a DIFFERENT function from the
        whole-clip window (it must actually be exercised by the flag)."""
        from audio_denoising_tpu.apps.offline import denoise_array
        _path, cfg, model, params = unet_ckpt
        x = (0.1 * rng.standard_normal(12000)).astype(np.float32)
        cfg2 = with_unet_geometry(cfg, seg_hops=4, ctx=480)
        a = denoise_array(cfg2, model, params, x, cfg.dsp.sample_rate,
                          streamed=True)
        b = denoise_array(cfg2, model, params, x, cfg.dsp.sample_rate)
        assert a.shape == b.shape
        assert not np.allclose(a, b, atol=1e-4)

    def test_denoise_file_streamed_plumbing(self, unet_ckpt, tmp_path,
                                            monkeypatch, rng):
        """The CLI surface: denoise_file forwards --streamed and the
        geometry flags into the chain config (spied at denoise_array,
        the WAV itself would clip a random-weight model's output)."""
        from audio_denoising_tpu.apps import offline
        from audio_denoising_tpu.io.wavio import write_wav
        path, cfg, _model, _params = unet_ckpt
        wav_in = str(tmp_path / "in.wav")
        write_wav(wav_in,
                  (0.1 * rng.standard_normal((1, 6000))).astype(np.float32),
                  cfg.dsp.sample_rate)
        seen = {}
        real = offline.denoise_array

        def spy(c, model, params, samples, sr, streamed=False):
            seen["streamed"] = streamed
            seen["srv"] = c.serving
            return real(c, model, params, samples, sr, streamed=streamed)

        monkeypatch.setattr(offline, "denoise_array", spy)
        offline.denoise_file(path, wav_in, str(tmp_path / "out.wav"),
                             streamed=True, unet_seg_hops=4, unet_ctx=480,
                             unet_xfade=192, unet_ctx_left=960)
        assert seen["streamed"] is True
        assert seen["srv"].unet_seg_hops == 4
        assert seen["srv"].unet_ctx_samples == 480
        assert seen["srv"].unet_xfade_samples == 192
        assert seen["srv"].unet_ctx_left_samples == 960

    def test_streamed_zero_flags_serves_recommended(self, unet_ckpt,
                                                    tmp_path, monkeypatch,
                                                    rng):
        """denoise --streamed with NO geometry flags runs the measured-
        best bounded-latency window (recommended_streaming_geometry);
        --no-snr-gate (auto_gate=False) keeps the class defaults."""
        from audio_denoising_tpu.apps import offline
        from audio_denoising_tpu.io.wavio import write_wav
        path, cfg, _model, _params = unet_ckpt
        wav_in = str(tmp_path / "in.wav")
        write_wav(wav_in,
                  (0.01 * rng.standard_normal((1, 6000))).astype(np.float32),
                  cfg.dsp.sample_rate)
        seen = {}

        def spy(c, model, params, samples, sr, streamed=False):
            seen["srv"] = c.serving
            return np.zeros(6000, np.float32)

        monkeypatch.setattr(offline, "denoise_array", spy)
        offline.denoise_file(path, wav_in, str(tmp_path / "out.wav"),
                             streamed=True)
        srv = seen["srv"]
        assert (srv.unet_seg_hops, srv.unet_ctx_samples,
                srv.unet_xfade_samples, srv.unet_ctx_left_samples) == \
            (8, 960, 384, 44544)
        offline.denoise_file(path, wav_in, str(tmp_path / "out2.wav"),
                             streamed=True, auto_gate=False)
        d = ServingConfig()
        assert seen["srv"].unet_seg_hops == d.unet_seg_hops
        assert seen["srv"].unet_ctx_left_samples is None

    def test_streamed_rejects_recurrent(self, tmp_path):
        from audio_denoising_tpu.apps.offline import denoise_file
        from audio_denoising_tpu.compat.npz_store import save_params_npz
        from audio_denoising_tpu.config import (Config, DSPConfig,
                                                ModelConfig, ServingConfig)
        cfg = Config(
            dsp=DSPConfig(sample_rate=16000, n_fft=256, hop_length=128,
                          n_mels=32, domain="mel", reconstruction="phase"),
            model=ModelConfig(arch="GRUUNet2", hidden_sizes=(6, 6, 6),
                              kernel_sizes=(3, 3, 3), strides=(2, 2, 2),
                              paddings=(1, 1, 1), num_compressed_bins=4),
            serving=ServingConfig(chunk_samples=128),
        )
        model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
        params = {k: np.asarray(v)
                  for k, v in model.init(jax.random.PRNGKey(0)).items()}
        path = str(tmp_path / "rnn.npz")
        save_params_npz(path, params,
                        {"full_config": json.loads(cfg.to_json())})
        with pytest.raises(ValueError, match="streamed"):
            denoise_file(path, "x.wav", "y.wav", streamed=True)


# -- recommended streaming geometry (round-5 frontier default) ---------------

class TestRecommendedGeometry:
    def test_tuned_point_at_flagship_basis(self):
        """48 kHz / hop 384 (the basis the frontier was measured on):
        the function must reproduce the measured-best point exactly —
        seg 8 hops / ctx 960 / ctx_left 44544 / xfade 384 = 84 ms
        latency at offline SI-SDR parity (docs/BENCHMARKS.md)."""
        srv = recommended_streaming_geometry(PRESETS["unet4-raw480"]).serving
        assert (srv.unet_seg_hops, srv.unet_ctx_samples,
                srv.unet_xfade_samples, srv.unet_ctx_left_samples) == \
            (8, 960, 384, 44544)

    def test_scales_by_time_to_other_bases(self):
        base = PRESETS["unet4-raw480"]
        cfg = dataclasses.replace(base, dsp=dataclasses.replace(
            base.dsp, sample_rate=16000, n_fft=256, hop_length=128))
        srv = recommended_streaming_geometry(cfg).serving
        assert srv.unet_seg_hops == 8           # 64 ms of 8 ms hops
        assert srv.unet_ctx_samples == 320      # 20 ms
        assert srv.unet_xfade_samples == 128    # 8 ms
        assert srv.unet_ctx_left_samples == 14848   # ~1 s window, whole hops
        assert srv.unet_ctx_left_samples % 128 == 0

    def test_noop_on_causal_arch(self):
        cfg = PRESETS["gruunet2-good"]
        assert recommended_streaming_geometry(cfg) is cfg

    def test_noop_on_trunet(self):
        """TRUNet streams through mode 'unet' but its window behavior was
        never swept — it keeps the class defaults."""
        cfg = PRESETS["trunet16k"]
        assert recommended_streaming_geometry(cfg) is cfg

    def test_noop_when_any_field_overridden(self):
        cfg = with_unet_geometry(PRESETS["unet4-raw480"], seg_hops=4)
        assert recommended_streaming_geometry(cfg) is cfg


class TestZeroFlagDaemons:
    def test_engine_daemon_mode_unet_serves_recommended(self, unet_ckpt):
        from audio_denoising_tpu.apps.engine_serve import EngineDaemon
        path, cfg, _model, _params = unet_ckpt
        d = EngineDaemon(path, max_streams=2, mode="unet")
        try:
            srv = d.cfg.serving
            assert (srv.unet_seg_hops, srv.unet_ctx_samples,
                    srv.unet_xfade_samples, srv.unet_ctx_left_samples) == \
                (8, 960, 384, 44544)
            # latency accounting: seg + future ctx only (84 ms at 48 kHz)
            assert d.engine.algorithmic_latency_samples == 8 * 384 + 960
        finally:
            d.tick.stop()

    def test_engine_daemon_raw_profile_opt_out(self, unet_ckpt):
        from audio_denoising_tpu.apps.engine_serve import EngineDaemon
        path, _cfg, _model, _params = unet_ckpt
        d = EngineDaemon(path, max_streams=2, mode="unet", auto_gate=False)
        try:
            dflt = ServingConfig()
            assert d.cfg.serving.unet_seg_hops == dflt.unet_seg_hops
            assert d.cfg.serving.unet_ctx_left_samples is None
            assert d.cfg.serving.unet_xfade_samples == 0
        finally:
            d.tick.stop()

    def test_engine_daemon_explicit_flag_opts_out(self, unet_ckpt):
        """ANY geometry flag makes the user's geometry authoritative —
        the untouched fields keep their class defaults, not the
        recommended values."""
        from audio_denoising_tpu.apps.engine_serve import EngineDaemon
        path, _cfg, _model, _params = unet_ckpt
        d = EngineDaemon(path, max_streams=2, mode="unet", unet_seg_hops=4)
        try:
            assert d.cfg.serving.unet_seg_hops == 4
            assert d.cfg.serving.unet_ctx_left_samples is None
        finally:
            d.tick.stop()

    def test_ws_daemon_mode_unet_serves_recommended(self, unet_ckpt):
        from audio_denoising_tpu.apps.ws_serve import WSDaemon
        path, _cfg, _model, _params = unet_ckpt
        d = WSDaemon(path, port=0, max_streams=2, mode="unet")
        try:
            assert d.cfg.serving.unet_ctx_left_samples == 44544
            assert d.cfg.serving.unet_seg_hops == 8
        finally:
            d.tick.stop()


def test_hub_resets_embedded_geometry(tmp_path):
    """Streamed-window geometry is a deployment property: a checkpoint
    saved under a custom/stale geometry era must load with the current
    class defaults (so recommended_streaming_geometry applies), same
    migration rule as the gate fields (hub._reresolve_serving)."""
    from audio_denoising_tpu.compat.npz_store import save_params_npz
    from audio_denoising_tpu.hub import load_pretrained
    from audio_denoising_tpu.models import build_model
    cfg = with_unet_geometry(PRESETS["unet4-raw480"], seg_hops=4,
                             ctx=480, xfade=192, ctx_left=960)
    model = build_model(cfg.model, num_bins=cfg.dsp.n_stft)
    params = {k: np.asarray(v)
              for k, v in model.init(jax.random.PRNGKey(0)).items()}
    path = str(tmp_path / "stale_geom.npz")
    save_params_npz(path, params,
                    {"full_config": json.loads(cfg.to_json())})
    loaded, _m, _p = load_pretrained(path)
    d = ServingConfig()
    assert loaded.serving.unet_seg_hops == d.unet_seg_hops
    assert loaded.serving.unet_ctx_samples == d.unet_ctx_samples
    assert loaded.serving.unet_xfade_samples == d.unet_xfade_samples
    assert loaded.serving.unet_ctx_left_samples is None
