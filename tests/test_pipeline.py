"""End-to-end pipeline parity against goldens captured from the reference
hot loops (tools/make_goldens.py: app2.py recv loop and server.py serve
loop replicated with executed reference models + torch-core DSP)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from audio_denoising_tpu.compat import load_params_npz
from audio_denoising_tpu.config import Config, DSPConfig, ModelConfig, ServingConfig
from audio_denoising_tpu.models import build_model
from audio_denoising_tpu.models.base import as_jnp
from audio_denoising_tpu import ops
from audio_denoising_tpu.pipeline import (
    make_server_step, make_webrtc_step, offline_denoise, webrtc_init_state,
)

HERE = os.path.dirname(__file__)
GOLD = os.path.join(HERE, "goldens")
CKPT = os.path.join(HERE, "..", "checkpoints")


def _load(name, num_bins):
    params, meta = load_params_npz(os.path.join(CKPT, name))
    cfg = ModelConfig.from_reference_dict(meta["arch"], meta["config"])
    return build_model(cfg, num_bins=num_bins), as_jnp(params)


class TestWebRTCPath:
    CFG = Config(dsp=DSPConfig(n_fft=1536, hop_length=768, n_mels=64,
                               reconstruction="griffin_lim"))

    def test_stagewise_lockstep_vs_golden(self):
        """Recompute the app2 hot loop stage by stage with our ops + model
        and compare every intermediate the golden recorded."""
        g = np.load(os.path.join(GOLD, "pipeline_webrtc_GRUUNet2-dari_tult.npz"))
        model, params = _load("gruunet2-dari_tult.npz", 64)
        dsp = self.CFG.dsp
        fb = ops.mel_filterbank(dsp.n_stft, dsp.n_mels, dsp.sample_rate)
        win = ops.hann_window(dsp.n_fft)

        audio = g["audio"]
        hx = model.init_state(1)
        for i in range(g["frames_in"].shape[0]):
            cur = audio[i * dsp.hop_length: i * dsp.hop_length + dsp.n_fft]
            peak = np.max(np.abs(cur))
            windowed = jnp.asarray(cur / peak) * win
            np.testing.assert_allclose(np.asarray(windowed), g["frames_in"][i],
                                       atol=1e-5)
            spec = ops.stft(windowed[None], dsp.n_fft, dsp.hop_length,
                            window=win)
            mel = jnp.log1p(ops.mel_scale(jnp.abs(spec), fb))
            x = jnp.swapaxes(mel, -1, -2)
            np.testing.assert_allclose(np.asarray(x[0]), g["mels"][i],
                                       atol=2e-3, rtol=1e-4)
            resid, hx = model.apply(params, x, hx)
            np.testing.assert_allclose(np.asarray(resid[0]), g["residuals"][i],
                                       atol=2e-3, rtol=1e-3)
            recon = jax.nn.leaky_relu(x - resid, negative_slope=0.2)
            mel_mag = jnp.maximum(jnp.expm1(jnp.swapaxes(recon, -1, -2)), 0)
            np.testing.assert_allclose(np.asarray(mel_mag[0]),
                                       g["recon_mags"][i],
                                       atol=5e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(hx), g["final_hx"],
                                   atol=1e-3, rtol=1e-3)

    def test_waveform_golden(self):
        """Output AUDIO of the full webrtc loop vs the executed-reference
        golden (inverse mel + GriffinLim-32 + peak de-norm + OLA,
        tools/make_goldens.golden_webrtc_waveform; deterministic ones
        phase init on both sides — torchaudio's default random init is
        irreproducible across frameworks). Tolerance: GL-32 doubly
        amplifies fp32 round-off at near-zero-magnitude bins (sign flips
        through upd/|upd|), so parity is asserted on waveform energy, not
        bitwise: per-hop SNR vs the golden must stay high."""
        g = np.load(os.path.join(
            GOLD, "pipeline_webrtc_waveform_GRUUNet2-dari_tult.npz"))
        model, params = _load("gruunet2-dari_tult.npz", 64)
        import dataclasses
        cfg = dataclasses.replace(
            self.CFG, dsp=dataclasses.replace(
                self.CFG.dsp, griffin_lim_iters=32,
                griffin_lim_warm_start=False))
        step = jax.jit(make_webrtc_step(cfg, model))
        from audio_denoising_tpu.pipeline import webrtc_init_state
        hop, n_fft = cfg.dsp.hop_length, cfg.dsp.n_fft
        audio = g["audio"]
        state = webrtc_init_state(cfg, model, 1)
        # the reference waits for a FULL window before the first model
        # step (app2.py:185); pre-seed the ring tail with the first hop
        # so our step j sees exactly the golden's window j
        state = state._replace(ring=state.ring.at[:, hop:].set(
            jnp.asarray(audio[None, :hop])))
        n_hops = g["out_hops"].shape[0]
        outs = []
        for j in range(n_hops):
            chunk = audio[(j + 1) * hop: (j + 2) * hop]
            state, out = step(params, state, jnp.asarray(chunk[None]))
            outs.append(np.asarray(out[0]))
        outs = np.stack(outs)
        ref = g["out_hops"]
        # hop 0 is the pre-fill zeros on both sides
        np.testing.assert_array_equal(outs[0], 0.0)
        np.testing.assert_array_equal(ref[0], 0.0)
        err = outs[1:] - ref[1:]
        snr = 10 * np.log10(
            (ref[1:] ** 2).sum() / max((err ** 2).sum(), 1e-20))
        assert snr > 25.0, f"waveform SNR vs reference golden: {snr:.1f} dB"
        # and the state trajectory stays locked hard
        np.testing.assert_allclose(
            np.asarray(state.hx), g["final_hx"].reshape(1, -1)
            if g["final_hx"].ndim != 3 else g["final_hx"], atol=2e-3)

    def test_hop_step_reaches_same_state(self):
        """Driving the jitted per-hop step over the same audio must land on
        the same hidden state (ring primed so window 0 matches)."""
        g = np.load(os.path.join(GOLD, "pipeline_webrtc_GRUUNet2-dari_tult.npz"))
        model, params = _load("gruunet2-dari_tult.npz", 64)
        dsp = self.CFG.dsp
        hop = dsp.hop_length
        audio = g["audio"]
        n_steps = g["frames_in"].shape[0]

        step = jax.jit(make_webrtc_step(self.CFG, model))
        state = webrtc_init_state(self.CFG, model, 1)
        # prime: ring = [zeros, audio[:hop]] so the first step sees window 0
        state = state._replace(ring=jnp.concatenate(
            [jnp.zeros((1, dsp.n_fft - hop)), jnp.asarray(audio[None, :hop])],
            axis=-1))
        outs = []
        for i in range(1, n_steps + 1):
            chunk = jnp.asarray(audio[None, i * hop:(i + 1) * hop])
            state, out = step(params, state, chunk)
            outs.append(np.asarray(out))
        np.testing.assert_allclose(np.asarray(state.hx), g["final_hx"],
                                   atol=1e-3, rtol=1e-3)
        y = np.concatenate(outs, axis=-1)
        assert y.shape == (1, n_steps * hop)
        assert np.isfinite(y).all()
        # after warmup the denoiser emits signal, not silence
        assert np.abs(y[:, 2 * hop:]).max() > 1e-3


class TestServerPath:
    CFG = Config(
        dsp=DSPConfig(n_fft=1024, hop_length=512, n_mels=64,
                      reconstruction="phase"),
        serving=ServingConfig(state_decay=0.9, output_gain=3.0),
    )

    def test_matches_golden(self):
        g = np.load(os.path.join(GOLD, "pipeline_server_GRUUNet2-good.npz"))
        model, params = _load("gruunet2-good.npz", 64)
        step = jax.jit(make_server_step(self.CFG, model))
        hx = model.init_state(1)
        hx, y = step(params, hx, jnp.asarray(g["x"][None]))
        np.testing.assert_allclose(np.asarray(hx), g["final_hx"],
                                   atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(y[0]), g["y"][0],
                                   atol=5e-3, rtol=1e-2)

    def test_stateful_across_chunks(self):
        model, params = _load("gruunet2-good.npz", 64)
        step = jax.jit(make_server_step(self.CFG, model))
        rng = np.random.default_rng(0)
        hx = model.init_state(2)
        for _ in range(3):
            chunk = jnp.asarray(rng.standard_normal((2, 4800)).astype(np.float32))
            hx2, y = step(params, hx, chunk)
            assert y.shape == (2, 4800)
            assert not np.allclose(np.asarray(hx2), np.asarray(hx))
            hx = hx2


class TestOffline:
    def test_offline_denoise_runs_and_preserves_shape(self):
        model, params = _load("gruunet2-dari_tult.npz", 64)
        cfg = Config(dsp=DSPConfig(n_fft=1536, hop_length=768, n_mels=64,
                                   reconstruction="phase"))
        rng = np.random.default_rng(1)
        audio = jnp.asarray(rng.standard_normal(48000).astype(np.float32) * 0.1)
        out = offline_denoise(cfg, model, params, audio)
        assert out.shape == audio.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_offline_griffin_lim_mode(self):
        model, params = _load("gruunet2-dari_tult.npz", 64)
        cfg = Config(dsp=DSPConfig(n_fft=1536, hop_length=768, n_mels=64,
                                   reconstruction="griffin_lim",
                                   griffin_lim_iters=4))
        rng = np.random.default_rng(2)
        audio = jnp.asarray(rng.standard_normal((2, 19200)).astype(np.float32) * 0.1)
        out = offline_denoise(cfg, model, params, audio)
        assert out.shape == audio.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_offline_raw_domain_momo3(self):
        """The MOMO3 checkpoint's own era: clamped RAW-spectrogram features
        (checkpoint last_target_name; utils.py:82-95) at its geometry-fixed
        22 bins — the offline chain must run through the raw/clamp domain
        (no mel pair) with the shipped weights."""
        from audio_denoising_tpu.hub import load_pretrained
        cfg, model, params = load_pretrained("momo3-4d4ea0")
        assert cfg.dsp.domain == "raw"
        assert cfg.dsp.n_stft == model.num_bins == 22
        rng = np.random.default_rng(7)
        audio = jnp.asarray(
            rng.standard_normal(4200).astype(np.float32) * 0.1)
        out = offline_denoise(cfg, model, params, audio)
        assert out.shape == audio.shape
        assert np.isfinite(np.asarray(out)).all()
        # raw domain round-trip sanity: an identity model (resid == 0)
        # through the same chain reconstructs the input (phase reuse +
        # log1p/expm1 are exact inverses without a mel projection)
        class _Id:
            num_bins = 22
            def init_state(self, b, dtype=jnp.float32):
                return jnp.zeros((b, 1), dtype)
            def apply(self, params, x, hx=None):
                return jnp.zeros_like(x), hx
        out_id = offline_denoise(cfg, _Id(), {}, audio)
        np.testing.assert_allclose(np.asarray(out_id), np.asarray(audio),
                                   atol=1e-4)

    def test_denoiser_actually_denoises(self):
        """A tone + noise mixture must come out closer (in mel log space) to
        the clean tone than the mixture was — the model's training target."""
        model, params = _load("gruunet2-dari_tult.npz", 64)
        cfg = Config(dsp=DSPConfig(n_fft=1536, hop_length=768, n_mels=64,
                                   reconstruction="phase"))
        sr = 48000
        t = np.arange(sr) / sr
        rng = np.random.default_rng(3)
        clean = (0.5 * np.sin(2 * np.pi * 400 * t)).astype(np.float32)
        noise = (0.15 * rng.standard_normal(sr)).astype(np.float32)
        mixture = np.clip(clean + noise, -1, 1)

        out = np.asarray(offline_denoise(cfg, model, params,
                                         jnp.asarray(mixture)))

        fb = ops.mel_filterbank(cfg.dsp.n_stft, cfg.dsp.n_mels, sr)
        win = ops.hann_window(cfg.dsp.n_fft)

        def logmel(a):
            s = ops.stft(jnp.asarray(a)[None], cfg.dsp.n_fft,
                         cfg.dsp.hop_length, window=win)
            return np.asarray(jnp.log1p(ops.mel_scale(jnp.abs(s), fb)))

        lm_clean, lm_mix, lm_out = logmel(clean), logmel(mixture), logmel(out)
        err_mix = np.abs(lm_mix - lm_clean).mean()
        err_out = np.abs(lm_out - lm_clean).mean()
        assert err_out < err_mix


class TestWarmGriffinLim:
    def test_warm_start_step_runs_and_carries_angles(self, rng=None):
        import dataclasses
        import numpy as np
        import jax
        import jax.numpy as jnp
        from audio_denoising_tpu.config import PRESETS
        from audio_denoising_tpu.models import build_model
        from audio_denoising_tpu.pipeline import (
            make_webrtc_step, webrtc_init_state)
        cfg = PRESETS["gruunet2-dari_tult"]
        cfg = dataclasses.replace(cfg, dsp=dataclasses.replace(
            cfg.dsp, griffin_lim_warm_start=True, griffin_lim_iters=4))
        model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
        params = model.init(jax.random.PRNGKey(0))
        step = jax.jit(make_webrtc_step(cfg, model))
        st = webrtc_init_state(cfg, model, 2)
        assert st.gl_angles is not None
        r = np.random.default_rng(0)
        for _ in range(3):
            chunk = jnp.asarray(
                0.1 * r.standard_normal((2, cfg.dsp.hop_length)),
                jnp.float32)
            st2, out = step(params, st, chunk)
            assert out.shape == (2, cfg.dsp.hop_length)
            assert np.all(np.isfinite(np.asarray(out)))
            # angles actually update
            assert not np.array_equal(np.asarray(st2.gl_angles),
                                      np.asarray(st.gl_angles))
            st = st2

    def test_warm_seed_improves_over_cold_at_equal_iters(self):
        """Streaming GL with carried+rotated phases beats a cold start at
        the same iteration count (spectral consistency)."""
        import numpy as np
        import jax.numpy as jnp
        from audio_denoising_tpu.ops import stft, hann_window
        from audio_denoising_tpu.ops.griffinlim import griffin_lim
        n_fft, hop = 1536, 768
        win = hann_window(n_fft)
        r = np.random.default_rng(0)
        t = np.arange(48000) / 48000.0
        sig = (0.5 * np.sin(2 * np.pi * 440 * t)
               + 0.3 * np.sin(2 * np.pi * 1270 * t + 1.0)
               + 0.05 * r.standard_normal(len(t))).astype(np.float32)
        F = n_fft // 2 + 1
        rot = jnp.exp(+2j * np.pi * jnp.arange(F) * hop / n_fft)[None, :, None]

        def err(mag, wave):
            S = jnp.abs(stft(wave, n_fft, hop, n_fft, window=win))
            T = min(S.shape[-1], mag.shape[-1])
            return float(jnp.linalg.norm(S[..., :T] - mag[..., :T])
                         / jnp.linalg.norm(mag[..., :T]))

        prev = None
        warm_errs, cold_errs = [], []
        for k in range(6, 16):
            seg = jnp.asarray(sig[None, k * hop: k * hop + n_fft])
            mag = jnp.abs(stft(seg * win, n_fft, hop, n_fft, window=win))
            cold = griffin_lim(mag, n_fft, hop, n_fft, window=win, n_iter=6)
            cold_errs.append(err(mag, cold))
            seed = None if prev is None else jnp.concatenate(
                [prev[..., 1:], prev[..., -1:] * rot], axis=-1)
            out, prev = griffin_lim(mag, n_fft, hop, n_fft, window=win,
                                    n_iter=6, init_angles=seed,
                                    return_angles=True)
            warm_errs.append(err(mag, out))
        assert np.mean(warm_errs[-5:]) < np.mean(cold_errs[-5:])
