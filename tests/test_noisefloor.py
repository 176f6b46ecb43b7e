"""SNR gate (round 4): noise-floor tracker units + pipeline blend
semantics. Rationale: every causal checkpoint DAMAGES near-clean input
(manifest v2, −3.2 dB ΔSI-SDR at +10 dB input SNR); the gate blends the
output toward passthrough when the estimated input SNR is high."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from audio_denoising_tpu.ops.noisefloor import (
    floor_rise_per_frame, gate_alpha, noise_floor_scan,
    smooth_beta_per_frame, snr_db_from_floor)


class TestNoiseFloor:
    def test_floor_locks_to_steady_noise(self, rng):
        """On stationary noise the tracked floor converges near the noise
        power (EMA smoothing + bias compensation bound the min-statistics
        underestimate), so the SNR estimate sits near 0 dB."""
        f, t = 16, 400
        power = jnp.asarray(
            0.01 * rng.chisquare(2, (1, f, t)).astype(np.float32))
        floors, totals, last = noise_floor_scan(power, rise=1.02,
                                                beta=0.9, beta_tot=0.98)
        snr = snr_db_from_floor(totals, jnp.mean(floors, axis=-2))
        assert float(jnp.mean(snr[:, t // 2:])) < 3.0
        assert last.floor.shape == (1, f)
        assert last.total.shape == (1,)
        # streaming continuation: scanning the second half from the
        # carried state matches the full scan exactly
        fl_a, _to, st = noise_floor_scan(power[..., :200], rise=1.02,
                                         beta=0.9, beta_tot=0.98)
        fl_b, _tb, _ = noise_floor_scan(power[..., 200:], rise=1.02,
                                        beta=0.9, beta_tot=0.98, init=st)
        np.testing.assert_array_equal(
            np.asarray(jnp.concatenate([fl_a, fl_b], -1)),
            np.asarray(floors))

    def test_stream_level_snr_separates_clean_from_noisy(self, rng):
        """The ENERGY-WEIGHTED stream SNR (long total EMA over floor)
        distinguishes a clean bursty stream from a noisy one — the
        per-frame estimate cannot (a loud vocal frame is high-SNR even
        in a noisy stream; the first gate sweep measured exactly that
        failure on the -5 dB bracket)."""
        f, t = 16, 600
        burst = np.zeros((1, f, t), np.float32)
        for start in range(0, t, 120):
            burst[:, :6, start:start + 40] = 1.0   # ~1/3 duty vocals
        noise_hi = 0.3 * rng.chisquare(2, (1, f, t)).astype(np.float32)
        noise_lo = 0.003 * rng.chisquare(2, (1, f, t)).astype(np.float32)
        snrs = {}
        for name, noise in (("noisy", noise_hi), ("clean", noise_lo)):
            power = jnp.asarray(burst + noise)
            floors, totals, _ = noise_floor_scan(
                power, rise=1.02, beta=0.9, beta_tot=0.98)
            snrs[name] = float(np.asarray(snr_db_from_floor(
                totals, jnp.mean(floors, axis=-2)))[0, -1])
        assert snrs["clean"] > snrs["noisy"] + 10.0
        assert snrs["noisy"] < 8.0

    def test_rise_rate_and_alpha_direction(self):
        r = floor_rise_per_frame(512, 16000, double_seconds=1.0)
        assert 1.0 < r < 1.1
        assert abs(r ** (16000 / 512) - 2.0) < 1e-6
        b = smooth_beta_per_frame(512, 16000, tau_seconds=0.1)
        assert 0.5 < b < 1.0
        a = np.asarray(gate_alpha(jnp.asarray([-10.0, 8.0, 30.0]),
                                  gate_db=8.0, width_db=3.0))
        assert a[0] > 0.99          # very noisy -> denoise
        assert abs(a[1] - 0.5) < 1e-6
        assert a[2] < 0.01          # very clean -> passthrough


class TestPipelineGate:
    def _setup(self):
        from audio_denoising_tpu.hub import load_pretrained
        return load_pretrained("gruunet2-good")

    def test_gate_off_is_bit_identical(self, rng):
        """snr_gate_db=None must not change round-3 outputs at all."""
        from audio_denoising_tpu.pipeline import offline_denoise
        cfg, model, params = self._setup()
        audio = jnp.asarray(0.2 * rng.standard_normal((1, 16000)),
                            jnp.float32)
        base = offline_denoise(cfg, model, params, audio)
        again = offline_denoise(cfg, model, params, audio)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(again))

    def test_gate_low_threshold_passes_clean_through(self, rng):
        """With a very low gate every frame looks 'clean enough' ->
        output ~= input; with a very high gate -> output ~= the denoised
        baseline. Uses a tonal input (clean-ish) so the SNR estimate is
        high."""
        from audio_denoising_tpu.pipeline import offline_denoise
        cfg, model, params = self._setup()
        t = np.arange(24000) / 48000.0
        audio = jnp.asarray(
            (0.4 * np.sin(2 * np.pi * 400 * t)
             + 0.002 * rng.standard_normal(t.size))[None], jnp.float32)
        base = np.asarray(offline_denoise(cfg, model, params, audio))

        low = dataclasses.replace(cfg, serving=dataclasses.replace(
            cfg.serving, snr_gate_db=-60.0, snr_gate_width_db=1.0,
            snr_gate_estimator="removed"))
        out_pass = np.asarray(offline_denoise(low, model, params, audio))
        high = dataclasses.replace(cfg, serving=dataclasses.replace(
            cfg.serving, snr_gate_db=200.0, snr_gate_width_db=1.0))
        out_den = np.asarray(offline_denoise(high, model, params, audio))

        a = np.asarray(audio)
        err_pass = np.abs(out_pass - a).mean()
        err_base = np.abs(base - a).mean()
        assert err_pass < 0.1 * err_base     # passthrough ~= input
        np.testing.assert_allclose(out_den, base, atol=1e-5)

    def test_gate_in_engine_fast_mode(self, rng):
        """The gate carries per-stream noise-floor state through the
        engine's fast step: a forced-passthrough gate reproduces the
        input (WOLA-delayed), and the gate-off engine still matches the
        round-3 state layout semantics (None leaves)."""
        import dataclasses
        from audio_denoising_tpu.hub import load_pretrained
        from audio_denoising_tpu.runtime.engine import StreamEngine
        cfg0, model, params = load_pretrained("gruunet2-good")
        cfg = dataclasses.replace(cfg0, serving=dataclasses.replace(
            cfg0.serving, snr_gate_db=-60.0, snr_gate_width_db=1.0,
            snr_gate_estimator="removed"))
        eng = StreamEngine(cfg, model, params, mode="fast", max_streams=2)
        assert eng.state.em_out is not None      # pinned 'removed' above
        assert eng.state.nf_floor is None
        # default estimator 'both' carries BOTH state sets
        cfgb = dataclasses.replace(cfg0, serving=dataclasses.replace(
            cfg0.serving, snr_gate_db=1.0))
        engb = StreamEngine(cfgb, model, params, mode="fast",
                            max_streams=2)
        assert engb.state.em_out is not None
        assert engb.state.nf_floor is not None
        hop = cfg.dsp.hop_length
        n_over = cfg.dsp.n_fft // hop
        eng.add_stream("s")
        t = np.arange(hop * 8) / cfg.dsp.sample_rate
        sig = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        outs = [eng.process({"s": sig[i * hop:(i + 1) * hop]})["s"]
                for i in range(8)]
        got = np.concatenate(outs)
        # full passthrough: output is the input delayed by the analysis/
        # synthesis pipeline (ring fill + OLA), so correlate at the known
        # WOLA delay of (n_over - 1) hops
        delay = (n_over - 1) * hop
        a = sig[: len(sig) - delay]
        b = got[delay:]
        err = np.abs(b - a).mean() / max(np.abs(a).mean(), 1e-9)
        assert err < 0.05, err
        # gate off: state carries None gate leaves (old layout)
        eng0 = StreamEngine(cfg0, model, params, mode="fast",
                            max_streams=2)
        assert eng0.state.nf_floor is None
        assert eng0.state.em_out is None
        # estimator 'floor' keeps the round-4-session-1 state layout
        cfgf = dataclasses.replace(cfg, serving=dataclasses.replace(
            cfg.serving, snr_gate_estimator="floor"))
        engf = StreamEngine(cfgf, model, params, mode="fast",
                            max_streams=2)
        assert engf.state.nf_floor is not None
        assert engf.state.em_out is None

    def test_gate_in_engine_unet_mode_carries_floor_across_windows(self,
                                                                   rng):
        """Round-4 review fix: engine mode 'unet' must carry the gate
        estimator state ACROSS segment windows (a per-window tracker
        re-seeds from frame 0 and never converges -> gate inert). With a forced
        passthrough gate, a model that would heavily distort the signal
        must be fully bypassed."""
        import dataclasses
        from audio_denoising_tpu.config import PRESETS
        from audio_denoising_tpu.runtime.engine import StreamEngine

        class _HalfUNet:            # heavy distortion: halves log-mags
            bins = 241

            def compatible_frames(self, t, max_extra=512):
                return t

            def apply(self, params, x):
                return 0.5 * x

        base = PRESETS["unet4-raw480"]
        cfg = dataclasses.replace(base, serving=dataclasses.replace(
            base.serving, unet_seg_hops=4, unet_ctx_samples=960,
            max_streams=2, snr_gate_db=-60.0, snr_gate_width_db=1.0,
            snr_gate_estimator="removed"))
        hop = cfg.dsp.hop_length
        P = cfg.serving.unet_seg_hops
        seg, ctx = P * hop, cfg.serving.unet_ctx_samples
        delay = seg + ctx
        eng = StreamEngine(cfg, _HalfUNet(), None, mode="unet",
                           max_streams=2)
        assert eng.state.em_out is not None
        eng.add_stream("a")
        n_ticks = 6 * P
        t_ax = np.arange(n_ticks * hop, dtype=np.float32)
        audio = (0.2 * np.sin(2 * np.pi * 440 * t_ax / 48000)
                 + 0.02 * rng.standard_normal(n_ticks * hop)
                 ).astype(np.float32)
        out = np.concatenate(
            [eng.process({"a": audio[t * hop:(t + 1) * hop]})["a"]
             for t in range(n_ticks)])
        a = delay + 2 * seg
        b = n_ticks * hop - seg
        np.testing.assert_allclose(out[a:b], audio[a - delay:b - delay],
                                   atol=5e-3)
        # sanity: WITHOUT the gate the half-residual model distorts badly
        cfg0 = dataclasses.replace(cfg, serving=dataclasses.replace(
            cfg.serving, snr_gate_db=None))
        eng0 = StreamEngine(cfg0, _HalfUNet(), None, mode="unet",
                            max_streams=2)
        eng0.add_stream("a")
        out0 = np.concatenate(
            [eng0.process({"a": audio[t * hop:(t + 1) * hop]})["a"]
             for t in range(n_ticks)])
        assert np.abs(out0[a:b] - audio[a - delay:b - delay]).mean() > 0.01

    def test_gate_unsupported_mode_downgrades(self):
        """The one mode without noise-floor state (the fused webrtc
        kernel) must not silently serve ungated: the engine downgrades
        to the op-by-op 'webrtc' GL path (same audio semantics) with a
        warning. ('fused' carries the gate IN-KERNEL since round 4 —
        tests/test_fused_hop.py::TestFusedHopGate; 'webrtc' carries it
        in the step.)"""
        import dataclasses
        import warnings
        from audio_denoising_tpu.hub import load_pretrained
        from audio_denoising_tpu.runtime.engine import StreamEngine
        cfg0, model, params = load_pretrained("gruunet2-dari_tult")
        cfg = dataclasses.replace(cfg0, serving=dataclasses.replace(
            cfg0.serving, snr_gate_db=8.0))
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            eng = StreamEngine(cfg, model, params, mode="fused-webrtc",
                               max_streams=2, pallas_interpret=True)
        assert eng.mode == "webrtc"
        assert any("snr_gate" in str(x.message) for x in w)

    def test_gate_in_webrtc_gl_mode(self, rng):
        """Gate wired through the op-by-op webrtc GL step: a forced
        passthrough gate makes the GL targets the INPUT magnitudes, so
        the output tracks the input far better than the denoised path;
        a never-pass gate reproduces the ungated output exactly
        (alpha saturates to 1)."""
        import dataclasses
        from audio_denoising_tpu.hub import load_pretrained
        from audio_denoising_tpu.runtime.engine import StreamEngine
        cfg0, model, params = load_pretrained("gruunet2-dari_tult")

        def run(gate_db):
            cfg = cfg0
            if gate_db is not None:
                cfg = dataclasses.replace(cfg0, serving=dataclasses.replace(
                    cfg0.serving, snr_gate_db=gate_db,
                    snr_gate_width_db=1.0,
                    snr_gate_estimator="removed"))
            eng = StreamEngine(cfg, model, params, mode="webrtc",
                               max_streams=1)
            eng.add_stream("a")
            if gate_db is not None:
                assert eng.state.em_out is not None
            hop = cfg.dsp.hop_length
            n_ticks = 30
            t_ax = np.arange(n_ticks * hop, dtype=np.float32)
            audio = (0.3 * np.sin(2 * np.pi * 500 * t_ax / 48000)
                     + 0.01 * rng.standard_normal(n_ticks * hop)
                     ).astype(np.float32)
            out = np.concatenate(
                [eng.process({"a": audio[t * hop:(t + 1) * hop]})["a"]
                 for t in range(n_ticks)])
            return audio, out

        rng = np.random.default_rng(7)
        _, out_denoise = run(200.0)      # alpha ~ 1 everywhere
        audio, out_pass = run(-60.0)     # alpha ~ 0 everywhere
        # Stable surfaces only (docs/BENCHMARKS.md: GL phase is chaotic,
        # and GL synthesizes its OWN phase — sample-wise correlation
        # with the input is meaningless even for perfect passthrough):
        # the passthrough gate must restore the input's ENERGY while the
        # suppressing model (trained on other data) crushes this tone.
        half = len(audio) // 2
        rms_in = float(np.sqrt(np.mean(audio[half:] ** 2)))
        rms_pass = float(np.sqrt(np.mean(out_pass[half:] ** 2)))
        rms_den = float(np.sqrt(np.mean(out_denoise[half:] ** 2)))
        assert 0.5 * rms_in < rms_pass < 2.0 * rms_in, (rms_pass, rms_in)
        assert rms_den < 0.1 * rms_pass, (rms_den, rms_pass)

    def test_gate_in_stateless_path(self, rng):
        """The same gate wires through offline_denoise_stateless. The
        input must be BURSTY: minimum statistics classifies a steady
        tone as noise (stationary == noise by definition), so the test
        signal gates on/off like vocalizations."""
        import jax
        from audio_denoising_tpu.config import PRESETS
        from audio_denoising_tpu.models import build_model
        from audio_denoising_tpu.pipeline import offline_denoise_stateless
        cfg = PRESETS["unet4-raw480"]
        model = build_model(cfg.model, num_bins=cfg.dsp.n_stft)
        params = model.init(jax.random.PRNGKey(0))
        sr = 48000
        t = np.arange(sr) / sr
        env = (np.sin(2 * np.pi * 3.0 * t) > 0).astype(np.float32)
        sig = (0.4 * np.sin(2 * np.pi * 300 * t) * env
               + 0.001 * rng.standard_normal(t.size)).astype(np.float32)
        audio = jnp.asarray(sig[None])
        low = dataclasses.replace(cfg, serving=dataclasses.replace(
            cfg.serving, snr_gate_db=-60.0, snr_gate_width_db=1.0,
            snr_gate_estimator="removed"))
        out = np.asarray(offline_denoise_stateless(low, model, params,
                                                   audio))
        a = np.asarray(audio)
        base = np.asarray(offline_denoise_stateless(cfg, model, params,
                                                    audio))
        # judge on the second half (the tracker has converged) during
        # bursts, where passthrough should dominate the random model
        half = slice(sr // 2, None)
        m = env[half] > 0
        err_pass = np.abs(out[0, half][m] - a[0, half][m]).mean()
        err_base = np.abs(base[0, half][m] - a[0, half][m]).mean()
        assert err_pass < 0.5 * err_base


class TestRemovedEstimator:
    """Model-informed 'removed' estimator units (ops/noisefloor.py): the
    power the model removed estimates the noise. Default gate estimator
    since round 4 session 4 — on manifest v2 it separates -5/0 dB inputs
    from +10 dB with 0.92 threshold accuracy vs the floor tracker's 0.81
    (measurements in the module docstring)."""

    def test_step_latches_from_zero_and_tracks(self):
        from audio_denoising_tpu.ops.noisefloor import (
            RemovedState, removed_init, removed_snr_db, removed_step)
        st = removed_init(2)
        # fresh slot: latches to the first frame's powers exactly
        st = removed_step(st, jnp.asarray([4.0, 1.0]),
                          jnp.asarray([1.0, 4.0]), beta_tot=0.9)
        np.testing.assert_allclose(np.asarray(st.out), [4.0, 1.0])
        np.testing.assert_allclose(np.asarray(st.rem), [1.0, 4.0])
        snr = np.asarray(removed_snr_db(st))
        np.testing.assert_allclose(snr, [10 * np.log10(4.0),
                                         -10 * np.log10(4.0)], atol=1e-5)
        # subsequent frames EMA normally
        st2 = removed_step(st, jnp.asarray([4.0, 1.0]),
                           jnp.asarray([1.0, 4.0]), beta_tot=0.9)
        np.testing.assert_allclose(np.asarray(st2.out), [4.0, 1.0],
                                   rtol=1e-6)

    def test_scan_matches_step_and_carries(self, rng):
        from audio_denoising_tpu.ops.noisefloor import (
            removed_init, removed_snr_db, removed_snr_scan, removed_step)
        p_out = jnp.asarray(rng.random((3, 50)).astype(np.float32)) + 0.1
        p_rem = jnp.asarray(rng.random((3, 50)).astype(np.float32)) + 0.1
        snr, last = removed_snr_scan(p_out, p_rem, beta_tot=0.95)
        st = removed_init(3)
        for t in range(50):
            st = removed_step(st, p_out[:, t], p_rem[:, t], 0.95)
        np.testing.assert_allclose(np.asarray(last.out), np.asarray(st.out),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(snr[:, -1]),
                                   np.asarray(removed_snr_db(st)), rtol=1e-5)
        # streaming continuation: second half from carried state == full
        snr_a, mid = removed_snr_scan(p_out[:, :25], p_rem[:, :25], 0.95)
        snr_b, _ = removed_snr_scan(p_out[:, 25:], p_rem[:, 25:], 0.95,
                                    init=mid)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([snr_a, snr_b], -1)),
            np.asarray(snr), rtol=1e-5)

    def test_separates_clean_from_noisy_through_a_real_model(self, rng):
        """End-to-end property the estimator was chosen for: run ONE
        checkpoint on a near-clean and a heavily-noisy version of the
        same signal; the 'removed' stream SNR must rank them correctly
        with a wide margin."""
        from audio_denoising_tpu.hub import load_pretrained
        from audio_denoising_tpu.ops import (
            hann_window, stft, mel_filterbank, inverse_mel_matrix,
            mel_scale, inverse_mel_scale)
        from audio_denoising_tpu.ops.noisefloor import (
            removed_powers, removed_snr_scan)
        import jax
        cfg, model, params = load_pretrained("gruunet2-good")
        dsp = cfg.dsp
        sr = dsp.sample_rate
        t = np.arange(sr // 2) / sr
        env = (np.sin(2 * np.pi * 4.0 * t) > 0).astype(np.float32)
        voice = 0.4 * np.sin(2 * np.pi * 350 * t) * env
        noise = rng.standard_normal(t.size).astype(np.float32)
        win = hann_window(dsp.win)
        fb = mel_filterbank(dsp.n_stft, dsp.n_mels, sr)
        inv = inverse_mel_matrix(dsp.n_stft, dsp.n_mels, sr)

        def est(audio):
            spec = stft(jnp.asarray(audio[None]), dsp.n_fft,
                        dsp.hop_length, dsp.win, window=win)
            mag = jnp.abs(spec)
            x = jnp.swapaxes(jnp.log1p(mel_scale(mag, fb)), -1, -2)
            resid, _ = model.apply(params, x, None)
            rec = jax.nn.leaky_relu(x - resid, negative_slope=0.2)
            mel_mag = jnp.maximum(jnp.expm1(jnp.swapaxes(rec, -1, -2)), 0.0)
            lin = inverse_mel_scale(mel_mag, inv)
            p_out, p_rem = removed_powers(mag * mag, lin * lin, axis=-2)
            snr, _ = removed_snr_scan(p_out, p_rem, 0.98)
            return float(np.asarray(snr)[0, -1])

        clean = est((voice + 0.003 * noise).astype(np.float32))
        noisy = est((voice + 0.5 * noise).astype(np.float32))
        assert clean > noisy + 6.0, (clean, noisy)


class TestGateAlphaRamp:
    """The blend is a clipped RAMP, not a sigmoid: the sigmoid's tails
    leaked ~27% raw-noise passthrough on correctly-read -5 dB streams at
    the tuned operating point (-1.6 dB SI-SDR paired on manifest v2) —
    a sound estimate below the foot must cost NOTHING."""

    def test_exact_saturation(self):
        from audio_denoising_tpu.ops.noisefloor import gate_alpha
        snr = jnp.asarray([-20.0, -5.0, 1.0, 7.0, 30.0])
        a = np.asarray(gate_alpha(snr, gate_db=1.0, width_db=6.0))
        assert a[0] == 1.0 and a[1] == 1.0      # at/below gate - width
        assert abs(a[2] - 0.5) < 1e-6           # center
        assert a[3] == 0.0 and a[4] == 0.0      # at/above gate + width

    def test_linear_between(self):
        from audio_denoising_tpu.ops.noisefloor import gate_alpha
        snr = jnp.linspace(-3.0, 5.0, 9)        # inside (gate +- width)
        a = np.asarray(gate_alpha(snr, gate_db=1.0, width_db=4.0))
        np.testing.assert_allclose(np.diff(a), np.diff(a)[0], atol=1e-6)


class TestUnetModeDefaultEstimator:
    def test_unet_gate_with_both_estimator_runs(self, rng):
        """Round-4 review regression: unet_stream_init_state's hand-rolled
        estimator predicate drifted from the step's ('both' allocated em_*
        but not nf_*), so engine mode 'unet' with the TUNED DEFAULT
        (`--snr-gate 1`, estimator 'both') crashed on the first segment
        boundary. The predicate now lives in one place
        (noisefloor.estimator_planes); this locks the e2e path."""
        import dataclasses
        from audio_denoising_tpu.config import PRESETS, with_snr_gate
        from audio_denoising_tpu.models import build_model
        from audio_denoising_tpu.runtime.engine import StreamEngine
        import jax
        cfg = PRESETS["unet4-raw480"]
        cfg = dataclasses.replace(cfg, serving=dataclasses.replace(
            cfg.serving, output_gain=1.0, unet_seg_hops=4,
            unet_ctx_samples=cfg.dsp.hop_length))
        cfg = with_snr_gate(cfg, 1.0)          # tuned default: 'both'
        model = build_model(cfg.model, num_bins=cfg.dsp.n_stft)
        params = model.init(jax.random.PRNGKey(0))
        eng = StreamEngine(cfg, model, params, mode="unet", max_streams=2)
        assert eng.state.nf_floor is not None and eng.state.em_out is not None
        hop = cfg.dsp.hop_length
        eng.add_stream("s")
        for t in range(6):                     # crosses a segment boundary
            out = eng.process({"s": (0.1 * rng.standard_normal(hop)
                                     ).astype(np.float32)})
            assert np.isfinite(out["s"]).all()
