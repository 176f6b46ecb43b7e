"""Evaluation subsystem tests: metric correctness + the eval harness."""

import numpy as np
import pytest
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


class TestManifestEval:
    """Round 3: frozen-manifest evaluation with bootstrap CIs and paired
    model comparisons."""

    def _manifest(self, tmp_path):
        import json
        from audio_denoising_tpu.io.wavio import write_wav
        d = tmp_path / "corpus"
        d.mkdir()
        sr = 8000
        for i in range(3):
            t = np.arange(sr * 3) / sr
            tone = (0.4 * np.sin(2 * np.pi * (220 + 60 * i) * t)
                    ).astype(np.float32)
            write_wav(str(d / f"c{i}.wav"), tone, sr)
        man = {"version": 0, "data_dir": str(d), "noise_dir": None,
               "crop_seconds": 0.5,
               "blocks": [{"seed": 1, "noise_gain": 0.5, "n": 3},
                          {"seed": 2, "noise_gain": 1.0, "n": 3}]}
        p = tmp_path / "man.json"
        p.write_text(json.dumps(man))
        return str(p), man

    def test_build_manifest_set_deterministic(self, tmp_path):
        from audio_denoising_tpu.apps.evaluate import build_manifest_set
        _p, man = self._manifest(tmp_path)
        m1, c1, g1, sr1, h1 = build_manifest_set(man)
        m2, c2, g2, sr2, h2 = build_manifest_set(man)
        assert h1 == h2 and sr1 == sr2 == 8000
        np.testing.assert_array_equal(m1, m2)
        assert m1.shape == (6, 4000)
        np.testing.assert_array_equal(g1, [0.5] * 3 + [1.0] * 3)

    def test_hash_drift_warns(self, tmp_path, capsys):
        from audio_denoising_tpu.apps.evaluate import build_manifest_set
        _p, man = self._manifest(tmp_path)
        man = dict(man, sha256_16="deadbeefdeadbeef")
        build_manifest_set(man)
        assert "hash" in capsys.readouterr().err

    def test_bootstrap_ci_brackets_mean(self):
        from audio_denoising_tpu.apps.evaluate import _bootstrap_ci, _stat
        rng = np.random.default_rng(0)
        x = rng.normal(5.0, 1.0, 200)
        lo, hi = _bootstrap_ci(x)
        assert lo < x.mean() < hi
        assert hi - lo < 0.6              # ~4 * sigma/sqrt(n)
        s = _stat(x)
        assert s["n"] == 200 and s["ci95"][0] < s["mean"] < s["ci95"][1]

    def test_snr_targeted_blocks(self, tmp_path):
        """Manifest v2 blocks: noise rescaled per example to an exact
        input SNR; near-silent clean crops redrawn deterministically."""
        import json
        from audio_denoising_tpu.apps.evaluate import build_manifest_set
        _p, man = self._manifest(tmp_path)
        man = dict(man, blocks=[
            {"seed": 5, "target_snr_db": 0.0, "n": 3},
            {"seed": 6, "target_snr_db": 8.0, "n": 3}])
        m1, c1, g1, _sr, h1 = build_manifest_set(man)
        m2, _c2, _g2, _sr2, h2 = build_manifest_set(man)
        assert h1 == h2                       # deterministic
        np.testing.assert_array_equal(m1, m2)
        n = m1 - c1
        snr = 10 * np.log10((c1 ** 2).mean(1) / (n ** 2).mean(1))
        np.testing.assert_allclose(snr[:3], 0.0, atol=0.5)
        np.testing.assert_allclose(snr[3:], 8.0, atol=0.5)
        np.testing.assert_array_equal(g1, [0.0] * 3 + [8.0] * 3)

    def test_compare_cli_self_comparison(self, tmp_path, capsys):
        """`compare A A --manifest M` runs both evals and reports zero
        deltas (significant: false) — end-to-end smoke of the paired
        subcommand."""
        import json
        from audio_denoising_tpu.apps.compare import main as compare_main
        p, _man = self._manifest(tmp_path)
        rc = compare_main(["gruunet2-good", "gruunet2-good",
                           "--manifest", p, "--bootstrap", "50"])
        assert rc == 0
        out = capsys.readouterr().out
        rep = json.loads(out[out.index("{"):])
        for m, v in rep["delta_a_minus_b"].items():
            assert v["mean_delta"] == 0.0
            assert v["significant"] is False

    def test_paired_report_resolves_small_shift(self, tmp_path):
        """An 0.3-unit model difference invisible to unpaired CIs (the
        example spread is sigma=3) is significant in the paired test."""
        import sys
        sys.path.insert(0, "/root/repo")
        from tools.compare_models import paired_report
        rng = np.random.default_rng(1)
        base = rng.normal(0.0, 3.0, 64)     # mixture difficulty spread
        noise = rng.normal(0.0, 0.1, 64)
        mk = lambda v: {m: v for m in
                        ("si_sdr_improvement", "si_sdr_out",
                         "snr_out_matched", "lsd_out_matched")}
        a = tmp_path / "a.npz"
        b = tmp_path / "b.npz"
        # si_sdr_in is the manifest-identity guard: same in both files
        np.savez(a, si_sdr_in=base, **mk(base + 0.3 + noise))
        np.savez(b, si_sdr_in=base, **mk(base))
        rep = paired_report(str(a), str(b))
        for m, r in rep.items():
            assert r["significant"], (m, r)
            assert 0.2 < r["mean_delta"] < 0.4

    def test_paired_report_mixture_guard_tolerance(self, tmp_path):
        """The same-mixture guard tolerates cross-BACKEND float jitter on
        si_sdr_in (~3e-3 dB between a chip-run and a CPU-forced eval of
        the identical manifest) but still rejects genuinely different
        mixtures (dB-scale input differences)."""
        import sys
        sys.path.insert(0, "/root/repo")
        from tools.compare_models import paired_report
        rng = np.random.default_rng(2)
        base = rng.normal(0.0, 3.0, 32)
        mk = lambda v: {m: v for m in
                        ("si_sdr_improvement", "si_sdr_out",
                         "snr_out_matched", "lsd_out_matched")}
        a = tmp_path / "a.npz"
        b = tmp_path / "b.npz"
        jitter = rng.normal(0.0, 3e-3, 32)
        np.savez(a, si_sdr_in=base + jitter, **mk(base))
        np.savez(b, si_sdr_in=base, **mk(base))
        paired_report(str(a), str(b))        # must not raise
        c = tmp_path / "c.npz"
        np.savez(c, si_sdr_in=base + 1.0, **mk(base))
        with pytest.raises(AssertionError, match="inputs differ"):
            paired_report(str(c), str(b))

    def test_evaluate_manifest_end_to_end(self, tmp_path):
        """Full manifest evaluation against a real checkpoint preset on
        a tiny synthetic manifest, with per-example output."""
        import json
        from audio_denoising_tpu.apps.evaluate import evaluate_manifest
        p, _man = self._manifest(tmp_path)
        pe = str(tmp_path / "pe.npz")
        rep = evaluate_manifest("gruunet2-good", p, n_boot=200,
                                per_example_out=pe)
        assert rep["n_examples"] == 6
        m = rep["metrics"]["si_sdr_improvement"]
        assert m["n"] == 6 and len(m["ci95"]) == 2
        assert set(rep["by_noise_gain"]) == {"0.5", "1.0"}
        per = np.load(pe)
        assert per["si_sdr_out"].shape == (6,)
        # per-example files record the metric rate (round 4: required for
        # cross-rate pairing guards) — no pin, so the model's own 48 kHz
        assert int(per["sample_rate"]) == 48000

    def test_rate_pinned_manifest_and_pairing_guard(self, tmp_path):
        """Round 4 (VERDICT r3 #6 + ADVICE): a manifest with
        "sample_rate" computes metrics at THAT rate for every model (a
        different-basis model pays its resample round trip), so paired
        comparison across bases is defined; and pairing files evaluated
        at different rates raises the dedicated error."""
        import json
        import pytest
        from audio_denoising_tpu.apps.evaluate import evaluate_manifest
        from audio_denoising_tpu.apps.compare import paired_report
        p, man = self._manifest(tmp_path)
        man16 = dict(man, sample_rate=16000)
        p16 = tmp_path / "man16.json"
        p16.write_text(json.dumps(man16))
        pe48 = str(tmp_path / "pe48.npz")
        pe16 = str(tmp_path / "pe16.npz")
        rep = evaluate_manifest("gruunet2-good", str(p16), n_boot=100,
                                per_example_out=pe16)
        assert rep["n_examples"] == 6
        assert np.isfinite(rep["metrics"]["si_sdr_improvement"]["mean"])
        assert int(np.load(pe16)["sample_rate"]) == 16000
        evaluate_manifest("gruunet2-good", p, n_boot=100,
                          per_example_out=pe48)
        with pytest.raises(ValueError, match="different sample rates"):
            paired_report(pe16, pe48)
        # same pinned rate pairs fine (self-comparison: zero deltas)
        out = paired_report(pe16, pe16, n_boot=50)
        assert all(v["mean_delta"] == 0.0 for v in out.values())
