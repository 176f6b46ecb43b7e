"""Fused webrtc hop (in-kernel warm-start Griffin-Lim) vs the op-by-op
pipeline.make_webrtc_step (CPU interpret mode; the same kernel compiles on
TPU — on-chip parity and latency are recorded in docs/BENCHMARKS.md)."""

import dataclasses
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_denoising_tpu.config import Config, DSPConfig, ModelConfig
from audio_denoising_tpu.models import build_model
from audio_denoising_tpu.ops.pallas.webrtc_hop import (
    WebRTCHopState, _fpad, make_webrtc_hop, webrtc_hop_init_state)
from audio_denoising_tpu.pipeline import make_webrtc_step, webrtc_init_state
from audio_denoising_tpu.runtime.plan import PlanModel, build_cell_plan

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _small_setup(n_iter=4):
    """Small GL config so the unrolled kernel stays fast in interpret
    mode; the kernel is shape-generic (the real webrtc config is
    1536/768/64, exercised on-chip)."""
    cfg = Config(
        dsp=DSPConfig(sample_rate=16000, n_fft=64, hop_length=32, n_mels=16,
                      reconstruction="griffin_lim", griffin_lim_iters=n_iter,
                      griffin_lim_warm_start=True),
        model=ModelConfig(arch="GRUUNet2", num_compressed_bins=4,
                          hidden_sizes=(5, 5), kernel_sizes=(3, 3),
                          strides=(2, 2), paddings=(1, 1), num_gaussians=3))
    model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
    params = model.init(jax.random.PRNGKey(0))
    plan = build_cell_plan(model, params)
    return cfg, model, params, plan


class TestWebRTCHop:
    def test_matches_op_by_op_step(self, rng):
        """Fused kernel tracks make_webrtc_step (same warm seeds, same
        GL iterations) across hops: output, hx, and carried phases."""
        cfg, model, params, plan = _small_setup()
        B, hop = 3, cfg.dsp.hop_length
        ref_step = make_webrtc_step(cfg, model)
        fused = make_webrtc_hop(cfg, plan, interpret=True, block_b=8)
        s0 = webrtc_init_state(cfg, model, B)
        s1 = webrtc_hop_init_state(cfg, plan, B)
        F = cfg.dsp.n_stft
        for t in range(6):
            chunk = jnp.asarray(0.2 * rng.standard_normal((B, hop)),
                                jnp.float32)
            s0, out0 = ref_step(params, s0, chunk)
            s1, out1 = fused(s1, chunk)
            # GL amplifies fp32 round-off at near-zero-magnitude bins into
            # O(1) ANGLE differences (upd/|upd| of a ~1e-7 vector), but
            # those bins carry ~no energy: the audio output and the model
            # state are the parity surfaces (GL init-sensitivity is
            # documented in ops/griffinlim.py and VERDICT item 4)
            # rtol: the random-weights model amplifies via expm1, so
            # outputs are O(100); parity is relative. The kernel's 3-pass
            # bf16-split matmuls carry ~4e-4 relative (see module doc)
            np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                                       rtol=2e-3, atol=1e-3)
            np.testing.assert_allclose(
                np.asarray(s0.hx).reshape(B, -1), np.asarray(s1.hx),
                atol=5e-4)
            # carried phases stay unit vectors (or 0 at dead/pad bins)
            FP = _fpad(cfg.dsp.n_stft)
            re = np.concatenate(
                [np.asarray(s1.ang_re)[:, i * FP:i * FP + cfg.dsp.n_stft]
                 for i in range(3)], axis=1)
            im = np.concatenate(
                [np.asarray(s1.ang_im)[:, i * FP:i * FP + cfg.dsp.n_stft]
                 for i in range(3)], axis=1)
            nrm = np.sqrt(re ** 2 + im ** 2)
            assert np.all((np.abs(nrm - 1.0) < 1e-3) | (nrm < 1e-3))

    def test_zero_iter_seed_path_exact(self, rng):
        """With n_iter=0 the hop is seed+analysis+synthesis only — no GL
        round-off amplification — and must match op-by-op including the
        carried phases."""
        cfg, model, params, plan = _small_setup(n_iter=0)
        B, hop = 3, cfg.dsp.hop_length
        ref_step = make_webrtc_step(cfg, model)
        fused = make_webrtc_hop(cfg, plan, interpret=True, block_b=8)
        s0 = webrtc_init_state(cfg, model, B)
        s1 = webrtc_hop_init_state(cfg, plan, B)
        for t in range(3):
            chunk = jnp.asarray(0.2 * rng.standard_normal((B, hop)),
                                jnp.float32)
            s0, out0 = ref_step(params, s0, chunk)
            s1, out1 = fused(s1, chunk)
            # 3-pass split matmuls: ~4e-4 relative through the chain
            np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                                       rtol=2e-3, atol=1e-3)
            ang = np.asarray(s0.gl_angles)          # (B, F, 3, 2)
            F, FP = cfg.dsp.n_stft, _fpad(cfg.dsp.n_stft)
            ang_re = np.concatenate([ang[:, :, i, 0] for i in range(3)],
                                    axis=1)
            ang_im = np.concatenate([ang[:, :, i, 1] for i in range(3)],
                                    axis=1)
            # kernel phases live at FP-strided lanes (pad bins unused)
            got_re = np.concatenate(
                [np.asarray(s1.ang_re)[:, i * FP:i * FP + F]
                 for i in range(3)], axis=1)
            got_im = np.concatenate(
                [np.asarray(s1.ang_im)[:, i * FP:i * FP + F]
                 for i in range(3)], axis=1)
            np.testing.assert_allclose(ang_re, got_re, atol=2e-3)
            np.testing.assert_allclose(ang_im, got_im, atol=2e-3)

    def test_batch_padding(self, rng):
        cfg, model, params, plan = _small_setup(n_iter=2)
        fused = make_webrtc_hop(cfg, plan, interpret=True, block_b=8)
        B, hop = 5, cfg.dsp.hop_length
        s = webrtc_hop_init_state(cfg, plan, B)
        chunk = jnp.asarray(0.2 * rng.standard_normal((B, hop)), jnp.float32)
        s, out = fused(s, chunk)
        assert out.shape == (B, hop)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_requires_warm_start_and_half_hop(self):
        cfg, model, params, plan = _small_setup()
        cold = dataclasses.replace(
            cfg, dsp=dataclasses.replace(cfg.dsp,
                                         griffin_lim_warm_start=False))
        with pytest.raises(AssertionError):
            make_webrtc_hop(cold, plan)
        odd = dataclasses.replace(
            cfg, dsp=dataclasses.replace(cfg.dsp, hop_length=16))
        with pytest.raises(AssertionError):
            make_webrtc_hop(odd, plan)

    def test_bf16_compute_dtype_bounded_error(self, rng):
        """compute_dtype=bfloat16 (production mode on real chips: 2x MXU
        rate for the GL matmuls) stays within a documented bound of the
        fp32 kernel. The analysis path stays fp32 in BOTH modes, so the
        model state must match tightly; the output differs only through
        bf16 phase noise (relative to the frame's energy)."""
        cfg, model, params, plan = _small_setup()
        B, hop = 3, cfg.dsp.hop_length
        f32 = make_webrtc_hop(cfg, plan, interpret=True, block_b=8)
        bf16 = make_webrtc_hop(cfg, plan, interpret=True, block_b=8,
                               compute_dtype=jnp.bfloat16)
        s1 = webrtc_hop_init_state(cfg, plan, B)
        s2 = webrtc_hop_init_state(cfg, plan, B)
        worst_rel = 0.0
        for t in range(4):
            chunk = jnp.asarray(0.2 * rng.standard_normal((B, hop)),
                                jnp.float32)
            s1, o1 = f32(s1, chunk)
            s2, o2 = bf16(s2, chunk)
            # the model path is fp32 in both modes: states must track
            np.testing.assert_allclose(np.asarray(s1.hx),
                                       np.asarray(s2.hx), atol=1e-5)
            scale = max(float(np.abs(np.asarray(o1)).max()), 1e-3)
            worst_rel = max(worst_rel, float(
                np.abs(np.asarray(o1) - np.asarray(o2)).max()) / scale)
        # bf16 phase noise: ~2^-8 per matmul, amplified by GL's
        # renormalization at low-energy bins; bound the OUTPUT error
        # relative to the frame's own scale
        assert worst_rel < 0.25, worst_rel


class TestEngineWebRTCFused:
    def test_engine_mode_wiring(self, rng):
        cfg, model, params, plan = _small_setup(n_iter=2)
        import audio_denoising_tpu.ops.pallas.webrtc_hop as wh
        orig = wh.make_webrtc_hop
        try:
            wh.make_webrtc_hop = lambda c, p, **kw: orig(
                c, p, interpret=True, block_b=8)
            from audio_denoising_tpu.runtime.engine import StreamEngine
            eng = StreamEngine(cfg, model, params, mode="fused-webrtc",
                               max_streams=2, jit=False)
            eng.add_stream("s")
            hop = cfg.dsp.hop_length
            out = eng.process(
                {"s": (0.2 * rng.standard_normal(hop)).astype(np.float32)})
            assert out["s"].shape == (hop,)
            assert np.all(np.isfinite(out["s"]))
            # masked commit: phases of an idle slot must not advance
            eng.add_stream("idle")
            ang = np.asarray(eng.state.ang_re[eng.slots["idle"]]).copy()
            eng.process(
                {"s": (0.2 * rng.standard_normal(hop)).astype(np.float32)})
            np.testing.assert_array_equal(
                np.asarray(eng.state.ang_re[eng.slots["idle"]]), ang)
        finally:
            wh.make_webrtc_hop = orig


@pytest.mark.slow
class TestLongHorizonLocks:
    """VERDICT r2 task 8: kernel-drift locks that cannot hide behind the
    phase-chaos argument — 40-hop magnitude + hx trajectory, and a 6-hop
    waveform lock at the kernel's fp32 GL-32 operating point.

    Marked `slow` (~6 min in interpret mode): deselected by default,
    run with `pytest -m ''` or `-m slow`."""

    def test_40_hop_magnitude_and_hx_trajectory(self, rng):
        """Over 40 hops the fused kernel must track the op-by-op path on
        every phase-independent surface: hx (the model recurrence), the
        per-hop output spectral MAGNITUDES, and per-hop waveform SNR.
        (Measured headroom: >60 dB waveform SNR at hop 40, hx ~4e-7 —
        the thresholds below would catch any real kernel drift.)"""
        cfg, model, params, plan = _small_setup(n_iter=4)
        B, hop = 3, cfg.dsp.hop_length
        ref_step = make_webrtc_step(cfg, model)
        fused = make_webrtc_hop(cfg, plan, interpret=True, block_b=8)
        s0 = webrtc_init_state(cfg, model, B)
        s1 = webrtc_hop_init_state(cfg, plan, B)
        for t in range(40):
            chunk = jnp.asarray(0.2 * rng.standard_normal((B, hop)),
                                jnp.float32)
            s0, o0 = ref_step(params, s0, chunk)
            s1, o1 = fused(s1, chunk)
            np.testing.assert_allclose(
                np.asarray(s0.hx).reshape(B, -1), np.asarray(s1.hx),
                atol=1e-5, err_msg=f"hx drift at hop {t}")
            if t < 2:       # warmup hops emit (near-)silence
                continue
            r, e = np.asarray(o0), np.asarray(o0) - np.asarray(o1)
            snr = 10 * np.log10(max((r ** 2).sum(), 1e-20)
                                / max((e ** 2).sum(), 1e-20))
            assert snr > 40.0, f"waveform SNR {snr:.1f} dB at hop {t}"
            m0 = np.abs(np.fft.rfft(r, axis=-1))
            m1 = np.abs(np.fft.rfft(np.asarray(o1), axis=-1))
            np.testing.assert_allclose(
                m1, m0, atol=2e-2 * max(1.0, m0.max()),
                err_msg=f"magnitude drift at hop {t}")

    def test_6_hop_waveform_lock_fp32_gl32(self, rng):
        """The kernel's fp32 GL-32 operating point (the mode the on-chip
        parity table quotes) holds a waveform lock vs the op-by-op path
        over 6 hops — mirroring the op-by-op path's own 6-hop waveform
        golden vs the executed reference (test_pipeline.py)."""
        cfg, model, params, plan = _small_setup(n_iter=32)
        B, hop = 2, cfg.dsp.hop_length
        ref_step = make_webrtc_step(cfg, model)
        fused = make_webrtc_hop(cfg, plan, interpret=True, block_b=8,
                                compute_dtype=jnp.float32)
        s0 = webrtc_init_state(cfg, model, B)
        s1 = webrtc_hop_init_state(cfg, plan, B)
        for t in range(6):
            chunk = jnp.asarray(0.2 * rng.standard_normal((B, hop)),
                                jnp.float32)
            s0, o0 = ref_step(params, s0, chunk)
            s1, o1 = fused(s1, chunk)
            if t < 2:
                continue
            r, e = np.asarray(o0), np.asarray(o0) - np.asarray(o1)
            snr = 10 * np.log10(max((r ** 2).sum(), 1e-20)
                                / max((e ** 2).sum(), 1e-20))
            assert snr > 35.0, f"fp32 GL-32 waveform SNR {snr:.1f} dB " \
                               f"at hop {t}"
        np.testing.assert_allclose(
            np.asarray(s0.hx).reshape(B, -1), np.asarray(s1.hx), atol=1e-5)


class TestWebRTCHopResident:
    """Resident multi-hop variant (hops_per_call=K): K hops inside one
    pallas_call, state in VMEM scratch across grid steps — must be
    hop-exact vs the sequential kernel (same math, same order)."""

    def test_multi_hop_matches_sequential(self, rng):
        cfg, model, params, plan = _small_setup()
        B, K, hop = 3, 4, cfg.dsp.hop_length
        single = make_webrtc_hop(cfg, plan, interpret=True, block_b=8)
        multi = make_webrtc_hop(cfg, plan, interpret=True, block_b=8,
                                hops_per_call=K)
        chunks = jnp.asarray(0.2 * rng.standard_normal((K, B, hop)),
                             jnp.float32)
        s_m = s_s = webrtc_hop_init_state(cfg, plan, B)
        s_m, outs = multi(s_m, chunks)
        for k in range(K):
            s_s, out = single(s_s, chunks[k])
            np.testing.assert_allclose(np.asarray(outs[k]),
                                       np.asarray(out), atol=1e-6)
        for leaf_m, leaf_s in zip(s_m, s_s):
            np.testing.assert_allclose(np.asarray(leaf_m),
                                       np.asarray(leaf_s), atol=1e-6)

    def test_multi_hop_pads_ragged_batch(self, rng):
        cfg, model, params, plan = _small_setup(n_iter=2)
        B, K, hop = 5, 2, cfg.dsp.hop_length   # 5 % block_b(8) != 0
        multi = make_webrtc_hop(cfg, plan, interpret=True, block_b=8,
                                hops_per_call=K)
        chunks = jnp.asarray(0.2 * rng.standard_normal((K, B, hop)),
                             jnp.float32)
        s, outs = multi(webrtc_hop_init_state(cfg, plan, B), chunks)
        assert outs.shape == (K, B, hop)
        assert s.ring.shape[0] == B
        assert np.isfinite(np.asarray(outs)).all()
