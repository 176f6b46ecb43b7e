"""Stateless U-Net offline pipeline (BASELINE config 3: unet4 on the same
STFT front-end, no recurrence) and its cadence-locked streaming mode."""

import dataclasses
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_denoising_tpu.config import PRESETS
from audio_denoising_tpu.models import build_model
from audio_denoising_tpu.pipeline import offline_denoise_stateless
from audio_denoising_tpu.runtime.engine import StreamEngine


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


# --------------------------------------------------------------------------
# Cadence-locked streaming (engine mode 'unet')
# --------------------------------------------------------------------------

def _stream_cfg(cfg, seg_hops=4, ctx=480, max_streams=4, xfade=0,
                ctx_left=None):
    return dataclasses.replace(
        cfg, serving=dataclasses.replace(
            cfg.serving, unet_seg_hops=seg_hops, unet_ctx_samples=ctx,
            unet_xfade_samples=xfade, unet_ctx_left_samples=ctx_left,
            max_streams=max_streams))


class _ZeroUNet:
    """Zero-residual stand-in: streaming reduces to a pure STFT round trip."""
    bins = 241

    def compatible_frames(self, t, max_extra=512):
        return t

    def apply(self, params, x):
        return jnp.zeros_like(x)


class TestUNetStreaming:
    def test_window_equivalence(self, unet, rng):
        """The engine's streamed output IS offline_denoise_stateless applied
        per [ctx|seg|ctx] window: each cycle's emitted seg equals the middle
        slice of the offline graph run on that cycle-closing ring."""
        cfg, model, params = unet
        cfg = _stream_cfg(cfg)
        hop = cfg.dsp.hop_length
        P = cfg.serving.unet_seg_hops
        seg, ctx = P * hop, cfg.serving.unet_ctx_samples
        R = ctx + seg + ctx

        eng = StreamEngine(cfg, model, params, mode="unet", max_streams=2)
        eng.add_stream("a")

        n_cycles = 3
        audio = 0.1 * rng.standard_normal(n_cycles * seg).astype(np.float32)
        history = np.zeros(R, np.float32)
        outs = []
        for t in range(n_cycles * P):
            chunk = audio[t * hop:(t + 1) * hop]
            outs.append(eng.process({"a": chunk})["a"])
            history = np.concatenate([history[hop:], chunk])
            if t % P == P - 1 and t // P < n_cycles - 1:
                expect = offline_denoise_stateless(
                    cfg, model, params, jnp.asarray(history[None]))
                expect = np.asarray(expect)[0, ctx:ctx + seg]
                got = np.concatenate(
                    [eng.process({"a": audio[s * hop:(s + 1) * hop]})["a"]
                     for s in range(t + 1, t + 1 + P)])
                # engine jit vs direct call fuse differently — fp32
                # reassociation through 12 conv levels; bound the error
                # relative to the signal scale
                np.testing.assert_allclose(
                    got, expect, rtol=0,
                    atol=5e-5 * np.abs(expect).max())
                # those P ticks consumed input; resync the python history
                for s in range(t + 1, t + 1 + P):
                    history = np.concatenate(
                        [history[hop:], audio[s * hop:(s + 1) * hop]])
                break

    def test_streamed_offline_matches_engine(self, unet, rng):
        """pipeline.offline_denoise_streamed == engine mode 'unet' fed
        hop by hop (minus the removed seg+ctx delay) — the bounded-
        latency frontier evaluator measures exactly what a live stream
        would hear (round 5, VERDICT r4 #1)."""
        from audio_denoising_tpu.pipeline import offline_denoise_streamed
        cfg, model, params = unet
        cfg = _stream_cfg(cfg)
        hop = cfg.dsp.hop_length
        P = cfg.serving.unet_seg_hops
        seg, ctx = P * hop, cfg.serving.unet_ctx_samples
        delay = seg + ctx
        n = 4 * seg
        audio = 0.1 * rng.standard_normal(n).astype(np.float32)

        streamed = np.asarray(offline_denoise_streamed(
            cfg, model, params, jnp.asarray(audio)))
        assert streamed.shape == audio.shape

        eng = StreamEngine(cfg, model, params, mode="unet", max_streams=2)
        eng.add_stream("a")
        padded = np.concatenate(
            [audio, np.zeros((-(-(n + delay) // hop)) * hop - n,
                             np.float32)])
        eng_out = np.concatenate(
            [eng.process({"a": padded[t * hop:(t + 1) * hop]})["a"]
             for t in range(len(padded) // hop)])
        np.testing.assert_allclose(streamed, eng_out[delay:delay + n],
                                   rtol=0, atol=1e-5)

    def test_streamed_offline_zero_model_identity(self, rng):
        """Zero residual: the streamed evaluator's realignment must be
        sample-exact — output == input past the first window warm-up."""
        from audio_denoising_tpu.pipeline import offline_denoise_streamed
        cfg = _stream_cfg(PRESETS["unet4-raw480"], seg_hops=4, ctx=960)
        seg = cfg.serving.unet_seg_hops * cfg.dsp.hop_length
        n = 6 * seg
        t_ax = np.arange(n, dtype=np.float32)
        audio = (0.2 * np.sin(2 * np.pi * 440 * t_ax / 48000)
                 + 0.02 * rng.standard_normal(n)).astype(np.float32)
        out = np.asarray(offline_denoise_streamed(
            cfg, _ZeroUNet(), None, jnp.asarray(audio)))
        np.testing.assert_allclose(out[2 * seg:], audio[2 * seg:],
                                   atol=5e-3)

    def test_streamed_manifest_eval_flag(self, tmp_path, rng):
        """evaluate_manifest(streamed=True) runs end to end against a
        tiny frozen manifest and records the latency budget; a recurrent
        checkpoint is rejected with a pointer to lookahead_frames."""
        import json as _json
        from audio_denoising_tpu.apps.evaluate import evaluate_manifest
        data = "/root/reference/data/uncompressed/cats"
        if not os.path.isdir(data):
            pytest.skip("reference corpus not mounted")
        manifest = {
            "version": "test-tiny",
            "data_dir": data,
            "crop_seconds": 0.3,
            "blocks": [{"seed": 900, "noise_gain": 0.5, "n": 2}],
        }
        mpath = tmp_path / "m.json"
        mpath.write_text(_json.dumps(manifest))
        ckpt = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "runs", "unet4-mrstft-30k.npz")
        if not os.path.exists(ckpt):
            pytest.skip("unet4 checkpoint absent")
        rep = evaluate_manifest(ckpt, str(mpath),
                                n_boot=50, streamed=True,
                                unet_seg_hops=4, unet_ctx=960,
                                unet_xfade=192, unet_ctx_left=1920)
        assert rep["streamed"] is True
        assert rep["unet_seg_hops"] == 4
        assert rep["unet_xfade_samples"] == 192
        assert rep["unet_ctx_left_samples"] == 1920
        # ctx_left is PAST context — latency-free by construction
        assert rep["stream_latency_ms"] == pytest.approx(
            (4 * 384 + 960) / 48000 * 1e3, rel=1e-3)
        assert np.isfinite(rep["metrics"]["si_sdr_out"]["mean"])
        with pytest.raises(ValueError, match="lookahead_frames"):
            evaluate_manifest("gruunet2-good", str(mpath), n_boot=50,
                              streamed=True)

    def test_zero_model_delay_is_identity(self, rng):
        """With a zero residual the stream is the input delayed by exactly
        seg + ctx samples (the documented streaming latency), up to the
        STFT round-trip edge taper absorbed by ctx."""
        cfg = _stream_cfg(PRESETS["unet4-raw480"], seg_hops=4, ctx=960)
        hop = cfg.dsp.hop_length
        P = cfg.serving.unet_seg_hops
        seg, ctx = P * hop, cfg.serving.unet_ctx_samples
        delay = seg + ctx

        eng = StreamEngine(cfg, _ZeroUNet(), None, mode="unet",
                           max_streams=2)
        eng.add_stream("a")
        n_ticks = 6 * P
        t_ax = np.arange(n_ticks * hop, dtype=np.float32)
        audio = (0.2 * np.sin(2 * np.pi * 440 * t_ax / 48000)
                 + 0.02 * rng.standard_normal(n_ticks * hop)
                 ).astype(np.float32)
        out = np.concatenate(
            [eng.process({"a": audio[t * hop:(t + 1) * hop]})["a"]
             for t in range(n_ticks)])
        # compare a region far enough in that warm-up zeros are flushed
        a = delay + 2 * seg
        b = n_ticks * hop - seg
        np.testing.assert_allclose(out[a:b], audio[a - delay:b - delay],
                                   atol=5e-3)

    def test_xfade_blends_consecutive_windows(self, unet, rng):
        """With unet_xfade_samples=xf the first xf samples of each
        emitted segment are the linear ramp blend of the NEW window's
        estimate and the PREVIOUS window's estimate of the same span
        (which lies inside its denoised right context) — checked against
        a hand-rolled offline reconstruction of both windows."""
        cfg, model, params = unet
        xf = 192
        cfg = _stream_cfg(cfg, seg_hops=4, ctx=480, xfade=xf)
        hop = cfg.dsp.hop_length
        P = cfg.serving.unet_seg_hops
        seg, ctx = P * hop, cfg.serving.unet_ctx_samples
        R = ctx + seg + ctx

        from audio_denoising_tpu.pipeline import offline_denoise_streamed
        n = 5 * seg
        audio = 0.1 * rng.standard_normal(n).astype(np.float32)
        got = np.asarray(offline_denoise_streamed(
            cfg, model, params, jnp.asarray(audio)))

        # window c closes when the ring holds
        # audio[c*seg - 2*ctx : (c+1)*seg]; its emitted middle lands at
        # output coords [c*seg - ctx, (c+1)*seg - ctx) after the delay
        # removal in offline_denoise_streamed
        def window(c):
            w = audio[c * seg - 2 * ctx:(c + 1) * seg]
            assert w.shape == (R,)
            return np.asarray(offline_denoise_stateless(
                cfg, model, params, jnp.asarray(w[None])))[0]

        k = 2
        prev_tail = window(k - 1)[ctx + seg:ctx + seg + xf]
        new_head = window(k)[ctx:ctx + xf]
        ramp = np.arange(1, xf + 1, dtype=np.float32) / (xf + 1)
        expect_head = ramp * new_head + (1.0 - ramp) * prev_tail
        o = k * seg - ctx                       # output coord of the join
        scale = np.abs(expect_head).max()
        np.testing.assert_allclose(got[o:o + xf], expect_head,
                                   rtol=0, atol=5e-5 * scale)
        # past the crossfade span the segment is the plain middle slice
        body = window(k)[ctx + xf:ctx + seg]
        np.testing.assert_allclose(got[o + xf:o + seg], body,
                                   rtol=0, atol=5e-5 * np.abs(body).max())

    def test_xfade_zero_model_identity(self, rng):
        """Zero residual + crossfade: both windows estimate the same
        (identity) signal, so the blend is still the exact delayed
        input — the crossfade must not perturb an already-consistent
        stream."""
        from audio_denoising_tpu.pipeline import offline_denoise_streamed
        cfg = _stream_cfg(PRESETS["unet4-raw480"], seg_hops=4, ctx=960,
                          xfade=384)
        seg = cfg.serving.unet_seg_hops * cfg.dsp.hop_length
        n = 6 * seg
        t_ax = np.arange(n, dtype=np.float32)
        audio = (0.2 * np.sin(2 * np.pi * 440 * t_ax / 48000)
                 + 0.02 * rng.standard_normal(n)).astype(np.float32)
        out = np.asarray(offline_denoise_streamed(
            cfg, _ZeroUNet(), None, jnp.asarray(audio)))
        np.testing.assert_allclose(out[2 * seg:], audio[2 * seg:],
                                   atol=5e-3)

    def test_ctx_left_asymmetric_window(self, unet, rng):
        """unet_ctx_left_samples decouples PAST context (latency-free)
        from the right/lookahead context: the emitted segment equals the
        offline graph on the asymmetric [ctx_left | seg | ctx] window,
        and the streaming delay stays seg + ctx (right only)."""
        cfg, model, params = unet
        ctx, ctx_l = 480, 1920
        cfg = _stream_cfg(cfg, seg_hops=4, ctx=ctx, ctx_left=ctx_l)
        hop = cfg.dsp.hop_length
        P = cfg.serving.unet_seg_hops
        seg = P * hop

        from audio_denoising_tpu.pipeline import offline_denoise_streamed
        n = 6 * seg
        audio = 0.1 * rng.standard_normal(n).astype(np.float32)
        got = np.asarray(offline_denoise_streamed(
            cfg, model, params, jnp.asarray(audio)))
        assert got.shape == audio.shape

        # window c's ring holds audio[c*seg - ctx_l - ctx : (c+1)*seg];
        # its middle lands at output [c*seg - ctx, (c+1)*seg - ctx)
        k = 3                                 # deep enough for full ctx_l
        w = audio[k * seg - ctx_l - ctx:(k + 1) * seg]
        assert w.shape == (ctx_l + seg + ctx,)
        den = np.asarray(offline_denoise_stateless(
            cfg, model, params, jnp.asarray(w[None])))[0]
        expect = den[ctx_l:ctx_l + seg]
        o = k * seg - ctx
        np.testing.assert_allclose(got[o:o + seg], expect,
                                   rtol=0, atol=5e-5 * np.abs(expect).max())

    def test_ctx_left_zero_model_delay(self, rng):
        """Asymmetric context does not change the streaming delay: a zero
        residual still yields the input delayed by exactly seg + ctx
        (the engine's algorithmic_latency_samples contract)."""
        cfg = _stream_cfg(PRESETS["unet4-raw480"], seg_hops=4, ctx=960,
                          ctx_left=2880)
        hop = cfg.dsp.hop_length
        P = cfg.serving.unet_seg_hops
        seg, ctx = P * hop, cfg.serving.unet_ctx_samples

        eng = StreamEngine(cfg, _ZeroUNet(), None, mode="unet",
                           max_streams=2)
        eng.add_stream("a")
        assert eng.algorithmic_latency_samples == seg + ctx
        n_ticks = 8 * P
        t_ax = np.arange(n_ticks * hop, dtype=np.float32)
        audio = (0.2 * np.sin(2 * np.pi * 440 * t_ax / 48000)
                 + 0.02 * rng.standard_normal(n_ticks * hop)
                 ).astype(np.float32)
        out = np.concatenate(
            [eng.process({"a": audio[t * hop:(t + 1) * hop]})["a"]
             for t in range(n_ticks)])
        delay = seg + ctx
        a = delay + 3 * seg                   # flush ctx_l warm-up zeros
        b = n_ticks * hop - seg
        np.testing.assert_allclose(out[a:b], audio[a - delay:b - delay],
                                   atol=5e-3)

    def test_xfade_too_large_raises(self):
        from audio_denoising_tpu.pipeline import unet_stream_init_state
        cfg = _stream_cfg(PRESETS["unet4-raw480"], seg_hops=4, ctx=480,
                          xfade=481)
        with pytest.raises(ValueError, match="unet_xfade_samples"):
            unet_stream_init_state(cfg, _ZeroUNet(), 1)

    def test_xfade_snapshot_restore(self, rng):
        """The crossfade tail carry is part of engine state: snapshot
        mid-cycle and restore reproduces the byte-exact stream."""
        cfg = _stream_cfg(PRESETS["unet4-raw480"], seg_hops=4, ctx=480,
                          xfade=192)
        hop = cfg.dsp.hop_length
        P = cfg.serving.unet_seg_hops
        eng = StreamEngine(cfg, _ZeroUNet(), None, mode="unet",
                           max_streams=2)
        eng.add_stream("a")
        chunks = [0.1 * rng.standard_normal(hop).astype(np.float32)
                  for _ in range(4 * P)]
        for c in chunks[:P + 2]:
            eng.process({"a": c})
        snap = eng.snapshot()
        tail = [eng.process({"a": c})["a"] for c in chunks[P + 2:]]
        fresh = StreamEngine(cfg, _ZeroUNet(), None, mode="unet",
                             max_streams=2)
        fresh.restore(snap)
        for i, c in enumerate(chunks[P + 2:]):
            np.testing.assert_array_equal(fresh.process({"a": c})["a"],
                                          tail[i])

    def test_admission_and_snapshot(self, rng):
        """Slots admit/evict mid-cycle; snapshot/restore (incl. the cycle
        phase) reproduces the byte-exact output stream."""
        cfg = _stream_cfg(PRESETS["unet4-raw480"], seg_hops=4, ctx=480)
        hop = cfg.dsp.hop_length
        P = cfg.serving.unet_seg_hops

        eng = StreamEngine(cfg, _ZeroUNet(), None, mode="unet",
                           max_streams=2)
        eng.add_stream("a")
        chunks = [0.1 * rng.standard_normal(hop).astype(np.float32)
                  for _ in range(4 * P)]
        for c in chunks[:P + 1]:        # stop mid-cycle (phase = 1)
            eng.process({"a": c})
        eng.add_stream("b")             # admission mid-cycle
        snap = eng.snapshot()
        assert snap["phase"] == (P + 1) % P

        tail_a, tail_b = [], []
        for c in chunks[P + 1:]:
            o = eng.process({"a": c, "b": c[::-1].copy()})
            tail_a.append(o["a"])
            tail_b.append(o["b"])

        fresh = StreamEngine(cfg, _ZeroUNet(), None, mode="unet",
                             max_streams=2)
        fresh.restore(snap)
        for i, c in enumerate(chunks[P + 1:]):
            o = fresh.process({"a": c, "b": c[::-1].copy()})
            np.testing.assert_array_equal(o["a"], tail_a[i])
            np.testing.assert_array_equal(o["b"], tail_b[i])
        fresh.remove_stream("a")
        assert fresh.active_streams == 1


class TestDropout:
    def test_training_dropout_semantics(self, unet, rng):
        """dropout_rng=None is an identity (inference semantics unchanged);
        a key + rate>0 perturbs the output, different keys differently —
        the reference trains with nn.Dropout(0.01) per block
        (unet4.py:118), reconstructed here."""
        cfg, model, params = unet
        x = jnp.asarray(0.1 * rng.standard_normal((1, 241, 91)), jnp.float32)
        base = model.apply(params, x)
        ident = model.apply(params, x, dropout_rng=None, dropout=0.5)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(ident))
        zero = model.apply(params, x, dropout_rng=jax.random.PRNGKey(1),
                           dropout=0.0)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(zero))
        d1 = model.apply(params, x, dropout_rng=jax.random.PRNGKey(1),
                         dropout=0.3)
        d2 = model.apply(params, x, dropout_rng=jax.random.PRNGKey(2),
                         dropout=0.3)
        assert not np.allclose(np.asarray(d1), np.asarray(base))
        assert not np.allclose(np.asarray(d1), np.asarray(d2))
        # deterministic per key (resume safety)
        d1b = model.apply(params, x, dropout_rng=jax.random.PRNGKey(1),
                          dropout=0.3)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1b))


def test_unet_mode_on_mesh(rng):
    """unet mode shards its slot axis over a mesh like the other modes
    (the phase scalar replicates); output matches the single-device
    engine."""
    from jax.sharding import Mesh
    cfg = _stream_cfg(PRESETS["unet4-raw480"], seg_hops=4, ctx=480,
                      max_streams=8)
    hop = cfg.dsp.hop_length
    mesh = Mesh(np.asarray(jax.devices()), ("streams",))
    ref = StreamEngine(cfg, _ZeroUNet(), None, mode="unet", max_streams=8)
    eng = StreamEngine(cfg, _ZeroUNet(), None, mode="unet", max_streams=8,
                       mesh=mesh)
    for e in (ref, eng):
        e.add_stream("a")
    for t in range(10):
        c = (0.1 * rng.standard_normal(hop)).astype(np.float32)
        a = ref.process({"a": c})["a"]
        b = eng.process({"a": c})["a"]
        np.testing.assert_allclose(a, b, atol=1e-6)
