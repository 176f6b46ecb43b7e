"""io layer, serving engine, and mesh-sharded serving tests."""

import glob
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_denoising_tpu import io as adio
from audio_denoising_tpu.compat import load_params_npz
from audio_denoising_tpu.config import Config, DSPConfig, ModelConfig, ServingConfig
from audio_denoising_tpu.models import build_model
from audio_denoising_tpu.models.base import as_jnp
from audio_denoising_tpu.parallel import make_mesh, shard_engine_step, shard_pytree_batch
from audio_denoising_tpu.runtime import StreamEngine, make_fast_step
from audio_denoising_tpu.runtime.engine import fast_init_state

CKPT = os.path.join(os.path.dirname(__file__), "..", "checkpoints")
REF_WAVS = sorted(glob.glob(
    "/root/reference/data/uncompressed/cats/dataset/dataset/*.wav"))

FAST_CFG = Config(dsp=DSPConfig(n_fft=1024, hop_length=512, n_mels=64,
                                reconstruction="phase"),
                  serving=ServingConfig(max_streams=8, chunk_samples=512))


def _model():
    params, meta = load_params_npz(os.path.join(CKPT, "gruunet2-good.npz"))
    cfg = ModelConfig.from_reference_dict(meta["arch"], meta["config"])
    return build_model(cfg, num_bins=64), as_jnp(params)


class TestWavIO:
    def test_roundtrip(self, tmp_path, rng):
        x = (0.5 * rng.standard_normal((2, 1000))).astype(np.float32)
        p = str(tmp_path / "t.wav")
        adio.write_wav(p, x, 16000)
        y, sr = adio.read_wav(p)
        assert sr == 16000 and y.shape == (2, 1000)
        np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=2.0 / 32768)

    def test_pcm_scaling_matches_reference_rules(self):
        assert adio.pcm_to_float32(np.array([16384], np.int16))[0] == 0.5
        assert adio.pcm_to_float32(np.array([64], np.int8))[0] == 0.5
        assert adio.pcm_to_float32(np.array([2 ** 30], np.int32))[0] == 0.5

    @pytest.mark.skipif(not REF_WAVS, reason="reference corpus not mounted")
    def test_reads_reference_corpus(self):
        samples, sr = adio.read_wav(REF_WAVS[0])
        assert sr == 8000
        assert samples.shape[0] == 1
        assert np.abs(samples).max() <= 1.0


class TestCacheAndStream:
    @pytest.mark.skipif(not REF_WAVS, reason="reference corpus not mounted")
    def test_cache_and_random_crop(self):
        cache = adio.AudioCache(seed=0)
        crop, sr = cache.random_crop(REF_WAVS[0], 4000)
        assert crop.shape[-1] == 4000 and sr == 8000
        # short-file tiling
        crop2, _ = cache.random_crop(REF_WAVS[0], 10 ** 6)
        assert crop2.shape[-1] == 10 ** 6
        assert len(cache) == 1

    def test_buffer_stream_rechunks_with_residue(self, rng):
        pieces = [(rng.standard_normal((1, n)).astype(np.float32), 8000)
                  for n in (300, 500, 900, 100)]
        outs = list(adio.buffer_stream(iter(pieces), 400))
        assert len(outs) == 4  # 1800 samples -> 4 x 400 (+200 dropped)
        for s, sr in outs:
            assert s.shape == (1, 400) and sr == 8000
        ref = np.concatenate([p[0] for p in pieces], -1)
        got = np.concatenate([o[0] for o in outs], -1)
        np.testing.assert_array_equal(got, ref[:, :1600])

    def test_combine_audio_clips(self):
        a = (np.full((1, 10), 0.8, np.float32), 8000)
        b = (np.full((1, 10), 0.8, np.float32), 8000)
        mixed, sr = adio.combine_audio(a, b)
        assert mixed.max() == 1.0


class TestStreamEngine:
    def test_admission_eviction_and_isolation(self, rng):
        model, params = _model()
        eng = StreamEngine(FAST_CFG, model, params, mode="fast", max_streams=4)
        eng.add_stream("a")
        eng.add_stream("b")
        hop = FAST_CFG.dsp.hop_length

        chunk = rng.standard_normal(hop).astype(np.float32) * 0.1
        silent = np.zeros(hop, np.float32)
        for _ in range(4):
            out = eng.process({"a": chunk, "b": silent})
        # stream state is isolated: active signal vs silence differ
        assert np.abs(out["a"]).max() > np.abs(out["b"]).max()

        eng.remove_stream("a")
        assert eng.active_streams == 1
        eng.add_stream("c")  # slot reuse resets state: identical to a
        out_c = eng.process({"c": silent})["c"]
        fresh = StreamEngine(FAST_CFG, model, params, mode="fast",
                             max_streams=4)
        fresh.add_stream("z")
        out_z = fresh.process({"z": silent})["z"]
        np.testing.assert_allclose(out_c, out_z, atol=1e-6)

        eng.add_stream("d")
        eng.add_stream("e")
        with pytest.raises(RuntimeError):
            eng.add_stream("overflow")

    def test_fast_step_streaming_identity_property(self, rng):
        """With no model edit (zero residual impossible; instead feed
        silence), the fast path must stay bounded and causal: output depends
        only on past input."""
        model, params = _model()
        step = jax.jit(make_fast_step(FAST_CFG, model))
        state = fast_init_state(FAST_CFG, model, 2)
        hop = FAST_CFG.dsp.hop_length
        x1 = rng.standard_normal((2, hop)).astype(np.float32) * 0.1
        state1, y1 = step(params, state, jnp.asarray(x1))
        # same prefix -> same output regardless of future input
        state_b = fast_init_state(FAST_CFG, model, 2)
        state2, y2 = step(params, state_b, jnp.asarray(x1))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)

    def test_nonfinite_ingress_is_sanitized(self, rng):
        """A chunk carrying NaN/Inf must not poison the slot's recurrent
        state: the engine neutralizes non-finite samples to 0 at ingress
        (in-jit), so the tick behaves exactly as if those samples were
        silence and the stream keeps serving clean audio afterwards."""
        model, params = _model()
        hop = FAST_CFG.dsp.hop_length
        eng = StreamEngine(FAST_CFG, model, params, mode="fast",
                           max_streams=2)
        ref = StreamEngine(FAST_CFG, model, params, mode="fast",
                           max_streams=2)
        for e in (eng, ref):
            e.add_stream("a")
            e.add_stream("b")

        poisoned = rng.standard_normal(hop).astype(np.float32) * 0.1
        cleaned = poisoned.copy()
        poisoned[::7] = np.nan
        poisoned[3::11] = np.inf
        poisoned[5::13] = -np.inf
        cleaned[::7] = 0.0
        cleaned[3::11] = 0.0
        cleaned[5::13] = 0.0
        clean_b = rng.standard_normal(hop).astype(np.float32) * 0.1

        out = eng.process({"a": poisoned, "b": clean_b})
        out_ref = ref.process({"a": cleaned, "b": clean_b})
        for sid in ("a", "b"):
            assert np.isfinite(out[sid]).all()
            np.testing.assert_allclose(out[sid], out_ref[sid], atol=1e-6)
        # the stream RECOVERS: subsequent clean ticks match the
        # never-poisoned engine exactly (state was not corrupted)
        for _ in range(3):
            chunk = rng.standard_normal(hop).astype(np.float32) * 0.1
            out = eng.process({"a": chunk, "b": clean_b})
            out_ref = ref.process({"a": chunk, "b": clean_b})
            np.testing.assert_allclose(out["a"], out_ref["a"], atol=1e-6)
        assert all(np.isfinite(leaf).all()
                   for leaf in jax.tree_util.tree_leaves(eng.state))

    def test_webrtc_mode_engine(self, rng):
        model, params = _model()
        cfg = Config(dsp=DSPConfig(n_fft=1024, hop_length=512, n_mels=64,
                                   reconstruction="griffin_lim",
                                   griffin_lim_iters=2),
                     serving=ServingConfig(max_streams=2, chunk_samples=512))
        eng = StreamEngine(cfg, model, params, mode="webrtc", max_streams=2)
        eng.add_stream("s")
        out = eng.process({"s": rng.standard_normal(512).astype(np.float32)})
        assert out["s"].shape == (512,)


class TestMeshServing:
    def test_sharded_step_matches_single_device(self, rng):
        """8-virtual-device mesh: sharded fast step must equal the
        single-device result (multi-chip correctness without a pod)."""
        model, params = _model()
        step = make_fast_step(FAST_CFG, model)
        n, hop = 16, FAST_CFG.dsp.hop_length

        state = fast_init_state(FAST_CFG, model, n)
        chunk = jnp.asarray(rng.standard_normal((n, hop)).astype(np.float32))
        ref_state, ref_out = jax.jit(step)(params, state, chunk)

        mesh = make_mesh(8)
        sharded = shard_engine_step(step, mesh)
        state2 = shard_pytree_batch(mesh, fast_init_state(FAST_CFG, model, n))
        chunk2 = shard_pytree_batch(mesh, chunk)
        new_state, out = sharded(params, state2, chunk2)

        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new_state.hx),
                                   np.asarray(ref_state.hx),
                                   atol=1e-5, rtol=1e-5)
        # output really is sharded over the mesh
        assert len(out.sharding.device_set) == 8


class TestEngineSnapshot:
    def test_snapshot_restore_resumes_stream(self, rng):
        """Kill-and-restore: a new engine restored from a snapshot
        continues streams bit-exactly (SURVEY §5 failure recovery)."""
        import jax.numpy as jnp
        from audio_denoising_tpu.config import PRESETS
        from audio_denoising_tpu.models import build_model
        from audio_denoising_tpu.compat.npz_store import load_params_npz
        import os
        here = os.path.dirname(os.path.abspath(__file__))
        cfg = PRESETS["gruunet2-good"]
        model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
        raw, _ = load_params_npz(os.path.join(here, "..", "checkpoints",
                                              "gruunet2-good.npz"))
        params = {k: jnp.asarray(v) for k, v in raw.items()}
        from audio_denoising_tpu.runtime.engine import StreamEngine

        eng = StreamEngine(cfg, model, params, max_streams=2)
        eng.add_stream("a")
        hop = cfg.dsp.hop_length
        chunk = {"a": (0.1 * rng.standard_normal(hop)).astype(np.float32)}
        eng.process(chunk)
        snap = eng.snapshot()

        # diverge the original, then bring up a fresh engine from snapshot
        next_chunk = {"a": (0.1 * rng.standard_normal(hop))
                      .astype(np.float32)}
        out_orig = eng.process(next_chunk)

        eng2 = StreamEngine(cfg, model, params, max_streams=2)
        eng2.restore(snap)
        out_restored = eng2.process(next_chunk)
        np.testing.assert_array_equal(out_orig["a"], out_restored["a"])

    def test_restore_rejects_mode_mismatch(self, rng):
        import jax.numpy as jnp
        from audio_denoising_tpu.config import PRESETS
        from audio_denoising_tpu.models import build_model
        cfg = PRESETS["gruunet2-good"]
        model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
        params = model.init(jax.random.PRNGKey(0))
        from audio_denoising_tpu.runtime.engine import StreamEngine
        eng = StreamEngine(cfg, model, params, max_streams=1)
        snap = eng.snapshot()
        snap["mode"] = "webrtc"
        with pytest.raises(ValueError):
            eng.restore(snap)


class TestMeshEngine:
    def test_engine_sharded_over_mesh_matches_single(self, rng):
        """StreamEngine(mesh=...) shards slots over 8 devices and matches
        the single-device engine numerically."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh
        from audio_denoising_tpu.config import PRESETS
        from audio_denoising_tpu.models import build_model
        from audio_denoising_tpu.runtime.engine import StreamEngine
        cfg = PRESETS["gruunet2-good"]
        model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
        params = model.init(jax.random.PRNGKey(0))
        mesh = Mesh(np.asarray(jax.devices()), ("streams",))

        e1 = StreamEngine(cfg, model, params, max_streams=16)
        e2 = StreamEngine(cfg, model, params, max_streams=16, mesh=mesh)
        for e in (e1, e2):
            e.add_stream("a")
            e.add_stream("b")
        hop = cfg.dsp.hop_length
        chunks = {"a": (0.1 * rng.standard_normal(hop)).astype(np.float32),
                  "b": (0.1 * rng.standard_normal(hop)).astype(np.float32)}
        o1 = e1.process(dict(chunks))
        o2 = e2.process(dict(chunks))
        np.testing.assert_allclose(o1["a"], o2["a"], atol=1e-6)
        np.testing.assert_allclose(o1["b"], o2["b"], atol=1e-6)

    def test_mesh_fused_constructs(self):
        """mesh + fused composes via shard_map (kernel execution is
        covered in test_fused_hop with interpret mode)."""
        import jax
        from jax.sharding import Mesh
        from audio_denoising_tpu.config import PRESETS
        from audio_denoising_tpu.models import build_model
        from audio_denoising_tpu.runtime.engine import StreamEngine
        cfg = PRESETS["gruunet2-good"]
        model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
        params = model.init(jax.random.PRNGKey(0))
        mesh = Mesh(np.asarray(jax.devices()), ("streams",))
        eng = StreamEngine(cfg, model, params, mode="fused", max_streams=16,
                           mesh=mesh)
        assert eng.mode == "fused" and eng.mesh is mesh


class TestMomo3StreamingDelta:
    def test_fast_step_persists_delta_carry(self, rng):
        """Regression: the fast serving path must carry MOMO3's prev frame
        across hops (delta feature), matching an offline run over the same
        frames."""
        import jax
        import jax.numpy as jnp
        from audio_denoising_tpu.hub import load_pretrained
        from audio_denoising_tpu.runtime.engine import (
            fast_init_state, make_fast_step)
        cfg, model, params = load_pretrained("momo3-4d4ea0")
        step = jax.jit(make_fast_step(cfg, model))
        B, hop = 2, cfg.dsp.hop_length
        state = fast_init_state(cfg, model, B)
        assert isinstance(state.hx, tuple), "carry must include prev"
        prevs = [np.asarray(state.hx[1])]
        for _ in range(3):
            chunk = jnp.asarray(0.1 * rng.standard_normal((B, hop)),
                                jnp.float32)
            state, out = step(params, state, chunk)
            assert np.all(np.isfinite(np.asarray(out)))
            prevs.append(np.asarray(state.hx[1]))
        # prev actually advances each hop (nonzero after first real frame)
        assert not np.allclose(prevs[1], prevs[2])
        assert np.abs(prevs[-1]).max() > 0

    def test_plan_model_cell_delta_carry(self, rng):
        import jax.numpy as jnp
        from audio_denoising_tpu.hub import load_pretrained
        from audio_denoising_tpu.runtime.plan import PlanModel
        cfg, model, params = load_pretrained("momo3-4d4ea0")
        pm = PlanModel(model, params)
        carry = pm.init_carry(2)
        x = jnp.asarray(rng.standard_normal((2, 22)), jnp.float32)
        y1, carry = pm.cell(None, x, carry)
        y2, carry = pm.cell(None, x, carry)
        # identical input, but prev changed -> delta changed -> y differs
        assert not np.allclose(np.asarray(y1), np.asarray(y2))
        # matches the real model cell trajectory
        mc = (model.init_state(2), jnp.zeros((2, 22)))
        z1, mc = model.cell(params, x, mc)
        z2, mc = model.cell(params, x, mc)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(z2),
                                   atol=1e-5)


class TestWav8Bit:
    def test_8bit_wav_is_unsigned(self, tmp_path):
        """Regression: WAV 8-bit PCM is unsigned with a 128 offset —
        silence must decode to 0.0, not -1.0."""
        import wave
        path = str(tmp_path / "u8.wav")
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            # silence (0x80), full positive (0xFF), full negative (0x00)
            w.writeframes(bytes([0x80] * 10 + [0xFF] + [0x00]))
        from audio_denoising_tpu.io.wavio import read_wav
        s, sr = read_wav(path)
        np.testing.assert_allclose(s[0, :10], 0.0, atol=1e-7)
        assert s[0, 10] > 0.9 and s[0, 11] <= -0.99


class TestRateFilter:
    def test_random_crop_from_raises_on_no_match(self, tmp_path, rng):
        from audio_denoising_tpu.io.wavio import write_wav
        from audio_denoising_tpu.io.cache import AudioCache
        p = str(tmp_path / "a.wav")
        write_wav(p, (0.1 * rng.standard_normal(4000))[None]
                  .astype(np.float32), 48000)
        cache = AudioCache()
        with pytest.raises(ValueError):
            cache.random_crop_from([p], 1000, sample_rate=16000)
        # matching rate works and probes via header (no decode needed)
        crop, sr = cache.random_crop_from([p], 1000, sample_rate=48000)
        assert crop.shape[-1] == 1000 and sr == 48000
