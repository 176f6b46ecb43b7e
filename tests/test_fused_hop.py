"""One-kernel fused serving hop vs the op-by-op fast step (CPU interpret
mode; the same kernel compiles on TPU)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_denoising_tpu.config import Config, DSPConfig, ModelConfig, ServingConfig
from audio_denoising_tpu.models import build_model
from audio_denoising_tpu.ops.pallas.fused_hop import (
    FusedHopState, fused_hop_init_state, make_fused_hop)
from audio_denoising_tpu.runtime.engine import fast_init_state, make_fast_step
from audio_denoising_tpu.runtime.plan import build_cell_plan

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        dsp=DSPConfig(sample_rate=16000, n_fft=640, hop_length=320,
                      n_mels=64, reconstruction="phase"),
        model=ModelConfig(arch="GRUUNet2"),
        serving=ServingConfig(state_decay=0.9, output_gain=3.0))
    model = build_model(cfg.model, num_bins=64)
    from audio_denoising_tpu.compat.npz_store import load_params_npz
    raw, _ = load_params_npz(os.path.join(REPO, "checkpoints",
                                          "gruunet2-good.npz"))
    params = {k: jnp.asarray(v) for k, v in raw.items()}
    plan = build_cell_plan(model, params)
    return cfg, model, params, plan


class TestFusedHop:
    def test_matches_fast_step(self, setup, rng):
        cfg, model, params, plan = setup
        B, hop = 4, cfg.dsp.hop_length
        fast = make_fast_step(cfg, model)
        fused = make_fused_hop(cfg, plan, interpret=True)

        s0 = fast_init_state(cfg, model, B)
        s1 = fused_hop_init_state(cfg, plan, B)
        for t in range(5):
            chunk = jnp.asarray(0.1 * rng.standard_normal((B, hop)),
                                jnp.float32)
            s0, out0 = fast(params, s0, chunk)
            s1, out1 = fused(s1, chunk)
            np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                                       atol=2e-4)
            np.testing.assert_allclose(
                np.asarray(s0.hx).reshape(B, -1), np.asarray(s1.hx),
                atol=2e-5)

    def test_batch_padding(self, setup, rng):
        cfg, model, params, plan = setup
        B, hop = 3, cfg.dsp.hop_length
        fused = make_fused_hop(cfg, plan, interpret=True)
        s = fused_hop_init_state(cfg, plan, B)
        chunk = jnp.asarray(0.1 * rng.standard_normal((B, hop)), jnp.float32)
        s, out = fused(s, chunk)
        assert out.shape == (B, hop)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_bf16_compute_dtype_bounded(self, setup, rng):
        """ServingConfig.dtype='bfloat16' variant: matrices bf16, state
        fp32. On a real chip this doubles MXU rate and halves weight
        VMEM; parity vs the fp32 kernel is bounded here (bf16 carries ~8
        mantissa bits -> ~4e-3 relative through the DFT/mel/cell chain)."""
        cfg, model, params, plan = setup
        B, hop = 4, cfg.dsp.hop_length
        f32 = make_fused_hop(cfg, plan, interpret=True)
        b16 = make_fused_hop(cfg, plan, interpret=True,
                             compute_dtype=jnp.bfloat16)
        s1 = fused_hop_init_state(cfg, plan, B)
        s2 = fused_hop_init_state(cfg, plan, B)
        worst = 0.0
        for t in range(4):
            chunk = jnp.asarray(0.1 * rng.standard_normal((B, hop)),
                                jnp.float32)
            s1, o1 = f32(s1, chunk)
            s2, o2 = b16(s2, chunk)
            scale = max(float(np.abs(np.asarray(o1)).max()), 1e-3)
            worst = max(worst, float(
                np.abs(np.asarray(o1) - np.asarray(o2)).max()) / scale)
        assert worst < 5e-2, worst
        # hidden state stays bounded too (it feeds the recurrence)
        np.testing.assert_allclose(np.asarray(s1.hx), np.asarray(s2.hx),
                                   atol=5e-2)

    def test_dft_matrices(self, rng):
        from audio_denoising_tpu.ops.pallas.fused_hop import _dft_matrices
        N = 640
        CF, SF, IC, IS = _dft_matrices(N)
        x = rng.standard_normal(N).astype(np.float32)
        X = np.fft.rfft(x)
        np.testing.assert_allclose(x @ CF, X.real, atol=1e-2)
        np.testing.assert_allclose(x @ SF, X.imag, atol=1e-2)
        back = X.real.astype(np.float32) @ IC + X.imag.astype(np.float32) @ IS
        np.testing.assert_allclose(back, x, atol=1e-5)


class TestFusedEngineMode:
    def test_engine_fused_mode(self, setup, rng):
        """StreamEngine mode='fused' serves through the one-kernel hop.
        (CPU compiles the Mosaic kernel via the interpret-free path only on
        TPU; here we verify the mode wiring with interpret monkeypatch.)"""
        cfg, model, params, plan = setup
        import audio_denoising_tpu.ops.pallas.fused_hop as fh
        orig = fh.make_fused_hop
        try:
            fh.make_fused_hop = lambda c, p, **kw: orig(c, p, interpret=True)
            from audio_denoising_tpu.runtime.engine import StreamEngine
            eng = StreamEngine(cfg, model, params, mode="fused",
                               max_streams=2, jit=False)
            eng.add_stream("s")
            hop = cfg.dsp.hop_length
            out = eng.process(
                {"s": (0.1 * rng.standard_normal(hop)).astype(np.float32)})
            assert out["s"].shape == (hop,)
            assert np.all(np.isfinite(out["s"]))
        finally:
            fh.make_fused_hop = orig


class TestResidentMultiHop:
    def test_matches_sequential_single_hops(self, setup, rng):
        """K hops in one pallas_call (state resident in VMEM scratch
        across grid steps) == K sequential single-hop calls, bit-exact."""
        cfg, model, params, plan = setup
        from audio_denoising_tpu.ops.pallas.fused_hop import (
            fused_hop_init_state, make_fused_hop)
        B, K, hop = 3, 4, cfg.dsp.hop_length
        single = make_fused_hop(cfg, plan, interpret=True)
        multi = make_fused_hop(cfg, plan, interpret=True, hops_per_call=K)
        chunks = jnp.asarray(0.1 * rng.standard_normal((K, B, hop)),
                             jnp.float32)
        s = fused_hop_init_state(cfg, plan, B)
        s1, outs1 = s, []
        for t in range(K):
            s1, o = single(s1, chunks[t])
            outs1.append(np.asarray(o))
        s2, outs2 = multi(s, chunks)
        np.testing.assert_array_equal(np.stack(outs1), np.asarray(outs2))
        np.testing.assert_array_equal(np.asarray(s1.hx), np.asarray(s2.hx))
        np.testing.assert_array_equal(np.asarray(s1.ring),
                                      np.asarray(s2.ring))
        np.testing.assert_array_equal(np.asarray(s1.ola),
                                      np.asarray(s2.ola))

    def test_wrong_hop_count_asserts(self, setup, rng):
        cfg, model, params, plan = setup
        from audio_denoising_tpu.ops.pallas.fused_hop import (
            fused_hop_init_state, make_fused_hop)
        multi = make_fused_hop(cfg, plan, interpret=True, hops_per_call=4)
        s = fused_hop_init_state(cfg, plan, 2)
        bad = jnp.zeros((3, 2, cfg.dsp.hop_length))
        with pytest.raises(AssertionError):
            multi(s, bad)


class TestShardedFusedHop:
    def test_sharded_matches_single(self, setup, rng):
        import jax
        from jax.sharding import Mesh
        from audio_denoising_tpu.ops.pallas.fused_hop import (
            fused_hop_init_state, make_fused_hop, make_fused_hop_sharded)
        cfg, model, params, plan = setup
        mesh = Mesh(np.asarray(jax.devices()), ("streams",))
        single = make_fused_hop(cfg, plan, interpret=True, block_b=8)
        sharded = jax.jit(make_fused_hop_sharded(cfg, plan, mesh,
                                                 interpret=True, block_b=8))
        B, hop = 16, cfg.dsp.hop_length
        s = fused_hop_init_state(cfg, plan, B)
        chunk = jnp.asarray(0.1 * rng.standard_normal((B, hop)), jnp.float32)
        s1, o1 = single(s, chunk)
        s2, o2 = sharded(s, chunk)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(s1.hx), np.asarray(s2.hx),
                                   atol=1e-6)

    def test_engine_fused_mesh_mode(self, setup, rng):
        import jax
        from jax.sharding import Mesh
        import audio_denoising_tpu.ops.pallas.fused_hop as fh
        cfg, model, params, plan = setup
        mesh = Mesh(np.asarray(jax.devices()), ("streams",))
        orig = fh.make_fused_hop
        try:
            fh.make_fused_hop = lambda c, p, **kw: orig(
                c, p, interpret=True,
                block_b=kw.get("block_b", 2),
                hops_per_call=kw.get("hops_per_call", 1))
            from audio_denoising_tpu.runtime.engine import StreamEngine
            eng = StreamEngine(cfg, model, params, mode="fused",
                               max_streams=16, mesh=mesh)
            eng.add_stream("s")
            hop = cfg.dsp.hop_length
            out = eng.process(
                {"s": (0.1 * rng.standard_normal(hop)).astype(np.float32)})
            assert out["s"].shape == (hop,)
            assert np.all(np.isfinite(out["s"]))
        finally:
            fh.make_fused_hop = orig


@pytest.fixture(scope="module")
def momo_setup():
    """MOMO3-4d4ea0: delta carry (hx, prev) + raw-spectrogram domain."""
    from audio_denoising_tpu.hub import load_pretrained
    from audio_denoising_tpu.runtime.plan import build_cell_plan_momo
    cfg, model, params = load_pretrained("momo3-4d4ea0")
    plan = build_cell_plan_momo(model, params)
    return cfg, model, params, plan


class TestFusedHopMomo3:
    def test_matches_fast_step(self, momo_setup, rng):
        """The fused hop with the delta carry must track make_fast_step on
        the shipped MOMO3 checkpoint (momo3.py:286-289 delta semantics)."""
        cfg, model, params, plan = momo_setup
        assert plan.delta
        B, hop = 4, cfg.dsp.hop_length
        fast = make_fast_step(cfg, model)
        fused = make_fused_hop(cfg, plan, interpret=True)
        s0 = fast_init_state(cfg, model, B)
        s1 = fused_hop_init_state(cfg, plan, B)
        assert s1.prev is not None and s1.prev.shape == (B, cfg.dsp.n_stft)
        for t in range(5):
            chunk = jnp.asarray(0.1 * rng.standard_normal((B, hop)),
                                jnp.float32)
            s0, out0 = fast(params, s0, chunk)
            s1, out1 = fused(s1, chunk)
            np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                                       atol=1e-5)
            hx0, prev0 = s0.hx
            np.testing.assert_allclose(
                np.asarray(hx0).reshape(B, -1), np.asarray(s1.hx),
                atol=1e-5)
            np.testing.assert_allclose(np.asarray(prev0),
                                       np.asarray(s1.prev), atol=1e-5)

    def test_resident_multi_hop_carries_prev(self, momo_setup, rng):
        """K hops in one pallas_call: the prev frame lives in VMEM scratch
        across grid steps and matches K sequential single hops."""
        cfg, model, params, plan = momo_setup
        B, K, hop = 3, 4, cfg.dsp.hop_length
        single = make_fused_hop(cfg, plan, interpret=True)
        multi = make_fused_hop(cfg, plan, interpret=True, hops_per_call=K)
        chunks = jnp.asarray(0.1 * rng.standard_normal((K, B, hop)),
                             jnp.float32)
        s = fused_hop_init_state(cfg, plan, B)
        s1, outs1 = s, []
        for t in range(K):
            s1, o = single(s1, chunks[t])
            outs1.append(np.asarray(o))
        s2, outs2 = multi(s, chunks)
        np.testing.assert_allclose(np.stack(outs1), np.asarray(outs2),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(s1.hx), np.asarray(s2.hx),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(s1.prev), np.asarray(s2.prev),
                                   atol=1e-6)

    def test_engine_fused_momo_masked_commit(self, momo_setup, rng):
        """StreamEngine mode='fused' dispatches the momo plan; masked
        commits must hold back BOTH hx and prev for slots without a chunk
        (per-stream determinism under load)."""
        cfg, model, params, plan = momo_setup
        import audio_denoising_tpu.ops.pallas.fused_hop as fh
        orig = fh.make_fused_hop
        try:
            fh.make_fused_hop = lambda c, p, **kw: orig(c, p, interpret=True)
            from audio_denoising_tpu.runtime.engine import StreamEngine
            eng = StreamEngine(cfg, model, params, mode="fused",
                               max_streams=4, jit=False)
            assert eng.state.prev is not None
            eng.add_stream("a")
            eng.add_stream("b")
            hop = cfg.dsp.hop_length
            chunk = (0.1 * rng.standard_normal(hop)).astype(np.float32)
            eng.process({"a": chunk, "b": chunk})
            prev_b = np.asarray(eng.state.prev[eng.slots["b"]]).copy()
            hx_b = np.asarray(eng.state.hx[eng.slots["b"]]).copy()
            # tick WITHOUT b: its carry must not move
            eng.process({"a": chunk})
            np.testing.assert_array_equal(
                np.asarray(eng.state.prev[eng.slots["b"]]), prev_b)
            np.testing.assert_array_equal(
                np.asarray(eng.state.hx[eng.slots["b"]]), hx_b)
        finally:
            fh.make_fused_hop = orig


class TestResidentKernelVariants:
    def test_hops_per_step_unroll_bit_exact(self, setup, rng):
        from audio_denoising_tpu.ops.pallas.fused_hop import (
            fused_hop_init_state, make_fused_hop)
        cfg, model, params, plan = setup
        B, K, hop = 3, 8, cfg.dsp.hop_length
        m1 = make_fused_hop(cfg, plan, interpret=True, hops_per_call=K)
        m2 = make_fused_hop(cfg, plan, interpret=True, hops_per_call=K,
                            hops_per_step=4)
        chunks = jnp.asarray(0.1 * rng.standard_normal((K, B, hop)),
                             jnp.float32)
        s = fused_hop_init_state(cfg, plan, B)
        s1, o1 = m1(s, chunks)
        s2, o2 = m2(s, chunks)
        # bit-exact on TPU; interpret mode reassociates fp32 at ~1e-7
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(s1.hx), np.asarray(s2.hx),
                                   atol=1e-6)

    def test_int16_pcm_boundary(self, setup, rng):
        """s16-in/s16-out variant == clip(f32 path) to 1 LSB (the clip is
        the reference's own int16 output semantic, app2.py:246-247)."""
        from audio_denoising_tpu.ops.pallas.fused_hop import (
            fused_hop_init_state, make_fused_hop)
        cfg, model, params, plan = setup
        B, K, hop = 3, 4, cfg.dsp.hop_length
        f32 = make_fused_hop(cfg, plan, interpret=True, hops_per_call=K)
        i16 = make_fused_hop(cfg, plan, interpret=True, hops_per_call=K,
                             io_dtype=jnp.int16)
        pcm = (np.clip(0.1 * rng.standard_normal((K, B, hop)), -1, 1)
               * 32767).astype(np.int16)
        s = fused_hop_init_state(cfg, plan, B)
        s1, o1 = f32(s, jnp.asarray(pcm.astype(np.float32) / 32768.0))
        s2, o2 = i16(s, jnp.asarray(pcm))
        assert o2.dtype == jnp.int16
        back = np.asarray(o2).astype(np.float32) / 32767.0
        np.testing.assert_allclose(np.clip(np.asarray(o1), -1, 1), back,
                                   atol=2.0 / 32767)
        np.testing.assert_array_equal(np.asarray(s1.hx), np.asarray(s2.hx))


class TestFusedHopGate:
    """In-kernel SNR gate (round 4): mode 'fused' keeps the clean-audio
    safety blend instead of downgrading to the op-by-op fast step
    (ops/noisefloor.py semantics; engine.make_fast_step is the oracle)."""

    def _gated_cfg(self, setup, estimator="floor"):
        import dataclasses
        cfg, model, params, plan = setup
        cfg = dataclasses.replace(cfg, serving=dataclasses.replace(
            cfg.serving, snr_gate_db=10.0, snr_gate_width_db=4.0,
            snr_gate_estimator=estimator))
        return cfg, model, params, plan

    def _bursty(self, rng, B, hop, t):
        # bursty tone + per-stream noise levels spreading alpha over (0,1);
        # minimum statistics needs non-stationary "speech" to ride above
        # the floor (a steady tone IS noise to the tracker)
        t_ax = np.arange(t * hop, (t + 1) * hop) / 16000.0
        base = (0.3 * np.sin(2 * np.pi * 440 * t_ax)
                * (1.0 if (t // 3) % 2 else 0.0))
        lv = np.array([0.001, 0.01, 0.1, 0.3])[:B, None]
        return jnp.asarray(base[None, :]
                           + lv * rng.standard_normal((B, hop)), jnp.float32)

    def test_matches_fast_step_gated(self, setup, rng):
        cfg, model, params, plan = self._gated_cfg(setup)
        B, hop = 4, cfg.dsp.hop_length
        fast = make_fast_step(cfg, model)
        fused = make_fused_hop(cfg, plan, interpret=True)
        s0 = fast_init_state(cfg, model, B)
        s1 = fused_hop_init_state(cfg, plan, B)
        assert s1.nf_floor is not None
        for t in range(12):
            chunk = self._bursty(rng, B, hop, t)
            s0, out0 = fast(params, s0, chunk)
            s1, out1 = fused(s1, chunk)
            np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                                       atol=3e-4)
        np.testing.assert_allclose(np.asarray(s0.nf_floor),
                                   np.asarray(s1.nf_floor),
                                   rtol=2e-4, atol=1e-9)
        np.testing.assert_allclose(np.asarray(s0.nf_total),
                                   np.asarray(s1.nf_total[:, 0]), rtol=2e-4)

    def test_resident_multi_hop_carries_floor(self, setup, rng):
        cfg, model, params, plan = self._gated_cfg(setup)
        B, K, hop = 4, 4, cfg.dsp.hop_length
        multi = make_fused_hop(cfg, plan, interpret=True, hops_per_call=K)
        single = make_fused_hop(cfg, plan, interpret=True)
        chunks = jnp.stack([self._bursty(rng, B, hop, t) for t in range(K)])
        s_m = s_s = fused_hop_init_state(cfg, plan, B)
        s_m, outs = multi(s_m, chunks)
        for k in range(K):
            s_s, out = single(s_s, chunks[k])
            np.testing.assert_allclose(np.asarray(outs[k]), np.asarray(out),
                                       atol=3e-4)
        np.testing.assert_allclose(np.asarray(s_m.nf_floor),
                                   np.asarray(s_s.nf_floor),
                                   rtol=2e-4, atol=1e-9)
        np.testing.assert_allclose(np.asarray(s_m.nf_total),
                                   np.asarray(s_s.nf_total), rtol=2e-4)

    def test_engine_fused_gated_no_downgrade_and_masked_commit(self, setup,
                                                               rng):
        """Engine mode 'fused' + gate: no downgrade warning, and the
        noise-floor planes obey the masked per-stream commit (a stream
        that misses a tick must not have its floor advanced)."""
        import warnings
        cfg, model, params, plan = self._gated_cfg(setup)
        import audio_denoising_tpu.ops.pallas.fused_hop as fh
        orig = fh.make_fused_hop
        try:
            fh.make_fused_hop = lambda c, p, **kw: orig(c, p, interpret=True)
            from audio_denoising_tpu.runtime.engine import StreamEngine
            with warnings.catch_warnings(record=True) as w:
                warnings.simplefilter("always")
                eng = StreamEngine(cfg, model, params, mode="fused",
                                   max_streams=2, jit=False)
            assert eng.mode == "fused"
            assert not any("snr_gate" in str(x.message) for x in w)
            hop = cfg.dsp.hop_length
            eng.add_stream("a")
            eng.add_stream("b")
            eng.process({"a": (0.1 * rng.standard_normal(hop)
                               ).astype(np.float32),
                         "b": (0.1 * rng.standard_normal(hop)
                               ).astype(np.float32)})
            floor_b = np.asarray(eng.state.nf_floor[eng.slots["b"]]).copy()
            eng.process({"a": (0.1 * rng.standard_normal(hop)
                               ).astype(np.float32)})
            np.testing.assert_array_equal(
                np.asarray(eng.state.nf_floor[eng.slots["b"]]), floor_b)
            assert not np.array_equal(
                np.asarray(eng.state.nf_floor[eng.slots["a"]]), floor_b)
        finally:
            fh.make_fused_hop = orig


class TestFusedHopGateRemoved:
    """In-kernel 'removed' (model-informed) estimator — the default gate
    estimator since round 4 session 4. Same oracle: engine.make_fast_step
    with the identical config."""

    def test_matches_fast_step_gated_removed(self, setup, rng):
        import dataclasses
        cfg, model, params, plan = setup
        cfg = dataclasses.replace(cfg, serving=dataclasses.replace(
            cfg.serving, snr_gate_db=4.0, snr_gate_width_db=3.0,
            snr_gate_estimator="removed"))
        B, hop = 4, cfg.dsp.hop_length
        fast = make_fast_step(cfg, model)
        fused = make_fused_hop(cfg, plan, interpret=True)
        s0 = fast_init_state(cfg, model, B)
        s1 = fused_hop_init_state(cfg, plan, B)
        assert s1.em_out is not None and s1.nf_floor is None
        t_all = TestFusedHopGate()
        for t in range(12):
            chunk = t_all._bursty(rng, B, hop, t)
            s0, out0 = fast(params, s0, chunk)
            s1, out1 = fused(s1, chunk)
            np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                                       atol=3e-4)
        np.testing.assert_allclose(np.asarray(s0.em_out),
                                   np.asarray(s1.em_out[:, 0]), rtol=2e-4)
        np.testing.assert_allclose(np.asarray(s0.em_rem),
                                   np.asarray(s1.em_rem[:, 0]), rtol=2e-4)

    def test_resident_multi_hop_carries_removed_state(self, setup, rng):
        import dataclasses
        cfg, model, params, plan = setup
        cfg = dataclasses.replace(cfg, serving=dataclasses.replace(
            cfg.serving, snr_gate_db=4.0, snr_gate_width_db=3.0,
            snr_gate_estimator="removed"))
        B, K, hop = 4, 4, cfg.dsp.hop_length
        multi = make_fused_hop(cfg, plan, interpret=True, hops_per_call=K)
        single = make_fused_hop(cfg, plan, interpret=True)
        t_all = TestFusedHopGate()
        chunks = jnp.stack([t_all._bursty(rng, B, hop, t)
                            for t in range(K)])
        s_m = s_s = fused_hop_init_state(cfg, plan, B)
        s_m, outs = multi(s_m, chunks)
        for k in range(K):
            s_s, out = single(s_s, chunks[k])
            np.testing.assert_allclose(np.asarray(outs[k]), np.asarray(out),
                                       atol=3e-4)
        np.testing.assert_allclose(np.asarray(s_m.em_out),
                                   np.asarray(s_s.em_out), rtol=2e-4)
        np.testing.assert_allclose(np.asarray(s_m.em_rem),
                                   np.asarray(s_s.em_rem), rtol=2e-4)

    def test_engine_fused_removed_masked_commit(self, setup, rng):
        """The em_* EMA planes obey the masked per-stream commit."""
        import dataclasses
        import warnings
        cfg, model, params, plan = setup
        cfg = dataclasses.replace(cfg, serving=dataclasses.replace(
            cfg.serving, snr_gate_db=4.0, snr_gate_width_db=3.0,
            snr_gate_estimator="removed"))
        import audio_denoising_tpu.ops.pallas.fused_hop as fh
        orig = fh.make_fused_hop
        try:
            fh.make_fused_hop = lambda c, p, **kw: orig(c, p, interpret=True)
            from audio_denoising_tpu.runtime.engine import StreamEngine
            with warnings.catch_warnings(record=True) as w:
                warnings.simplefilter("always")
                eng = StreamEngine(cfg, model, params, mode="fused",
                                   max_streams=2, jit=False)
            assert eng.mode == "fused"
            assert not any("snr_gate" in str(x.message) for x in w)
            hop = cfg.dsp.hop_length
            eng.add_stream("a")
            eng.add_stream("b")
            eng.process({"a": (0.1 * rng.standard_normal(hop)
                               ).astype(np.float32),
                         "b": (0.1 * rng.standard_normal(hop)
                               ).astype(np.float32)})
            em_b = np.asarray(eng.state.em_out[eng.slots["b"]]).copy()
            eng.process({"a": (0.1 * rng.standard_normal(hop)
                               ).astype(np.float32)})
            np.testing.assert_array_equal(
                np.asarray(eng.state.em_out[eng.slots["b"]]), em_b)
            assert not np.array_equal(
                np.asarray(eng.state.em_out[eng.slots["a"]]), em_b)
        finally:
            fh.make_fused_hop = orig


class TestFusedHopInt8:
    """W8A8 kernel variant (compute_dtype=int8): plan matmuls run the
    MXU's native int8 path with in-kernel dynamic activation scales
    (runtime/quant.qdot semantics); DSP matmuls stay bf16. Weight VMEM
    quarters vs fp32 — the wide-flagship plan (137 MB) drops to ~34 MB,
    inside the fused budget."""

    def test_agreement_vs_fp32_kernel(self, setup, rng):
        cfg, model, params, plan = setup
        B, hop = 4, cfg.dsp.hop_length
        f32 = make_fused_hop(cfg, plan, interpret=True)
        i8 = make_fused_hop(cfg, plan, interpret=True,
                            compute_dtype=jnp.int8)
        s0 = s1 = fused_hop_init_state(cfg, plan, B)
        worst = np.inf
        for _ in range(15):
            chunk = jnp.asarray(0.1 * rng.standard_normal((B, hop)),
                                jnp.float32)
            s0, o0 = f32(s0, chunk)
            s1, o1 = i8(s1, chunk)
            num = float(jnp.sum((o0 - o1) ** 2))
            den = float(jnp.sum(o0 ** 2))
            worst = min(worst, 10 * np.log10(den / max(num, 1e-20)))
        assert worst > 25.0, worst

    def test_multi_hop_matches_single(self, setup, rng):
        cfg, model, params, plan = setup
        B, K, hop = 3, 4, cfg.dsp.hop_length
        single = make_fused_hop(cfg, plan, interpret=True,
                                compute_dtype=jnp.int8)
        multi = make_fused_hop(cfg, plan, interpret=True,
                               compute_dtype=jnp.int8, hops_per_call=K)
        chunks = jnp.asarray(0.1 * rng.standard_normal((K, B, hop)),
                             jnp.float32)
        s = fused_hop_init_state(cfg, plan, B)
        sK, oK = multi(s, chunks)
        s1 = s
        for k in range(K):
            s1, ok = single(s1, chunks[k])
            np.testing.assert_allclose(np.asarray(oK[k]), np.asarray(ok),
                                       atol=1e-5)
        np.testing.assert_allclose(np.asarray(sK.hx), np.asarray(s1.hx),
                                   atol=1e-5)

    def test_momo3_delta_int8(self, momo_setup, rng):
        """Delta plans: level 0's split (x, prev) matmuls each quantize
        with their own row scales. The raw-domain delta family agrees
        less tightly than mel GRUUNets (~17 dB vs ~34: wider input
        dynamic range + small delta features) — int8 is a per-checkpoint
        serving choice, validated end-to-end by tools/eval_quant.py."""
        cfg, model, params, plan = momo_setup
        B, hop = 2, cfg.dsp.hop_length
        f32 = make_fused_hop(cfg, plan, interpret=True)
        i8 = make_fused_hop(cfg, plan, interpret=True,
                            compute_dtype=jnp.int8)
        s0 = s1 = fused_hop_init_state(cfg, plan, B)
        assert s0.prev is not None
        worst = np.inf
        for _ in range(10):
            chunk = jnp.asarray(0.1 * rng.standard_normal((B, hop)),
                                jnp.float32)
            s0, o0 = f32(s0, chunk)
            s1, o1 = i8(s1, chunk)
            num = float(jnp.sum((o0 - o1) ** 2))
            den = float(jnp.sum(o0 ** 2))
            worst = min(worst, 10 * np.log10(den / max(num, 1e-20)))
        assert worst > 15.0, worst


class TestFusedHopGateBoth:
    """Estimator 'both': the floor tracker vetoes the removed
    estimator's false-cleans (fixed FLOOR_VETO_* constants) while the
    config (gate, width) parameterize the removed decision. The fused
    kernel carries all five gate planes."""

    def _cfg(self, setup):
        import dataclasses
        cfg, model, params, plan = setup
        cfg = dataclasses.replace(cfg, serving=dataclasses.replace(
            cfg.serving, snr_gate_db=2.5, snr_gate_width_db=2.0,
            snr_gate_estimator="both"))
        return cfg, model, params, plan

    def test_matches_fast_step_gated_both(self, setup, rng):
        cfg, model, params, plan = self._cfg(setup)
        B, hop = 4, cfg.dsp.hop_length
        fast = make_fast_step(cfg, model)
        fused = make_fused_hop(cfg, plan, interpret=True)
        s0 = fast_init_state(cfg, model, B)
        s1 = fused_hop_init_state(cfg, plan, B)
        assert s1.em_out is not None and s1.nf_floor is not None
        t_all = TestFusedHopGate()
        for t in range(12):
            chunk = t_all._bursty(rng, B, hop, t)
            s0, out0 = fast(params, s0, chunk)
            s1, out1 = fused(s1, chunk)
            np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                                       atol=3e-4)
        np.testing.assert_allclose(np.asarray(s0.nf_floor),
                                   np.asarray(s1.nf_floor),
                                   rtol=2e-4, atol=1e-9)
        np.testing.assert_allclose(np.asarray(s0.em_out),
                                   np.asarray(s1.em_out[:, 0]), rtol=2e-4)

    def test_resident_multi_hop_carries_all_planes(self, setup, rng):
        cfg, model, params, plan = self._cfg(setup)
        B, K, hop = 4, 4, cfg.dsp.hop_length
        multi = make_fused_hop(cfg, plan, interpret=True, hops_per_call=K)
        single = make_fused_hop(cfg, plan, interpret=True)
        t_all = TestFusedHopGate()
        chunks = jnp.stack([t_all._bursty(rng, B, hop, t)
                            for t in range(K)])
        s_m = s_s = fused_hop_init_state(cfg, plan, B)
        s_m, outs = multi(s_m, chunks)
        for k in range(K):
            s_s, out = single(s_s, chunks[k])
            np.testing.assert_allclose(np.asarray(outs[k]), np.asarray(out),
                                       atol=3e-4)
        for leaf in ("nf_smooth", "nf_floor", "nf_total", "em_out",
                     "em_rem"):
            np.testing.assert_allclose(np.asarray(getattr(s_m, leaf)),
                                       np.asarray(getattr(s_s, leaf)),
                                       rtol=2e-4, atol=1e-9)

    def test_veto_blocks_false_clean(self, setup, rng):
        """A stream whose removed estimate reads clean but whose floor
        estimate reads noisy must stay denoised (alpha pinned high by
        the veto): force it by zeroing the model's suppression (identity
        plan output -> p_rem ~ 0 -> removed says +inf-clean) on a pure
        noise input the floor tracker reads correctly."""
        import dataclasses
        from audio_denoising_tpu.ops.noisefloor import (
            FLOOR_VETO_GATE_DB, FLOOR_VETO_WIDTH_DB, gate_alpha)
        # removed alone would fully pass through: snr_est = +big
        a_removed = gate_alpha(jnp.asarray([60.0]), 2.5, 2.0)
        assert float(a_removed[0]) == 0.0
        # the veto at a floor estimate of -2 dB (noisy) pins alpha to 1
        a_veto = gate_alpha(jnp.asarray([-2.0]), FLOOR_VETO_GATE_DB,
                            FLOOR_VETO_WIDTH_DB)
        assert float(a_veto[0]) == 1.0
        assert float(jnp.maximum(a_removed, a_veto)[0]) == 1.0
