"""W8A8 quantized serving plan (runtime/quant.py) vs the fp32 plan."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_denoising_tpu.hub import load_pretrained
from audio_denoising_tpu.runtime.plan import PlanModel, build_cell_plan, plan_cell
from audio_denoising_tpu.runtime.quant import (
    plan_apply_parallel_q, plan_cell_q, qdot, quantize_mat, quantize_plan)


@pytest.fixture(scope="module")
def setup():
    cfg, model, params = load_pretrained("gruunet2-good")
    plan = build_cell_plan(model, params)
    return cfg, model, params, plan


class TestQuantMat:
    def test_qdot_relative_error(self, rng):
        """Per-column weight scales + dynamic row scales bound each
        matmul's relative error near the 1/127 quantization step."""
        m = jnp.asarray(rng.standard_normal((64, 48)) *
                        rng.uniform(0.01, 10, (1, 48)), jnp.float32)
        qm = quantize_mat(m)
        assert qm.q.dtype == jnp.int8
        x = jnp.asarray(rng.standard_normal((8, 64)) * 3.0, jnp.float32)
        exact = x @ m
        approx = qdot(x, qm)
        rel = float(jnp.linalg.norm(approx - exact)
                    / jnp.linalg.norm(exact))
        assert rel < 0.02, rel

    def test_zero_column_and_zero_row(self):
        m = jnp.zeros((8, 4), jnp.float32)
        qm = quantize_mat(m)
        x = jnp.zeros((2, 8), jnp.float32)
        np.testing.assert_array_equal(np.asarray(qdot(x, qm)),
                                      np.zeros((2, 4)))


class TestQuantPlan:
    def test_cell_agreement_over_rollout(self, setup, rng):
        """50-frame rollout: per-frame output agreement stays above
        20 dB and the recurrent state does NOT accumulate error (the
        GRU gating bounds it — measured ~36 dB after 50 frames)."""
        cfg, model, params, plan = setup
        qplan = quantize_plan(plan)
        B = 4
        n = plan.hidden * plan.compressed
        hx = hq = jnp.zeros((B, n), jnp.float32)
        cf = jax.jit(lambda x, h: plan_cell(plan, x, h))
        cq = jax.jit(lambda x, h: plan_cell_q(qplan, x, h))
        worst = np.inf
        for _ in range(50):
            x = jnp.asarray(np.abs(rng.standard_normal((B, 64))) * 1.5,
                            jnp.float32)
            y0, hx = cf(x, hx)
            y1, hq = cq(x, hq)
            num = float(jnp.sum((y0 - y1) ** 2))
            den = float(jnp.sum(y0 ** 2))
            worst = min(worst, 10 * np.log10(den / max(num, 1e-20)))
        assert worst > 20.0, worst
        hx_err = float(jnp.sum((hx - hq) ** 2))
        hx_ref = float(jnp.sum(hx ** 2))
        assert 10 * np.log10(hx_ref / max(hx_err, 1e-20)) > 25.0

    def test_sequence_path_matches_cell(self, setup, rng):
        """plan_apply_parallel_q (encoder/decoder lifted out of the scan)
        is frame-exact vs scanning plan_cell_q — per-row dynamic scales
        make the lift semantics-preserving."""
        cfg, model, params, plan = setup
        qplan = quantize_plan(plan)
        B, T = 2, 6
        n = plan.hidden * plan.compressed
        x = jnp.asarray(np.abs(rng.standard_normal((B, T, 64))) * 1.5,
                        jnp.float32)
        hx0 = jnp.zeros((B, n), jnp.float32)
        y_seq, hx_seq = plan_apply_parallel_q(qplan, x, hx0)
        hx = hx0
        for t in range(T):
            y_t, hx = plan_cell_q(qplan, x[:, t], hx)
            np.testing.assert_allclose(np.asarray(y_seq[:, t]),
                                       np.asarray(y_t), atol=1e-5)
        np.testing.assert_allclose(np.asarray(hx_seq), np.asarray(hx),
                                   atol=1e-5)

    def test_planmodel_quantized_interface(self, setup, rng):
        """PlanModel(quantized=True) exposes the standard model surface
        and rejects the (unimplemented) fused composition."""
        cfg, model, params, plan = setup
        pm = PlanModel(model, params, quantized=True)
        x = jnp.asarray(np.abs(rng.standard_normal((2, 5, 64))) * 1.5,
                        jnp.float32)
        y, hx = pm.apply(None, x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()
        # sequence output must agree with the fp32 PlanModel closely
        y0, _ = PlanModel(model, params).apply(None, x)
        den = float(jnp.sum(y0 ** 2))
        num = float(jnp.sum((y - y0) ** 2))
        assert 10 * np.log10(den / max(num, 1e-20)) > 20.0
        with pytest.raises(ValueError, match="fused"):
            PlanModel(model, params, quantized=True, fused=True)

    def test_momo3_delta_quant(self, rng):
        from audio_denoising_tpu.runtime.plan import build_cell_plan_momo
        cfg, model, params = load_pretrained("momo3-4d4ea0")
        plan = build_cell_plan_momo(model, params)
        qplan = quantize_plan(plan)
        assert qplan.delta
        B, F = 2, model.num_bins
        n = plan.hidden * plan.compressed
        hx = jnp.zeros((B, n), jnp.float32)
        x = jnp.asarray(np.abs(rng.standard_normal((B, F))) * 1.5,
                        jnp.float32)
        prev = jnp.asarray(np.abs(rng.standard_normal((B, F))) * 1.5,
                           jnp.float32)
        y0, _ = plan_cell(plan, x, hx, prev)
        y1, _ = plan_cell_q(qplan, x, hx, prev)
        den = float(jnp.sum(y0 ** 2))
        num = float(jnp.sum((y0 - y1) ** 2))
        assert 10 * np.log10(den / max(num, 1e-20)) > 20.0


class TestEngineInt8:
    def test_engine_fast_int8_serving(self, setup, rng):
        """serving.dtype='int8' + mode 'fast': the engine swaps the zoo
        model for the quantized plan; output closely tracks the fp32
        engine over a multi-tick stream."""
        import dataclasses
        from audio_denoising_tpu.runtime.engine import StreamEngine
        cfg, model, params, plan = setup
        cfg8 = dataclasses.replace(cfg, serving=dataclasses.replace(
            cfg.serving, dtype="int8"))
        e_fp = StreamEngine(cfg, model, params, mode="fast", max_streams=2)
        e_q = StreamEngine(cfg8, model, params, mode="fast", max_streams=2)
        e_fp.add_stream("a")
        e_q.add_stream("a")
        hop = cfg.dsp.hop_length
        outs_fp, outs_q = [], []
        for t in range(20):
            chunk = (0.1 * rng.standard_normal(hop)).astype(np.float32)
            outs_fp.append(e_fp.process({"a": chunk})["a"])
            outs_q.append(e_q.process({"a": chunk})["a"])
        a = np.concatenate(outs_fp)[2 * hop:]
        b = np.concatenate(outs_q)[2 * hop:]
        agree = 10 * np.log10(np.sum(a ** 2)
                              / max(np.sum((a - b) ** 2), 1e-20))
        assert agree > 20.0, agree

    def test_engine_fused_int8_serves_fused(self, setup, rng):
        """serving.dtype='int8' + mode 'fused' keeps the one-kernel W8A8
        hop (on-chip Mosaic lowering validated round 4,
        tools/validate_int8_fused.py: 33 dB vs fp32) and closely tracks
        the fp32 fused engine over a multi-tick stream."""
        import dataclasses
        from audio_denoising_tpu.runtime.engine import StreamEngine
        cfg, model, params, plan = setup
        cfg8 = dataclasses.replace(cfg, serving=dataclasses.replace(
            cfg.serving, dtype="int8"))
        e_fp = StreamEngine(cfg, model, params, mode="fused",
                            max_streams=2, pallas_interpret=True)
        e_q = StreamEngine(cfg8, model, params, mode="fused",
                           max_streams=2, pallas_interpret=True)
        assert e_q.mode == "fused"
        e_fp.add_stream("a")
        e_q.add_stream("a")
        hop = cfg.dsp.hop_length
        outs_fp, outs_q = [], []
        for t in range(12):
            chunk = (0.1 * rng.standard_normal(hop)).astype(np.float32)
            outs_fp.append(e_fp.process({"a": chunk})["a"])
            outs_q.append(e_q.process({"a": chunk})["a"])
        a = np.concatenate(outs_fp)[2 * hop:]
        b = np.concatenate(outs_q)[2 * hop:]
        agree = 10 * np.log10(np.sum(a ** 2)
                              / max(np.sum((a - b) ** 2), 1e-20))
        assert agree > 20.0, agree

    def test_engine_webrtc_int8_downgrades(self, setup):
        """Modes without an int8 kernel variant (webrtc) still downgrade
        to the quantized op-by-op 'fast' path rather than serving a
        misinterpreted dtype."""
        import dataclasses
        import warnings
        from audio_denoising_tpu.runtime.engine import StreamEngine
        cfg, model, params, plan = setup
        cfg8 = dataclasses.replace(cfg, serving=dataclasses.replace(
            cfg.serving, dtype="int8"))
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            eng = StreamEngine(cfg8, model, params, mode="webrtc",
                               max_streams=2, pallas_interpret=True)
        assert eng.mode == "fast"
        assert any("int8" in str(x.message) for x in w)
