"""Matrixized-cell plan + fused Pallas kernel parity tests (CPU; the
Pallas kernel runs in interpreter mode here and compiled on TPU)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_denoising_tpu.config import ModelConfig
from audio_denoising_tpu.models import build_model
from audio_denoising_tpu.runtime.plan import (
    CellPlan, PlanModel, build_cell_plan, plan_cell)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    from audio_denoising_tpu.compat.npz_store import load_params_npz
    params, _ = load_params_npz(os.path.join(REPO, "checkpoints", name))
    return {k: jnp.asarray(v) for k, v in params.items()}


@pytest.fixture(scope="module")
def model_and_params():
    model = build_model(ModelConfig(arch="GRUUNet2"), num_bins=64)
    return model, _load("gruunet2-good.npz")


class TestPlanParity:
    @pytest.mark.parametrize("ckpt", ["gruunet2-good.npz",
                                      "gruunet2-dari_tult.npz"])
    def test_cell_matches_model(self, ckpt, rng):
        model = build_model(ModelConfig(arch="GRUUNet2"), num_bins=64)
        params = _load(ckpt)
        plan = build_cell_plan(model, params)
        x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
        hx = jnp.asarray(rng.standard_normal((4, 17, 4)), jnp.float32)
        y0, h0 = model.cell(params, x, hx)
        y1, h1 = plan_cell(plan, x, hx.reshape(4, -1))
        # 5e-5: fp32 accumulation order differs (banded conv vs dense dot)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=5e-5)
        np.testing.assert_allclose(np.asarray(h0).reshape(4, -1),
                                   np.asarray(h1), atol=5e-5)

    def test_cell_matches_random_init(self, rng):
        model = build_model(ModelConfig(arch="GRUUNet2"), num_bins=64)
        params = model.init(jax.random.PRNGKey(7))
        plan = build_cell_plan(model, params)
        x = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
        hx = jnp.zeros((2, 17, 4), jnp.float32)
        y0, _ = model.cell(params, x, hx)
        y1, _ = plan_cell(plan, x, hx.reshape(2, -1))
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)

    def test_momo_config_geometry(self, rng):
        """Plan builder generalizes over config geometry (MOMO3's
        asymmetric paddings 22->11->5->3 exercise probe-based derivation)
        via the GRUUNet topology it shares."""
        cfg = ModelConfig(arch="GRUUNet2", num_compressed_bins=3,
                          hidden_sizes=(16, 16, 16), kernel_sizes=(3, 3, 3),
                          strides=(2, 2, 2), paddings=(1, 0, 1))
        model = build_model(cfg, num_bins=22)
        params = model.init(jax.random.PRNGKey(3))
        plan = build_cell_plan(model, params)
        x = jnp.asarray(rng.standard_normal((2, 22)), jnp.float32)
        hx = jnp.zeros((2, 16, 3), jnp.float32)
        y0, h0 = model.cell(params, x, hx)
        y1, h1 = plan_cell(plan, x, hx.reshape(2, -1))
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)

    def test_apply_sequence(self, model_and_params, rng):
        model, params = model_and_params
        pm = PlanModel(model, params)
        x = jnp.asarray(rng.standard_normal((3, 12, 64)), jnp.float32)
        y0, h0 = model.apply(params, x)
        y1, h1 = pm.apply(None, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(h0).reshape(3, -1),
                                   np.asarray(h1), atol=1e-4)

    @pytest.mark.parametrize("vpu_gate", [False, True])
    def test_parallel_apply_matches_scanned_cell(self, model_and_params,
                                                 rng, vpu_gate):
        """Encoder/decoder-lifted sequence mode == frame-by-frame cell."""
        from audio_denoising_tpu.runtime.plan import plan_apply_parallel
        model, params = model_and_params
        plan = build_cell_plan(model, params)
        x = jnp.asarray(rng.standard_normal((2, 9, 64)), jnp.float32)
        hx = jnp.asarray(0.1 * rng.standard_normal((2, 68)), jnp.float32)
        ys, h = [], hx
        for t in range(9):
            y, h = plan_cell(plan, x[:, t], h)
            ys.append(y)
        y0 = jnp.stack(ys, axis=1)
        y1, h1 = plan_apply_parallel(plan, x, hx, vpu_gate=vpu_gate)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h1), atol=1e-4)


class TestFusedKernel:
    def test_interpret_matches_plan(self, model_and_params, rng):
        model, params = model_and_params
        pm = PlanModel(model, params, fused=True, interpret=True)
        plan = pm.plan
        x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
        hx = jnp.asarray(rng.standard_normal((8, 68)), jnp.float32)
        y0, h0 = plan_cell(plan, x, hx)
        y1, h1 = pm._cell(x, hx)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-5)

    def test_batch_padding(self, model_and_params, rng):
        """B not a multiple of the tile: rows pad, outputs slice back."""
        model, params = model_and_params
        pm = PlanModel(model, params, fused=True, interpret=True)
        x = jnp.asarray(rng.standard_normal((5, 64)), jnp.float32)
        hx = jnp.zeros((5, 68), jnp.float32)
        y, h = pm._cell(x, hx)
        assert y.shape == (5, 64) and h.shape == (5, 68)
        y0, _ = plan_cell(pm.plan, x, hx)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y), atol=1e-5)

    def test_serving_step_with_plan_model(self, model_and_params, rng):
        """PlanModel drops into the serving pipeline unchanged."""
        from audio_denoising_tpu.config import PRESETS
        from audio_denoising_tpu.pipeline import make_server_step
        model, params = model_and_params
        cfg = PRESETS["gruunet2-good"]
        pm = PlanModel(model, params)
        step0 = jax.jit(make_server_step(cfg, model))
        step1 = jax.jit(make_server_step(cfg, pm))
        chunk = jnp.asarray(0.1 * rng.standard_normal((2, 2048)), jnp.float32)
        h0, y0 = step0(params, model.init_state(2), chunk)
        h1, y1 = step1(None, pm.init_state(2), chunk)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=1e-4)


class TestMomoPlan:
    def test_momo3_checkpoint_parity(self, rng):
        from audio_denoising_tpu.hub import load_pretrained
        cfg, model, params = load_pretrained("momo3-4d4ea0")
        pm = PlanModel(model, params)
        assert pm.plan.delta
        x = jnp.asarray(rng.standard_normal((2, 9, 22)), jnp.float32)
        y0, h0 = model.apply(params, x)
        y1, h1 = pm.apply(None, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(h0).reshape(2, -1),
                                   np.asarray(h1), atol=1e-5)

    def test_momo2_random_parity(self, rng):
        cfg = ModelConfig(arch="MOMO2", num_compressed_bins=3,
                          hidden_sizes=(16, 16, 16), kernel_sizes=(3, 3, 3),
                          strides=(2, 2, 2), paddings=(1, 0, 1))
        model = build_model(cfg, num_bins=22)
        params = model.init(jax.random.PRNGKey(1))
        pm = PlanModel(model, params)
        assert not pm.plan.delta
        x = jnp.asarray(rng.standard_normal((2, 6, 22)), jnp.float32)
        y0, _ = model.apply(params, x)
        y1, _ = pm.apply(None, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=1e-5)

    def test_momo3_fused_cell_parity(self, rng):
        from audio_denoising_tpu.hub import load_pretrained
        from audio_denoising_tpu.runtime.plan import plan_cell
        cfg, model, params = load_pretrained("momo3-4d4ea0")
        pm = PlanModel(model, params, fused=True, interpret=True)
        x = jnp.asarray(rng.standard_normal((5, 22)), jnp.float32)
        prev = jnp.asarray(rng.standard_normal((5, 22)), jnp.float32)
        hx = jnp.asarray(0.1 * rng.standard_normal((5, 48)), jnp.float32)
        y0, h0 = plan_cell(pm.plan, x, hx, prev=prev)
        y1, h1 = pm._cell(x, hx, prev)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=1e-5)
        ym, (hm, _pv) = model.cell(params, x, (hx.reshape(5, 16, 3), prev))
        np.testing.assert_allclose(np.asarray(ym), np.asarray(y1),
                                   atol=1e-5)

    def test_momo3_training_through_plan(self):
        """TrainingContext uses the momo plan; grads match direct."""
        import dataclasses
        from audio_denoising_tpu.config import PRESETS
        from audio_denoising_tpu.train.context import TrainingContext
        from audio_denoising_tpu.train.losses import LOSSES
        cfg = PRESETS["momo3-4d4ea0"]
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, batch_size=2, crop_samples=8192))
        model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
        ctx = TrainingContext(cfg, model, seed=0)
        r = np.random.default_rng(0)
        mix = jnp.asarray(0.2 * r.standard_normal((2, 8192)), jnp.float32)
        clean = jnp.asarray(0.1 * r.standard_normal((2, 8192)), jnp.float32)

        def loss_direct(p):
            x = ctx.features(mix)
            t = x - ctx.features(clean)
            pred, _ = model.apply(p, x)
            return LOSSES["MSE"](pred, t)

        def loss_plan(p):
            return ctx._loss(p, mix, clean, ctx.train_loss)

        l0, g0 = jax.value_and_grad(loss_direct)(ctx.state.params)
        l1, g1 = jax.value_and_grad(loss_plan)(ctx.state.params)
        assert abs(float(l0 - l1)) < 1e-5
        for k in g0:
            np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                       atol=1e-3)


class TestMel128D5Plan:
    """The 5-level preset (depth axis): plan build, fused interpret and
    the serving step must handle a level count the reference never
    used (its GRUUNet2 is fixed 4-level, gruunet2.py:228-244)."""

    def test_five_level_plan_and_serving(self, rng):
        import dataclasses
        from audio_denoising_tpu.config import PRESETS
        from audio_denoising_tpu.pipeline import make_server_step
        cfg = PRESETS["gruunet2-mel128d5"]
        model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
        assert model.bin_sizes == [128, 64, 32, 16, 8, 4]
        params = model.init(jax.random.PRNGKey(7))
        plan = build_cell_plan(model, params)
        x = jnp.asarray(rng.standard_normal((2, 128)), jnp.float32)
        hx = jnp.asarray(rng.standard_normal((2, 17, 4)), jnp.float32)
        y0, h0 = model.cell(params, x, hx)
        y1, h1 = plan_cell(plan, x, hx.reshape(2, -1))
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=5e-5)
        pm = PlanModel(model, params, fused=True, interpret=True)
        y2, h2 = pm._cell(x, hx.reshape(2, -1))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=1e-5)
        step = jax.jit(make_server_step(cfg, model))
        chunk = jnp.asarray(0.1 * rng.standard_normal((2, 1024)),
                            jnp.float32)
        h, y = step(params, model.init_state(2), chunk)
        assert y.shape == chunk.shape
        assert np.isfinite(np.asarray(y)).all()


class TestFusedVmemGate:
    """Wide checkpoints whose dense plan exceeds the one-kernel VMEM
    budget (v5e: 128 MB; seen OOM at hidden 64 x mel-128 = 137 MB of
    plan weights) must fall back to the unfused plan path instead of
    failing compile with a scoped-vmem error."""

    def test_wide_plan_falls_back(self):
        cfg = ModelConfig(arch="GRUUNet2", hidden_sizes=(64,) * 4,
                          num_compressed_bins=8)
        model = build_model(cfg, num_bins=128)
        params = model.init(jax.random.PRNGKey(0))
        with pytest.warns(UserWarning, match="VMEM budget"):
            pm = PlanModel(model, params, fused=True)
        assert pm.fused is False
        x = jnp.zeros((2, 128), jnp.float32)
        y, hx = pm.cell(None, x, pm.init_state(2))
        assert y.shape == (2, 128)

    def test_narrow_plan_stays_fused(self):
        cfg = ModelConfig(arch="GRUUNet2", hidden_sizes=(17,) * 4)
        model = build_model(cfg, num_bins=64)
        params = model.init(jax.random.PRNGKey(0))
        pm = PlanModel(model, params, fused=True, interpret=True)
        assert pm.fused is True

    def test_engine_fused_mode_downgrades(self):
        import dataclasses
        from audio_denoising_tpu.config import PRESETS
        from audio_denoising_tpu.runtime.engine import StreamEngine
        cfg = PRESETS["gruunet2-mel128"]
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, hidden_sizes=(64,) * 4))
        model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
        params = model.init(jax.random.PRNGKey(0))
        with pytest.warns(UserWarning, match="downgraded to 'fast'"):
            eng = StreamEngine(cfg, model, params, mode="fused",
                               max_streams=2)
        assert eng.mode == "fast"
        out = eng.process_batch(np.zeros((2, cfg.dsp.hop_length),
                                         np.float32))
        assert out.shape == (2, cfg.dsp.hop_length)

    def test_bf16_serving_halves_the_budget(self):
        """The fused hops store matrices at the serving dtype: a wide
        plan that exceeds the fp32 budget (137 MB) fits in bf16
        (68 MB), so a bfloat16-configured engine stays fused."""
        import dataclasses
        import warnings as _w
        from audio_denoising_tpu.config import PRESETS
        from audio_denoising_tpu.runtime.engine import StreamEngine
        cfg = PRESETS["gruunet2-mel128"]
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, hidden_sizes=(64,) * 4),
            serving=dataclasses.replace(cfg.serving, dtype="bfloat16"))
        model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
        params = model.init(jax.random.PRNGKey(0))
        with _w.catch_warnings():
            _w.simplefilter("error")        # no downgrade warning
            eng = StreamEngine(cfg, model, params, mode="fused",
                               max_streams=2, jit=False)
        assert eng.mode == "fused"


class TestMel128Plan:
    """The gruunet2-mel128 preset (round 3: the mel-64 basis is the
    measured quality ceiling — docs/BENCHMARKS.md oracle rows) must ride
    the same plan/fused serving path as the 64-bin presets: plan.py is
    probe-parameterized over bin_sizes, and F=128 is exactly one TPU
    lane tile so the fused kernel needs no F padding."""

    @pytest.fixture(scope="class")
    def mel128(self):
        from audio_denoising_tpu.config import PRESETS
        cfg = PRESETS["gruunet2-mel128"]
        model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
        params = model.init(jax.random.PRNGKey(3))
        return cfg, model, params

    def test_plan_cell_parity(self, mel128, rng):
        cfg, model, params = mel128
        assert model.bin_sizes == [128, 64, 32, 16, 8]
        plan = build_cell_plan(model, params)
        x = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)
        hx = jnp.asarray(rng.standard_normal((4, 17, 8)), jnp.float32)
        y0, h0 = model.cell(params, x, hx)
        y1, h1 = plan_cell(plan, x, hx.reshape(4, -1))
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=5e-5)
        np.testing.assert_allclose(np.asarray(h0).reshape(4, -1),
                                   np.asarray(h1), atol=5e-5)

    def test_fused_interpret_parity(self, mel128, rng):
        cfg, model, params = mel128
        pm = PlanModel(model, params, fused=True, interpret=True)
        x = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
        hx = jnp.asarray(rng.standard_normal((8, 17 * 8)), jnp.float32)
        y0, h0 = plan_cell(pm.plan, x, hx)
        y1, h1 = pm._cell(x, hx)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-5)

    def test_serving_step(self, mel128, rng):
        from audio_denoising_tpu.pipeline import make_server_step
        cfg, model, params = mel128
        step = jax.jit(make_server_step(cfg, model))
        chunk = jnp.asarray(0.1 * rng.standard_normal((2, 1024)), jnp.float32)
        h, y = step(params, model.init_state(2), chunk)
        assert y.shape == chunk.shape
        assert np.isfinite(np.asarray(y)).all()
