"""Tensor-parallel plan cell (parallel/tp.py) vs the single-device plan
(runtime/plan.plan_cell) on the 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_denoising_tpu.parallel.mesh import make_mesh
from audio_denoising_tpu.parallel.tp import make_tp_plan_cell
from audio_denoising_tpu.runtime.plan import build_cell_plan, plan_cell


@pytest.fixture(scope="module")
def gruunet_plan():
    from audio_denoising_tpu.hub import load_pretrained
    cfg, model, params = load_pretrained("gruunet2-good")
    return build_cell_plan(model, params)


class TestTPPlanCell:
    def test_parity_and_ideal_schedule(self, gruunet_plan, rng):
        """The shipped 4-level GRUUNet2 plan schedules as pure col/row
        alternation (one psum per pair, no gathers) and matches
        plan_cell to fp32 epsilon over a multi-frame rollout."""
        plan = gruunet_plan
        mesh = make_mesh(8, "tp")
        raw = make_tp_plan_cell(plan, mesh)
        assert raw.modes["down"] == ["col", "row", "col", "row"]
        assert raw.modes["up"] == ["col", "row", "col", "row"]
        assert not raw.modes["gates_gather"]
        assert not raw.modes["out_gather"]
        step = jax.jit(raw)
        B, n = 4, plan.hidden * plan.compressed
        hx_ref = hx_tp = jnp.asarray(
            rng.standard_normal((B, n)) * 0.1, jnp.float32)
        for _ in range(4):
            x = jnp.asarray(rng.standard_normal((B, 64)) * 0.3, jnp.float32)
            y_ref, hx_ref = plan_cell(plan, x, hx_ref)
            y_tp, hx_tp = step(x, hx_tp)
            np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_tp),
                                       atol=2e-5)
            np.testing.assert_allclose(np.asarray(hx_ref),
                                       np.asarray(hx_tp), atol=2e-5)

    def test_parity_odd_levels_d5(self, rng):
        """5-level preset (odd level count): the parity chain breaks once
        and the scheduler inserts a gather instead of silently corrupting
        the activation; outputs still match the reference plan."""
        from audio_denoising_tpu.config import PRESETS
        from audio_denoising_tpu.models import build_model
        cfg = PRESETS["gruunet2-mel128d5"]
        model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
        params = model.init(jax.random.PRNGKey(0))
        plan = build_cell_plan(model, params)
        mesh = make_mesh(8, "tp")
        step = jax.jit(make_tp_plan_cell(plan, mesh))
        B, F = 2, cfg.dsp.n_mels
        n = plan.hidden * plan.compressed
        hx = jnp.asarray(rng.standard_normal((B, n)) * 0.1, jnp.float32)
        x = jnp.asarray(rng.standard_normal((B, F)) * 0.3, jnp.float32)
        y_ref, hi_ref = plan_cell(plan, x, hx)
        y_tp, hi_tp = step(x, hx)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_tp),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(hi_ref), np.asarray(hi_tp),
                                   atol=2e-5)

    def test_parity_non_divisible_falls_back(self, gruunet_plan, rng):
        """A mesh size that does not divide the level widths must degrade
        to replicated levels, never wrong numbers (D=3 does not divide
        the 17-channel level widths cleanly everywhere)."""
        plan = gruunet_plan
        mesh = make_mesh(3, "tp")
        step = jax.jit(make_tp_plan_cell(plan, mesh))
        B = 2
        n = plan.hidden * plan.compressed
        hx = jnp.asarray(rng.standard_normal((B, n)) * 0.1, jnp.float32)
        x = jnp.asarray(rng.standard_normal((B, 64)) * 0.3, jnp.float32)
        y_ref, hi_ref = plan_cell(plan, x, hx)
        y_tp, hi_tp = step(x, hx)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_tp),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(hi_ref), np.asarray(hi_tp),
                                   atol=2e-5)

    def test_momo2_plan(self, rng):
        """Non-delta MOMO plans ride the same TP path (odd 22-bin
        geometry — exercises the replicated fallback on narrow levels)."""
        from audio_denoising_tpu.config import ModelConfig
        from audio_denoising_tpu.models import build_model
        from audio_denoising_tpu.runtime.plan import build_cell_plan_momo
        cfg = ModelConfig(arch="MOMO2", num_compressed_bins=3,
                          hidden_sizes=(16, 16, 16), kernel_sizes=(3, 3, 3),
                          strides=(2, 2, 2), paddings=(1, 0, 1))
        model = build_model(cfg, num_bins=22)
        params = model.init(jax.random.PRNGKey(1))
        plan = build_cell_plan_momo(model, params)
        mesh = make_mesh(8, "tp")
        step = jax.jit(make_tp_plan_cell(plan, mesh))
        B, F = 2, 22
        n = plan.hidden * plan.compressed
        hx = jnp.asarray(rng.standard_normal((B, n)) * 0.1, jnp.float32)
        x = jnp.asarray(rng.standard_normal((B, F)) * 0.3, jnp.float32)
        y_ref, hi_ref = plan_cell(plan, x, hx)
        y_tp, hi_tp = step(x, hx)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_tp),
                                   atol=2e-5)

    def test_momo3_delta_plan(self, rng):
        """MOMO3 delta carry: level 0 is affine in (x_t, prev) jointly —
        the full concat rides the same schedule; rollout parity with the
        reference plan including the prev chain."""
        from audio_denoising_tpu.hub import load_pretrained
        from audio_denoising_tpu.runtime.plan import build_cell_plan_momo
        cfg, model, params = load_pretrained("momo3-4d4ea0")
        plan = build_cell_plan_momo(model, params)
        assert plan.delta
        mesh = make_mesh(8, "tp")
        step = jax.jit(make_tp_plan_cell(plan, mesh))
        with pytest.raises(ValueError, match="prev"):
            step_raw = make_tp_plan_cell(plan, mesh)
            step_raw(jnp.zeros((1, model.num_bins)),
                     jnp.zeros((1, plan.hidden * plan.compressed)))
        B, F = 2, model.num_bins
        n = plan.hidden * plan.compressed
        hx = jnp.asarray(rng.standard_normal((B, n)) * 0.1, jnp.float32)
        prev = jnp.zeros((B, F), jnp.float32)
        for t in range(3):
            x = jnp.asarray(rng.standard_normal((B, F)) * 0.3, jnp.float32)
            if t == 0:
                prev = x        # delta-0 at t=0 (momo3 semantics)
            y_ref, hx_ref = plan_cell(plan, x, hx, prev)
            y_tp, hx_tp = step(x, hx, prev)
            np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_tp),
                                       atol=2e-5)
            np.testing.assert_allclose(np.asarray(hx_ref),
                                       np.asarray(hx_tp), atol=2e-5)
            hx, prev = hx_tp, x
