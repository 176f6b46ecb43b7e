"""Model-zoo parity against goldens captured from the EXECUTED reference
models (tools/make_goldens.py) — shipped checkpoints for GRUUNet2/MOMO3,
seeded random torch weights for the rest."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_denoising_tpu.compat import load_params_npz
from audio_denoising_tpu.config import ModelConfig
from audio_denoising_tpu.models import (
    GRU, MOMO, MOMO2, MOMO3, TRUNet, UNet2d, GRUUNet2, build_model,
)
from audio_denoising_tpu.models.base import as_jnp

HERE = os.path.dirname(__file__)
GOLD = os.path.join(HERE, "goldens")
CKPT = os.path.join(HERE, "..", "checkpoints")

TOL = dict(atol=5e-5, rtol=1e-4)


def _golden(name):
    return np.load(os.path.join(GOLD, name + ".npz"))


def _golden_params(g):
    return {k[3:]: jnp.asarray(g[k]) for k in g.files if k.startswith("sd.")}


def _ckpt_model(npz_name, num_bins):
    params, meta = load_params_npz(os.path.join(CKPT, npz_name))
    cfg = ModelConfig.from_reference_dict(meta["arch"], meta["config"])
    return build_model(cfg, num_bins=num_bins), as_jnp(params)


class TestGRUUNet2:
    @pytest.mark.parametrize("ckpt,golden", [
        ("gruunet2-dari_tult.npz", "model_GRUUNet2-dari_tult"),
        ("gruunet2-good.npz", "model_GRUUNet2-good"),
    ])
    def test_checkpoint_parity(self, ckpt, golden):
        m, p = _ckpt_model(ckpt, 64)
        g = _golden(golden)
        out, hx = m.apply(p, jnp.asarray(g["x"]))
        np.testing.assert_allclose(np.asarray(out), g["out"], **TOL)
        np.testing.assert_allclose(np.asarray(hx), g["hx"], **TOL)
        # continuation from carried state
        out2, _ = m.apply(p, jnp.asarray(g["x"][:, :3]), hx)
        np.testing.assert_allclose(np.asarray(out2), g["out2"], **TOL)
        # unbatched (T, F) input path
        o2d, _ = m.apply(p, jnp.asarray(g["x"][0]))
        np.testing.assert_allclose(np.asarray(o2d), g["out_2d"], **TOL)

    def test_gruunet_v1_random_weights(self):
        g = _golden("model_GRUUNet-rand")
        cfg = ModelConfig(arch="GRUUNet")
        m = build_model(cfg, num_bins=64)
        out, hx = m.apply(_golden_params(g), jnp.asarray(g["x"]))
        np.testing.assert_allclose(np.asarray(out), g["out"], **TOL)
        np.testing.assert_allclose(np.asarray(hx), g["hx"], **TOL)

    def test_init_shapes_match_checkpoint(self):
        m, p = _ckpt_model("gruunet2-dari_tult.npz", 64)
        fresh = m.init(jax.random.PRNGKey(0))
        assert set(fresh) == {k for k in p if "gs.offset" not in k}
        for k, v in fresh.items():
            assert v.shape == p[k].shape, k

    def test_jit_and_vmap(self):
        m, p = _ckpt_model("gruunet2-dari_tult.npz", 64)
        x = jnp.zeros((3, 4, 64))
        f = jax.jit(lambda params, x: m.apply(params, x))
        y, hx = f(p, x)
        assert y.shape == (3, 4, 64) and hx.shape == (3, 17, 4)


class TestMOMO:
    def test_momo3_checkpoint_parity(self):
        m, p = _ckpt_model("momo3-4d4ea0.npz", 22)
        g = _golden("model_MOMO3-4d4ea0")
        out, hx = m.apply(p, jnp.asarray(g["x"]))
        np.testing.assert_allclose(np.asarray(out), g["out"], **TOL)
        np.testing.assert_allclose(np.asarray(hx), g["hx"], **TOL)
        out2, _ = m.apply(p, jnp.asarray(g["x"][:, :3]), hx)
        np.testing.assert_allclose(np.asarray(out2), g["out2"], **TOL)
        o2d, _ = m.apply(p, jnp.asarray(g["x"][0]))
        np.testing.assert_allclose(np.asarray(o2d), g["out_2d"], **TOL)

    def test_momo2_random_weights(self):
        g = _golden("model_MOMO2-rand")
        cfg = ModelConfig(arch="MOMO2", num_compressed_bins=3,
                          hidden_sizes=(16, 16, 16), kernel_sizes=(3, 3, 3),
                          strides=(2, 2, 2), paddings=(1, 0, 1))
        m = MOMO2(cfg, num_bins=22)
        out, hx = m.apply(_golden_params(g), jnp.asarray(g["x"]))
        np.testing.assert_allclose(np.asarray(out), g["out"], **TOL)
        np.testing.assert_allclose(np.asarray(hx), g["hx"], **TOL)

    def test_momo1_random_weights(self):
        g = _golden("model_MOMO-rand")
        cfg = ModelConfig(arch="MOMO", num_compressed_bins=3,
                          hidden_sizes=(16, 16, 16), kernel_sizes=(3, 3, 3),
                          strides=(2, 2, 2), paddings=(1, 0, 1))
        m = MOMO(cfg, num_bins=22)
        out, hx = m.apply(_golden_params(g), jnp.asarray(g["x"]))
        np.testing.assert_allclose(np.asarray(out), g["out"], **TOL)
        np.testing.assert_allclose(np.asarray(hx), g["hx"], **TOL)

    def test_momo3_init_shapes(self):
        m, p = _ckpt_model("momo3-4d4ea0.npz", 22)
        fresh = m.init(jax.random.PRNGKey(0))
        assert set(fresh) == {k for k in p if "gs.offset" not in k}
        for k, v in fresh.items():
            assert v.shape == p[k].shape, k


class TestUNet2d:
    @pytest.mark.parametrize("arch", ["UNet2d", "UNet2d3", "UNet2d4"])
    def test_random_weight_parity(self, arch):
        g = _golden(f"model_{arch}-rand")
        m = UNet2d(arch=arch, bins=int(g["bins"]))
        out = m.apply(_golden_params(g), jnp.asarray(g["x"]))
        assert out.shape == g["out"].shape
        np.testing.assert_allclose(np.asarray(out), g["out"],
                                   atol=5e-4, rtol=1e-3)

    def test_init_shapes_match_torch(self):
        g = _golden("model_UNet2d4-rand")
        m = UNet2d(arch="UNet2d4", bins=241)
        fresh = m.init(jax.random.PRNGKey(0))
        golden_sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
        golden_learnable = {k for k in golden_sd if "gs.offset" not in k}
        assert set(fresh) == golden_learnable
        for k, v in fresh.items():
            assert v.shape == golden_sd[k].shape, k


class TestTRUNetAndGRU:
    def test_trunet_parity(self):
        g = _golden("model_TRUNet-rand")
        out = TRUNet().apply(_golden_params(g), jnp.asarray(g["x"]))
        assert out.shape == g["out"].shape
        np.testing.assert_allclose(np.asarray(out), g["out"], **TOL)

    def test_gru_parity(self):
        g = _golden("model_GRU-rand")
        m = GRU(12, 20, num_layers=2)
        out, h = m.apply(_golden_params(g), jnp.asarray(g["x"]))
        np.testing.assert_allclose(np.asarray(out), g["out"], **TOL)
        np.testing.assert_allclose(np.asarray(h), g["h"], **TOL)

    def test_gru_init_and_forward(self):
        m = GRU(8, 16, num_layers=2, bidirectional=True)
        p = m.init(jax.random.PRNGKey(0))
        out, h = m.apply(p, jnp.zeros((2, 5, 8)))
        assert out.shape == (2, 5, 32)
        assert h.shape == (4, 2, 16)


class TestStreamingEquivalence:
    """Chunked scan with carried state must equal one full-sequence scan
    (SURVEY §4 'streaming equivalence'). The GRU carry IS the long-context
    mechanism — O(1) state regardless of audio length (SURVEY §5)."""

    def test_gruunet2_chunked_equals_full(self):
        m, p = _ckpt_model("gruunet2-dari_tult.npz", 64)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 12, 64)).astype(np.float32))
        full, hx_full = m.apply(p, x)
        hx = None
        outs = []
        for i in range(0, 12, 3):
            y, hx = m.apply(p, x[:, i:i + 3], hx)
            outs.append(y)
        np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, axis=1)),
                                   np.asarray(full), atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(hx), np.asarray(hx_full),
                                   atol=1e-5, rtol=1e-5)

    def test_momo3_chunked_needs_prev_carry(self):
        """MOMO3's delta feature adds a prev-frame carry; chunked equals full
        only when prev is threaded through (the reference's forward resets
        prev per call — a latent streaming discontinuity this API fixes)."""
        m, p = _ckpt_model("momo3-4d4ea0.npz", 22)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((1, 8, 22)).astype(np.float32))
        full, _ = m.apply(p, x)
        hx, prev = None, None
        outs = []
        for i in range(0, 8, 2):
            chunk = x[:, i:i + 2]
            if hx is None:
                y, hx = m.apply(p, chunk)
            else:
                y, hx = m.apply(p, chunk, hx, prev=prev)
            prev = chunk[:, -1]
            outs.append(y)
        np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, axis=1)),
                                   np.asarray(full), atol=1e-5, rtol=1e-5)
