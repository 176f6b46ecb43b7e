"""ONNX parity harness (BASELINE config 4): our MOMO2 cell must match the
reference's exported single-cell-step graphs numerically, executed through
the self-contained compat.onnx decoder + executor (no onnx/onnxruntime)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_denoising_tpu.compat.onnx import (
    momo_config_from_onnx, onnx_params, parse_onnx, run_graph)
from audio_denoising_tpu.models import build_model

EXPORTS = ["/root/reference/momo2_01.onnx", "/root/reference/momo2_02.onnx"]

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXPORTS[0]), reason="reference exports unavailable")


@pytest.mark.parametrize("path", EXPORTS)
class TestMomoOnnxParity:
    def test_parse(self, path):
        g = parse_onnx(path)
        assert g.outputs and g.nodes
        assert any(k.startswith("cell.") for k in g.initializers)

    def test_cell_step_parity(self, path, rng):
        g = parse_onnx(path)
        cfg, num_bins = momo_config_from_onnx(g)
        model = build_model(cfg, num_bins=num_bins)
        params = {k: jnp.asarray(v) for k, v in onnx_params(g).items()}

        x = rng.standard_normal((1, num_bins)).astype(np.float32)
        out = run_graph(g, {"input": x})
        y_onnx, hx_onnx = out[g.outputs[0]], out[g.outputs[1]]

        hx0 = jnp.zeros((1, cfg.hidden_sizes[-1], cfg.num_compressed_bins))
        y, hx = model.cell(params, jnp.asarray(x), hx0)
        np.testing.assert_allclose(np.asarray(y), y_onnx, atol=1e-5)
        np.testing.assert_allclose(np.asarray(hx), hx_onnx, atol=1e-5)

    def test_two_steps_state_carry(self, path, rng):
        """Recurrence: feed the ONNX graph's hx back as our carry."""
        g = parse_onnx(path)
        cfg, num_bins = momo_config_from_onnx(g)
        model = build_model(cfg, num_bins=num_bins)
        params = {k: jnp.asarray(v) for k, v in onnx_params(g).items()}

        x1 = rng.standard_normal((1, num_bins)).astype(np.float32)
        x2 = rng.standard_normal((1, num_bins)).astype(np.float32)
        o1 = run_graph(g, {"input": x1})
        hx0 = jnp.zeros((1, cfg.hidden_sizes[-1], cfg.num_compressed_bins))
        _, hx1 = model.cell(params, jnp.asarray(x1), hx0)
        np.testing.assert_allclose(np.asarray(hx1), o1[g.outputs[1]],
                                   atol=1e-5)
        # second step seeded with the ONNX state
        y2, _ = model.cell(params, jnp.asarray(x2),
                           jnp.asarray(o1[g.outputs[1]]))
        seq, _ = model.apply(params, jnp.concatenate(
            [x1[:, None, :], x2[:, None, :]], axis=1))
        np.testing.assert_allclose(np.asarray(seq[:, 1]), np.asarray(y2),
                                   atol=1e-5)


def test_byte_identical_exports():
    """my_model.onnx is the same artifact as momo2_01.onnx (SURVEY §0)."""
    a = "/root/reference/my_model.onnx"
    if not os.path.exists(a):
        pytest.skip("reference unavailable")
    with open(a, "rb") as f1, open(EXPORTS[0], "rb") as f2:
        assert f1.read() == f2.read()


class TestOnnxExport:
    """Write half (compat/onnx_export.py): our serializer + cell builder."""

    def _model(self, delta):
        from audio_denoising_tpu.config import ModelConfig
        from audio_denoising_tpu.models.momo import MOMO3
        cfg = ModelConfig(arch="MOMO3" if delta else "MOMO2",
                          hidden_sizes=(8, 12, 16), kernel_sizes=(3, 3, 3),
                          strides=(2, 2, 2), paddings=(1, 0, 1),
                          num_gaussians=6, num_compressed_bins=3)
        model = MOMO3(cfg, num_bins=22, delta=delta)
        return model, model.init(jax.random.PRNGKey(3))

    def test_momo3_roundtrip_bitexact(self, tmp_path, rng):
        from audio_denoising_tpu.compat.onnx import parse_onnx, run_graph
        from audio_denoising_tpu.compat.onnx_export import export_momo_cell
        model, params = self._model(delta=True)
        p = str(tmp_path / "m3.onnx")
        export_momo_cell(model, params, p)
        g = parse_onnx(p)
        x = rng.standard_normal((1, 22)).astype(np.float32)
        prev = rng.standard_normal((1, 22)).astype(np.float32)
        h0 = rng.standard_normal((1, 16, 3)).astype(np.float32)
        out = run_graph(g, {"input": x, "prev": prev, "h0": h0})
        y, (hx, _p) = model.cell(params, jnp.asarray(x),
                                 (jnp.asarray(h0), jnp.asarray(prev)))
        np.testing.assert_array_equal(out["output"], np.asarray(y))
        np.testing.assert_array_equal(out["hx"], np.asarray(hx))

    def test_momo2_roundtrip_bitexact(self, tmp_path, rng):
        from audio_denoising_tpu.compat.onnx import parse_onnx, run_graph
        from audio_denoising_tpu.compat.onnx_export import export_momo_cell
        model, params = self._model(delta=False)
        p = str(tmp_path / "m2.onnx")
        export_momo_cell(model, params, p)
        g = parse_onnx(p)
        x = rng.standard_normal((1, 22)).astype(np.float32)
        h0 = rng.standard_normal((1, 16, 3)).astype(np.float32)
        out = run_graph(g, {"input": x, "h0": h0})
        y, hx = model.cell(params, jnp.asarray(x), jnp.asarray(h0))
        np.testing.assert_array_equal(out["output"], np.asarray(y))
        np.testing.assert_array_equal(out["hx"], np.asarray(hx))

    def test_rewrite_reference_artifact(self, tmp_path, rng):
        """write_onnx must re-serialize the torch-produced momo2_02 graph
        (Constants, Slices, dynamic shapes and all) so that our reader +
        executor give identical outputs — the serializer validated against
        a wild artifact, not just our own builder."""
        import os
        src = "/root/reference/momo2_02.onnx"
        if not os.path.exists(src):
            pytest.skip("reference artifact absent")
        from audio_denoising_tpu.compat.onnx import parse_onnx, run_graph
        from audio_denoising_tpu.compat.onnx_export import write_onnx
        g1 = parse_onnx(src)
        p = str(tmp_path / "rewrite.onnx")
        # the torch export uses the input-form axes ops -> opset 13+
        write_onnx(g1, p, input_shapes={n: s or () for n, s in g1.inputs},
                   opset=17)
        g2 = parse_onnx(p)
        assert [n.op_type for n in g2.nodes] == [n.op_type for n in g1.nodes]
        feeds = {n: rng.standard_normal(s).astype(np.float32)
                 for n, s in g1.inputs if s}
        o1 = run_graph(g1, feeds)
        o2 = run_graph(g2, feeds)
        for k in g1.outputs:
            np.testing.assert_array_equal(np.asarray(o1[k]),
                                          np.asarray(o2[k]))

    def test_shipped_checkpoint_exports(self, tmp_path):
        """The shipped MOMO3 checkpoint exports and the artifact carries
        its delta input."""
        from audio_denoising_tpu.hub import load_pretrained
        from audio_denoising_tpu.compat.onnx import parse_onnx
        from audio_denoising_tpu.compat.onnx_export import export_momo_cell
        _cfg, model, params = load_pretrained("momo3-4d4ea0")
        p = str(tmp_path / "momo3_shipped.onnx")
        export_momo_cell(model, params, p)
        g = parse_onnx(p)
        assert [n for n, _ in g.inputs] == ["input", "prev", "h0"]
        assert g.outputs == ["output", "hx"]


class TestGRUUNetExport:
    """Write-side generalization past the MOMO family (VERDICT r2
    task 6): GRUUNet2 cell export round-trips bit-exactly through
    the self-contained reader."""

    def test_gruunet2_roundtrip_bitexact(self, tmp_path, rng):
        import jax
        from audio_denoising_tpu.compat.onnx import parse_onnx, run_graph
        from audio_denoising_tpu.compat.onnx_export import export_cell
        from audio_denoising_tpu.config import ModelConfig
        from audio_denoising_tpu.models import build_model
        cfg = ModelConfig(arch="GRUUNet2", hidden_sizes=(8, 8, 8, 8),
                          num_compressed_bins=2, num_gaussians=6,
                          kernel_sizes=(3, 3, 3, 3), strides=(2, 2, 2, 2),
                          paddings=(1, 1, 1, 1))
        model = build_model(cfg, num_bins=32)
        params = model.init(jax.random.PRNGKey(5))
        p = str(tmp_path / "g2.onnx")
        export_cell(model, params, p)
        g = parse_onnx(p)
        x = rng.standard_normal((1, 32)).astype(np.float32)
        h0 = rng.standard_normal((1, 8, 2)).astype(np.float32)
        out = run_graph(g, {"input": x, "h0": h0})
        y, hx = model.cell(params, jnp.asarray(x), jnp.asarray(h0))
        np.testing.assert_array_equal(out["output"], np.asarray(y))
        np.testing.assert_array_equal(out["hx"], np.asarray(hx))

    def test_shipped_gruunet2_checkpoint_exports(self, tmp_path):
        """`convert gruunet2-good out.onnx` works on the real shipped
        weights and the artifact executes with carried state."""
        from audio_denoising_tpu.compat.onnx import parse_onnx, run_graph
        from audio_denoising_tpu.compat.onnx_export import export_cell
        from audio_denoising_tpu.hub import load_pretrained
        try:
            _cfg, model, params = load_pretrained("gruunet2-good")
        except FileNotFoundError:
            pytest.skip("converted checkpoint not present")
        p = str(tmp_path / "good.onnx")
        export_cell(model, params, p)
        g = parse_onnx(p)
        x = np.random.default_rng(0).standard_normal(
            (1, 64)).astype(np.float32) * 0.1
        h = np.zeros((1, 17, 4), np.float32)
        for _ in range(3):        # state carries across steps
            out = run_graph(g, {"input": x, "h0": h})
            h = out["hx"]
        y, hx = model.cell(params, jnp.asarray(x),
                           jnp.asarray(np.zeros((1, 17, 4), np.float32)))
        assert out["output"].shape == (1, 64)
        assert np.isfinite(out["output"]).all()
        # first-step parity vs the jax cell
        first = run_graph(g, {"input": x,
                              "h0": np.zeros((1, 17, 4), np.float32)})
        np.testing.assert_array_equal(first["output"], np.asarray(y))
        np.testing.assert_array_equal(first["hx"], np.asarray(hx))


class TestUNet2dExport:
    """VERDICT r3 task 7: the ONNX writer covers the STATELESS family too
    — a whole UNet2d-family forward exports (Conv/ConvTranspose/
    InstanceNormalization/PRelu/Concat) and round-trips bit-exactly
    through the self-contained reader."""

    def test_unet2d4_roundtrip_bitexact(self, tmp_path, rng):
        import jax
        from audio_denoising_tpu.compat.onnx import parse_onnx, run_graph
        from audio_denoising_tpu.compat.onnx_export import export_cell
        from audio_denoising_tpu.models.unet2d import UNet2d
        model = UNet2d(arch="UNet2d4", bins=241)
        params = model.init(jax.random.PRNGKey(3))
        p = str(tmp_path / "u4.onnx")
        export_cell(model, params, p)          # dispatches to export_unet2d
        g = parse_onnx(p)
        t = model.compatible_frames(48)
        x = (0.3 * rng.standard_normal((1, 241, t))).astype(np.float32)
        out = run_graph(g, {"input": x})
        y = model.apply(params, jnp.asarray(x))
        np.testing.assert_array_equal(out["output"], np.asarray(y))

    def test_unet2d3_mixed_kernels_roundtrip(self, tmp_path, rng):
        """The 3-level variant exercises non-square kernels/strides and
        nonzero output_paddings (unet3.py:116 spec)."""
        import jax
        from audio_denoising_tpu.compat.onnx import parse_onnx, run_graph
        from audio_denoising_tpu.compat.onnx_export import export_unet2d
        from audio_denoising_tpu.models.unet2d import UNet2d
        model = UNet2d(arch="UNet2d3", bins=241)
        params = model.init(jax.random.PRNGKey(4))
        t = model.compatible_frames(40)
        p = str(tmp_path / "u3.onnx")
        export_unet2d(model, params, p, frames=t)
        g = parse_onnx(p)
        x = (0.3 * rng.standard_normal((1, 241, t))).astype(np.float32)
        out = run_graph(g, {"input": x})
        y = model.apply(params, jnp.asarray(x))
        np.testing.assert_array_equal(out["output"], np.asarray(y))

    def test_trunet_roundtrip_bitexact(self, tmp_path, rng):
        """TRUNet completes the writer's zoo coverage: depthwise convs
        (Conv group), inference BatchNormalization, and the F/T GRU
        blocks as ONNX GRU (linear_before_reset=1, torch r,z,n packing
        reordered to z,r,h) — bit-exact round trip vs the jax forward."""
        import jax
        from audio_denoising_tpu.compat.onnx import parse_onnx, run_graph
        from audio_denoising_tpu.compat.onnx_export import export_cell
        from audio_denoising_tpu.models.trunet import TRUNet
        net = TRUNet()
        params = net.init(jax.random.PRNGKey(7))
        p = str(tmp_path / "trunet.onnx")
        export_cell(net, params, p)
        g = parse_onnx(p)
        x = (0.3 * rng.standard_normal((1, 4, 257))).astype(np.float32)
        out = run_graph(g, {"input": x})
        y = net.apply(params, jnp.asarray(x))
        assert out["output"].shape == (1, 5, 257)
        np.testing.assert_array_equal(out["output"], np.asarray(y))

    def test_trained_trunet_checkpoint_exports(self, tmp_path):
        """`convert runs/trunet-realnoise.npz out.onnx` works on the
        trained 16 kHz champion (the TRUNetDenoiser adapter exports its
        core net; featurization is framework-side by design)."""
        import os
        from audio_denoising_tpu.compat.onnx import parse_onnx, run_graph
        from audio_denoising_tpu.compat.onnx_export import export_cell
        from audio_denoising_tpu.hub import load_pretrained
        ckpt = os.path.join(os.path.dirname(__file__), "..", "runs",
                            "trunet-realnoise.npz")
        if not os.path.exists(ckpt):
            pytest.skip("trained trunet checkpoint not present")
        _cfg, model, params = load_pretrained(ckpt)
        p = str(tmp_path / "trunet-good.onnx")
        export_cell(model, params, p)
        g = parse_onnx(p)
        x = (0.1 * np.random.default_rng(0).standard_normal(
            (1, 4, 257))).astype(np.float32)
        out = run_graph(g, {"input": x})
        y = model.net.apply(params, jnp.asarray(x))
        np.testing.assert_array_equal(out["output"], np.asarray(y))

    def test_trained_unet4_checkpoint_exports(self, tmp_path):
        """`convert runs/unet4-mrstft-30k.npz out.onnx` works on the real
        trained champion weights."""
        import os
        from audio_denoising_tpu.compat.onnx import parse_onnx, run_graph
        from audio_denoising_tpu.compat.onnx_export import export_cell
        from audio_denoising_tpu.hub import load_pretrained
        ckpt = os.path.join(os.path.dirname(__file__), "..", "runs",
                            "unet4-mrstft-30k.npz")
        if not os.path.exists(ckpt):
            pytest.skip("trained unet4 checkpoint not present")
        _cfg, model, params = load_pretrained(ckpt)
        p = str(tmp_path / "unet4.onnx")
        export_cell(model, params, p)
        g = parse_onnx(p)
        t = model.compatible_frames(48)
        x = np.abs(np.random.default_rng(0).standard_normal(
            (1, model.bins, t))).astype(np.float32) * 0.1
        out = run_graph(g, {"input": x})
        y = model.apply(params, jnp.asarray(x))
        np.testing.assert_array_equal(out["output"], np.asarray(y))


class TestOnnxAsModelSpec:
    """`load_pretrained('x.onnx')` serves reference ONNX artifacts
    directly (hub._load_onnx): a reference user's exported cells work in
    every CLI surface without conversion."""

    @pytest.mark.parametrize("path", EXPORTS)
    def test_load_and_cell_matches_graph(self, path, rng):
        from audio_denoising_tpu.hub import load_pretrained
        cfg, model, params = load_pretrained(path)
        g = parse_onnx(path)
        _mc, num_bins = momo_config_from_onnx(g)
        assert cfg.dsp.n_mels == num_bins and cfg.dsp.domain == "raw"
        x = rng.standard_normal((1, num_bins)).astype(np.float32)
        out = run_graph(g, {"input": x})
        hx0 = jnp.zeros((1, cfg.model.hidden_sizes[-1],
                         cfg.model.num_compressed_bins))
        y, _hx = model.cell(params, jnp.asarray(x), hx0)
        np.testing.assert_allclose(np.asarray(y), out[g.outputs[0]],
                                   atol=1e-5)

    def test_offline_chain_runs(self):
        from audio_denoising_tpu.apps.offline import denoise_array
        from audio_denoising_tpu.hub import load_pretrained
        cfg, model, params = load_pretrained(EXPORTS[0])
        x = (0.1 * np.random.default_rng(0).standard_normal(
            cfg.dsp.sample_rate // 4)).astype(np.float32)
        y = denoise_array(cfg, model, params, x, cfg.dsp.sample_rate)
        assert y.shape[0] > 0 and np.isfinite(y).all()
