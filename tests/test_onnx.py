"""ONNX parity harness (BASELINE config 4): our MOMO2 cell must match the
reference's exported single-cell-step graphs numerically, executed through
the self-contained compat.onnx decoder + executor (no onnx/onnxruntime)."""

import os

import numpy as np
import pytest
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
