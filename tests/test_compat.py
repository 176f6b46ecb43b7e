"""The pure-Python .pth reader must agree bit-for-bit with torch.load."""

import os

import numpy as np
import pytest

from audio_denoising_tpu.compat import (
    load_torch_checkpoint, load_params_npz, state_dict_to_params,
)

REF = "/root/reference/saves"
CKPTS = ["GRUUNet2-dari_tult", "GRUUNet2-dari_tult2", "GRUUNet2-good",
         "MOMO3-4d4ea0"]

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkpoints not mounted")


@needs_reference
@pytest.mark.parametrize("name", CKPTS)
def test_pth_reader_matches_torch(name):
    torch = pytest.importorskip("torch")
    path = os.path.join(REF, name, "checkpoint.pth")
    ours = load_torch_checkpoint(path)
    ref = torch.load(path, map_location="cpu", weights_only=False)

    assert ours["arch"] == ref["arch"]
    assert ours["total_training_iters"] == ref["total_training_iters"]
    assert dict(ours["config"]) == {
        k: (tuple(v) if isinstance(v, (list, tuple)) else v)
        for k, v in ref["config"].items()}

    ref_sd = ref["model_state_dict"]
    assert set(ours["model_state_dict"]) == set(ref_sd)
    for k, v in ours["model_state_dict"].items():
        np.testing.assert_array_equal(np.asarray(v), ref_sd[k].numpy(),
                                      err_msg=k)

    # loss records survive the restricted unpickle
    assert len(ours["loss_record"]["train"]) == len(ref["loss_record"]["train"])


@needs_reference
def test_npz_roundtrip(tmp_path):
    from audio_denoising_tpu.compat import save_params_npz
    ck = load_torch_checkpoint(os.path.join(REF, CKPTS[0], "checkpoint.pth"))
    params = state_dict_to_params(ck["model_state_dict"])
    out = tmp_path / "x.npz"
    save_params_npz(str(out), params, {"arch": ck["arch"],
                                       "config": {"a": (1, 2)}})
    loaded, meta = load_params_npz(str(out))
    assert meta["arch"] == ck["arch"]
    assert set(loaded) == set(params)
    for k in params:
        np.testing.assert_array_equal(loaded[k], params[k])


def test_committed_checkpoints_present():
    base = os.path.join(os.path.dirname(__file__), "..", "checkpoints")
    for name in CKPTS:
        path = os.path.join(base, name.lower() + ".npz")
        assert os.path.exists(path), path
        params, meta = load_params_npz(path)
        assert meta["arch"] in ("GRUUNet2", "MOMO3")
        assert all(v.dtype == np.float32 for v in params.values())


class TestConfigRoundTrip:
    def test_all_presets_json_round_trip(self):
        from audio_denoising_tpu.config import Config, PRESETS
        for name, cfg in PRESETS.items():
            back = Config.from_json(cfg.to_json())
            assert back == cfg, name

    def test_model_config_reference_round_trip(self):
        from audio_denoising_tpu.config import ModelConfig
        mc = ModelConfig(arch="MOMO3", num_compressed_bins=3,
                         hidden_sizes=(16, 16, 16), kernel_sizes=(3, 3, 3),
                         strides=(2, 2, 2), paddings=(1, 0, 1))
        d = mc.to_reference_dict()
        back = ModelConfig.from_reference_dict("MOMO3", d)
        assert back == mc
