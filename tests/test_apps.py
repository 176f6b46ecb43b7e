"""Entry-point application tests: offline CLI, socket daemon (reference
wire protocol), batched engine daemon, checkpoint tools. All on the CPU
backend (conftest forces 8 virtual devices)."""

import json
import os
import subprocess
import sys
import threading
import time
from multiprocessing.connection import Client

import numpy as np
import pytest

from audio_denoising_tpu.io.wavio import read_wav, write_wav

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "checkpoints", "gruunet2-good.npz")


@pytest.fixture(scope="module")
def noisy_wav(tmp_path_factory):
    path = tmp_path_factory.mktemp("apps") / "noisy.wav"
    rng = np.random.default_rng(0)
    t = np.arange(24000) / 48000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(len(t))
    write_wav(str(path), sig[None].astype(np.float32), 48000)
    return str(path)


class TestOffline:
    def test_denoise_file(self, noisy_wav, tmp_path):
        from audio_denoising_tpu.apps.offline import denoise_file
        out = str(tmp_path / "out.wav")
        denoise_file("gruunet2-good", noisy_wav, out)
        samples, sr = read_wav(out)
        assert sr == 48000
        assert samples.shape[-1] == 24000
        assert np.abs(samples).max() > 0

    def test_denoise_mp3_input(self, tmp_path):
        """Non-WAV containers decode through io/codec.py (the reference's
        upload path accepts anything PyAV reads, app.py:171-223)."""
        import pytest
        from audio_denoising_tpu.io.codec import mp3_available
        if not mp3_available():
            pytest.skip("libmpg123 absent")
        src = "/root/reference/data/uncompressed/sine_sweep/sine_sweep.mp3"
        import os
        if not os.path.exists(src):
            pytest.skip("reference mp3 fixture absent")
        from audio_denoising_tpu.apps.offline import denoise_file
        out = str(tmp_path / "out.wav")
        denoise_file("gruunet2-good", src, out)
        samples, sr = read_wav(out)
        assert sr == 48000 and np.abs(samples).max() > 0

    def test_denoise_resamples(self, tmp_path):
        from audio_denoising_tpu.apps.offline import denoise_file
        src = str(tmp_path / "in44.wav")
        rng = np.random.default_rng(1)
        write_wav(src, (0.1 * rng.standard_normal(22050))[None]
                  .astype(np.float32), 44100)
        out = str(tmp_path / "out.wav")
        denoise_file("gruunet2-good", src, out)
        samples, sr = read_wav(out)
        assert sr == 48000
        assert abs(samples.shape[-1] - 24000) <= 1


class TestSocketDaemon:
    def test_round_trip_and_state_isolation(self):
        from audio_denoising_tpu.apps.serve import SocketDaemon
        daemon = SocketDaemon("gruunet2-good", ("localhost", 26101))
        t = threading.Thread(target=daemon.serve_forever, daemon=True)
        t.start()
        time.sleep(0.5)
        try:
            rng = np.random.default_rng(0)
            with Client(("localhost", 26101)) as c:
                x = (0.1 * rng.standard_normal((2048, 2))).astype(np.float32)
                c.send(x)
                y1 = c.recv()
                assert y1.shape == x.shape
                assert np.allclose(y1[:, 0], y1[:, 1])  # mono replicated
                c.send(x)
                y2 = c.recv()     # hx carried: output differs from msg 1
                assert not np.allclose(y1, y2)
                c.send("close")
            with Client(("localhost", 26101)) as c:
                c.send(x)
                y3 = c.recv()     # fresh connection: fresh state == y1
                np.testing.assert_allclose(y3, y1, atol=1e-5)
        finally:
            daemon.stop()

    def test_process_matches_pipeline(self):
        from audio_denoising_tpu.apps.serve import SocketDaemon
        import jax.numpy as jnp
        daemon = SocketDaemon("gruunet2-good", ("localhost", 26199))
        rng = np.random.default_rng(1)
        x = (0.1 * rng.standard_normal((2048, 1))).astype(np.float32)
        hx = daemon.model.init_state(1)
        out, _ = daemon.process(x, hx)
        hx2, y = daemon._step(daemon.params, daemon.model.init_state(1),
                              jnp.asarray(x.T[0][None]))
        np.testing.assert_allclose(out[:, 0], np.asarray(y[0]), atol=1e-6)


class TestEngineDaemon:
    def test_open_chunk_close(self):
        from audio_denoising_tpu.apps.engine_serve import EngineDaemon
        daemon = EngineDaemon("gruunet2-good", max_streams=4,
                              address=("localhost", 26102), tick_ms=0.5)
        t = threading.Thread(target=daemon.serve_forever, daemon=True)
        t.start()
        time.sleep(0.5)
        hop = daemon.cfg.dsp.hop_length
        try:
            with Client(("localhost", 26102)) as c:
                c.send(("open", "s1"))
                ok, sid, slot = c.recv()
                assert ok == "ok" and slot >= 0
                chunk = (0.1 * np.random.default_rng(0)
                         .standard_normal(hop)).astype(np.float32)
                c.send(("chunk", "s1", chunk))
                tag, sid, out = c.recv()
                assert tag == "out" and out.shape == (hop,)
                c.send(("stats",))
                tag, stats = c.recv()
                assert tag == "stats" and stats["active_streams"] == 1
                c.send(("close", "s1"))
                assert c.recv()[0] == "ok"
                c.send(("chunk", "s1", chunk))     # after close -> error
                assert c.recv()[0] == "err"
        finally:
            daemon.stop()

    def test_disconnect_evicts(self):
        from audio_denoising_tpu.apps.engine_serve import EngineDaemon
        daemon = EngineDaemon("gruunet2-good", max_streams=2,
                              address=("localhost", 26103), tick_ms=0.5)
        t = threading.Thread(target=daemon.serve_forever, daemon=True)
        t.start()
        time.sleep(0.5)
        try:
            for _ in range(3):   # would exhaust 2 slots without eviction
                with Client(("localhost", 26103)) as c:
                    c.send(("open", "s"))
                    assert c.recv()[0] == "ok"
                time.sleep(0.3)
            assert daemon.engine.active_streams == 0
        finally:
            daemon.stop()


class TestCLITools:
    def test_info_npz(self, capsys):
        from audio_denoising_tpu.cli import main
        assert main(["info", CKPT]) == 0
        meta = json.loads(capsys.readouterr().out)
        assert meta["n_params"] > 15000

    def test_info_reference_pth(self, capsys):
        pth = "/root/reference/saves/GRUUNet2-good/checkpoint.pth"
        if not os.path.exists(pth):
            pytest.skip("reference checkpoint unavailable")
        from audio_denoising_tpu.cli import main
        assert main(["info", pth]) == 0
        meta = json.loads(capsys.readouterr().out)
        assert meta["arch"] == "GRUUNet2"
        assert meta["train_loss_min"] < meta["train_loss_first"]

    def test_convert_round_trip(self, tmp_path, capsys):
        pth = "/root/reference/saves/MOMO3-4d4ea0/checkpoint.pth"
        if not os.path.exists(pth):
            pytest.skip("reference checkpoint unavailable")
        from audio_denoising_tpu.cli import main
        out = str(tmp_path / "momo3.npz")
        assert main(["convert", pth, out]) == 0
        from audio_denoising_tpu.compat.npz_store import load_params_npz
        params, meta = load_params_npz(out)
        assert meta["arch"] == "MOMO3"
        assert any(k.startswith("cell.") for k in params)

    def test_unknown_command(self):
        from audio_denoising_tpu.cli import main
        assert main(["frobnicate"]) == 2

    def test_hub_rejects_unknown(self):
        from audio_denoising_tpu.hub import load_pretrained
        with pytest.raises(ValueError):
            load_pretrained("not-a-preset")


class TestHubPthDirect:
    def test_load_pretrained_from_reference_pth(self):
        """hub loads a raw reference .pth and the model serves it."""
        pth = "/root/reference/saves/GRUUNet2-good/checkpoint.pth"
        if not os.path.exists(pth):
            pytest.skip("reference checkpoint unavailable")
        import jax
        import jax.numpy as jnp
        from audio_denoising_tpu.hub import load_pretrained
        from audio_denoising_tpu.config import PRESETS
        cfg, model, params = load_pretrained(pth, cfg=PRESETS["gruunet2-good"])
        x = jnp.zeros((1, 3, 64))
        y, hx = model.apply(params, x)
        assert y.shape == (1, 3, 64)
        # same weights as the converted npz
        from audio_denoising_tpu.compat.npz_store import load_params_npz
        ref, _ = load_params_npz(os.path.join(REPO, "checkpoints",
                                              "gruunet2-good.npz"))
        np.testing.assert_array_equal(
            np.asarray(params["cell.input_gate.downs.0.conv.weight"]),
            ref["cell.input_gate.downs.0.conv.weight"])
