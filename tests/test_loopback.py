"""apps/loopback.py coverage (round 5, VERDICT r4 #7 — the last entry
point the suite never drove).

A fake ``sounddevice`` module is injected into sys.modules: its Stream
records the duplex callback and its ``sleep`` drives the callback with
deterministic mic frames, so the full main() path — arg parsing, model
load, jitted fast-step state carry, gain/clip output stage, timed
auto-stop — runs headless. Reference behavior being mirrored:
rtmds.py:25-98 (duplex stream, x2 gain, denoise path disabled there; ours
is wired in, ``--no-denoise`` restores the reference behavior).
"""

import json
import sys
import types

import numpy as np
import pytest
import jax

from audio_denoising_tpu.config import (
    Config, DSPConfig, ModelConfig, ServingConfig)
from audio_denoising_tpu.models import build_model


def _tiny_ckpt(tmp_path):
    from audio_denoising_tpu.compat.npz_store import save_params_npz
    cfg = Config(
        dsp=DSPConfig(sample_rate=16000, n_fft=256, hop_length=128,
                      n_mels=32, domain="mel", reconstruction="phase"),
        model=ModelConfig(arch="GRUUNet2", hidden_sizes=(6, 6, 6),
                          kernel_sizes=(3, 3, 3), strides=(2, 2, 2),
                          paddings=(1, 1, 1), num_compressed_bins=4),
        serving=ServingConfig(chunk_samples=128),
    )
    model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
    params = {k: np.asarray(v)
              for k, v in model.init(jax.random.PRNGKey(0)).items()}
    path = str(tmp_path / "tiny.npz")
    save_params_npz(path, params,
                    {"full_config": json.loads(cfg.to_json())})
    return path


class _FakeSounddevice(types.ModuleType):
    """Drives the registered duplex callback from sleep(): one callback
    invocation per 'sleep', with a fixed mic tone + noise frame, and
    records every output frame the app writes."""

    def __init__(self):
        super().__init__("sounddevice")
        self.captured = []          # frames written to outdata
        self.fed = []               # frames offered as indata
        self.stream_kw = None
        self._cb = None
        self._rng = np.random.default_rng(7)
        self._t = 0
        outer = self

        class Stream:
            def __init__(self, samplerate, blocksize, channels, dtype,
                         callback, device=None):
                outer.stream_kw = dict(samplerate=samplerate,
                                       blocksize=blocksize,
                                       channels=channels, dtype=dtype,
                                       device=device)
                outer._cb = callback
                self._blocksize = blocksize

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                outer._cb = None
                return False

        self.Stream = Stream

    def sleep(self, ms):
        # one callback per 10 ms of requested sleep — a real device would
        # fire blocksize/samplerate-paced callbacks during the sleep
        assert self._cb is not None, "sleep() outside an open Stream"
        for _ in range(max(1, int(ms) // 10)):
            bs = self.stream_kw["blocksize"]
            n = self.stream_kw["channels"]
            tone = 0.3 * np.sin(
                2 * np.pi * 440.0 * (self._t + np.arange(bs)) / 16000.0)
            self._t += bs
            indata = (tone + 0.05 * self._rng.standard_normal(bs)).astype(
                np.float32)[:, None].repeat(n, axis=1)
            outdata = np.zeros((bs, n), np.float32)
            self._cb(indata, outdata, bs, None, None)
            self.fed.append(indata[:, 0].copy())
            self.captured.append(outdata[:, 0].copy())


@pytest.fixture()
def fake_sd(monkeypatch):
    fake = _FakeSounddevice()
    monkeypatch.setitem(sys.modules, "sounddevice", fake)
    return fake


def test_loopback_denoise_path(tmp_path, fake_sd):
    from audio_denoising_tpu.apps import loopback
    ckpt = _tiny_ckpt(tmp_path)
    rc = loopback.main(["--model", ckpt, "--seconds", "0.06",
                        "--gain", "1.0"])
    assert rc == 0
    # device clocked at the MODEL's rate and hop (not the 48k default)
    assert fake_sd.stream_kw["samplerate"] == 16000
    assert fake_sd.stream_kw["blocksize"] == 128
    assert len(fake_sd.captured) >= 1
    for out, mic in zip(fake_sd.captured, fake_sd.fed):
        assert out.shape == mic.shape and out.dtype == np.float32
        assert np.all(np.abs(out) <= 1.0)
    # the denoiser is actually in the path: after the OLA warmup frame,
    # output is NOT the raw mic frame (reference rtmds disables its
    # denoiser; ours must not silently do the same)
    assert not np.allclose(fake_sd.captured[-1], fake_sd.fed[-1],
                           atol=1e-4)


def test_loopback_state_carries_across_frames(tmp_path, fake_sd):
    """Same mic frame twice must produce different outputs (the fast
    step's ring/OLA/hx state advances) — a stateless re-init per
    callback would produce identical frames."""
    from audio_denoising_tpu.apps import loopback
    ckpt = _tiny_ckpt(tmp_path)
    fake_sd._rng = np.random.default_rng(7)

    # freeze the mic input: constant frame every callback
    def const_sleep(ms):
        for _ in range(max(1, int(ms) // 10)):
            bs = fake_sd.stream_kw["blocksize"]
            n = fake_sd.stream_kw["channels"]
            indata = np.full((bs, n), 0.25, np.float32)
            outdata = np.zeros((bs, n), np.float32)
            fake_sd._cb(indata, outdata, bs, None, None)
            fake_sd.fed.append(indata[:, 0].copy())
            fake_sd.captured.append(outdata[:, 0].copy())

    fake_sd.sleep = const_sleep
    loopback.main(["--model", ckpt, "--seconds", "0.03", "--gain", "1.0"])
    outs = fake_sd.captured
    assert len(outs) >= 2
    assert not np.allclose(outs[0], outs[1])


def test_loopback_no_denoise_is_reference_passthrough(fake_sd):
    from audio_denoising_tpu.apps import loopback
    rc = loopback.main(["--no-denoise", "--seconds", "0.004"])
    assert rc == 0
    # reference rtmds device clock: 48 kHz, 768-sample blocks, x2 gain
    assert fake_sd.stream_kw["samplerate"] == 48000
    assert fake_sd.stream_kw["blocksize"] == 768
    out, mic = fake_sd.captured[0], fake_sd.fed[0]
    np.testing.assert_allclose(out, np.clip(mic * 2.0, -1.0, 1.0),
                               atol=1e-6)


def test_loopback_errors_without_sounddevice(monkeypatch):
    from audio_denoising_tpu.apps import loopback
    monkeypatch.setattr(loopback, "sounddevice_available", lambda: False)
    with pytest.raises(SystemExit):
        loopback.main(["--no-denoise", "--seconds", "0.001"])
