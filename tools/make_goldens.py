"""Generate parity goldens by EXECUTING the reference model code (mounted
read-only at /root/reference) on real checkpoint weights, with its
unavailable I/O deps (av, sounddevice, torchaudio, streamlit) stubbed.

Nothing from the reference is copied — its modules are imported and run to
capture (input, output, state) triples that the JAX reimplementations must
reproduce. Goldens land in tests/goldens/*.npz. Run once:

    python tools/make_goldens.py
"""

import os
import sys
import types
from unittest import mock

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

# ---- stub out the reference's unavailable imports, then import its modules
for name in ["av", "sounddevice", "torchaudio", "torchaudio.transforms",
             "torchvision", "torchvision.transforms", "streamlit"]:
    sys.modules.setdefault(name, mock.MagicMock(name=name))

sys.path.insert(0, REF)

import torch  # noqa: E402

torch.manual_seed(0)

import gruunet2 as ref_gruunet2  # noqa: E402
import gruunet as ref_gruunet    # noqa: E402
import momo as ref_momo          # noqa: E402
import momo2 as ref_momo2        # noqa: E402
import momo3 as ref_momo3        # noqa: E402
import unet as ref_unet          # noqa: E402
import unet2 as ref_unet2        # noqa: E402
import unet3 as ref_unet3        # noqa: E402
import unet4 as ref_unet4        # noqa: E402
import trunet as ref_trunet      # noqa: E402
import gru as ref_gru            # noqa: E402

# gru.py's _gru_cell references F without importing it (latent bug,
# gru.py:128,193); supply the intended symbol so the code path can run.
ref_gru.F = torch.nn.functional


def _save(name, **arrays):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, name + ".npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path}: {sorted(arrays)[:6]}{'...' if len(arrays) > 6 else ''}")


def _sd_to_np(sd):
    return {"sd." + k: v.detach().numpy() for k, v in sd.items()}


def golden_checkpointed_recurrent():
    """GRUUNet2 (3 ckpts) + MOMO3 on their shipped weights."""
    rng = np.random.default_rng(42)
    specs = [
        ("GRUUNet2-dari_tult", ref_gruunet2.GRUUNet2, 64),
        ("GRUUNet2-good", ref_gruunet2.GRUUNet2, 64),
        ("MOMO3-4d4ea0", ref_momo3.MOMO3, 22),
    ]
    for name, cls, nbins in specs:
        ck = torch.load(os.path.join(REF, "saves", name, "checkpoint.pth"),
                        map_location="cpu", weights_only=False)
        model = cls(**ck["config"])
        model.load_state_dict(ck["model_state_dict"])
        model.eval()

        x = rng.standard_normal((2, 7, nbins)).astype(np.float32)
        with torch.no_grad():
            out, hx = model(torch.from_numpy(x))
            # second call continues from carried state
            out2, hx2 = model(torch.from_numpy(x[:, :3]), hx)
        # 2D (unbatched) path quirk: input (T, F)
        with torch.no_grad():
            out_2d, hx_2d = model(torch.from_numpy(x[0]))
        _save(f"model_{name}",
              x=x, out=out.numpy(), hx=hx.numpy(),
              out2=out2.numpy(), hx2=hx2.numpy(),
              out_2d=out_2d.numpy(), hx_2d=hx_2d.numpy())


def golden_random_weight_models():
    """Archs without shipped checkpoints: random-init torch weights are
    exported alongside input/output so the JAX ports load the same weights."""
    rng = np.random.default_rng(7)

    # --- GRUUNet (v1): same config family as GRUUNet2
    torch.manual_seed(1)
    m = ref_gruunet.GRUUNet(num_compressed_bins=4, in_size=1,
                            hidden_sizes=(17, 17, 17, 17),
                            kernel_sizes=(3, 3, 3, 3), strides=(2, 2, 2, 2),
                            paddings=(1, 1, 1, 1))
    m.eval()
    x = rng.standard_normal((2, 5, 64)).astype(np.float32)
    with torch.no_grad():
        out, hx = m(torch.from_numpy(x))
    _save("model_GRUUNet-rand", x=x, out=out.numpy(), hx=hx.numpy(),
          **_sd_to_np(m.state_dict()))

    # --- MOMO2
    torch.manual_seed(2)
    m = ref_momo2.MOMO2(num_compressed_bins=3, in_size=1,
                        hidden_sizes=(16, 16, 16), kernel_sizes=(3, 3, 3),
                        strides=(2, 2, 2), paddings=(1, 0, 1))
    m.eval()
    x = rng.standard_normal((2, 5, 22)).astype(np.float32)
    with torch.no_grad():
        out, hx = m(torch.from_numpy(x))
    _save("model_MOMO2-rand", x=x, out=out.numpy(), hx=hx.numpy(),
          **_sd_to_np(m.state_dict()))

    # --- MOMO (v1): hx is a full-resolution frame
    torch.manual_seed(3)
    m = ref_momo.MOMO(num_bins=22, in_size=1, hidden_sizes=(16, 16, 16),
                      kernel_sizes=(3, 3, 3), strides=(2, 2, 2),
                      paddings=(1, 0, 1))
    m.eval()
    x = rng.standard_normal((2, 4, 22)).astype(np.float32)
    with torch.no_grad():
        out, hx = m(torch.from_numpy(x))
    _save("model_MOMO-rand", x=x, out=out.numpy(), hx=hx.numpy(),
          **_sd_to_np(m.state_dict()))

    # --- 2D U-Nets; find a time length each torch model accepts
    for name, mod, cls_name in [("UNet2d", ref_unet, "UNet2d"),
                                ("UNet2d3", ref_unet3, "UNet2d3"),
                                ("UNet2d4", ref_unet4, "UNet2d4")]:
        torch.manual_seed(4)
        m = getattr(mod, cls_name)()
        m.eval()
        bins = mod.BINS
        t_ok, y = None, None
        for t in range(30, 200):
            xin = rng.standard_normal((1, bins, t)).astype(np.float32)
            try:
                with torch.no_grad():
                    y = m(torch.from_numpy(xin))
                t_ok = t
                x = xin
                break
            except RuntimeError:
                continue
        assert t_ok is not None, name
        _save(f"model_{name}-rand", x=x, out=y.numpy(),
              t_ok=np.array(t_ok), bins=np.array(bins),
              **_sd_to_np(m.state_dict()))

    # --- TRUNet (vendored third-party; trunet.py:122-158)
    torch.manual_seed(5)
    m = ref_trunet.TRUNet()
    m.eval()
    x = rng.standard_normal((2, 4, 257)).astype(np.float32)
    with torch.no_grad():
        y = m(torch.from_numpy(x))
    _save("model_TRUNet-rand", x=x, out=y.numpy(), **_sd_to_np(m.state_dict()))

    # --- custom unrolled GRU (gru.py:81-231)
    torch.manual_seed(6)
    m = ref_gru.GRU(input_size=12, hidden_size=20, num_layers=2,
                    batch_first=True)
    m.eval()
    x = rng.standard_normal((3, 9, 12)).astype(np.float32)
    with torch.no_grad():
        out, h = m(torch.from_numpy(x))
    _save("model_GRU-rand", x=x, out=out.numpy(), h=h.numpy(),
          **_sd_to_np(m.state_dict()))


def golden_streaming_pipeline():
    """End-to-end WebRTC-path golden: replicate app2.py's recv hot loop
    (app2.py:174-233) with torch-core DSP (torchaudio semantics re-derived)
    so the full JAX pipeline can be compared sample-for-sample."""
    import math

    ck = torch.load(os.path.join(REF, "saves", "GRUUNet2-dari_tult", "checkpoint.pth"),
                    map_location="cpu", weights_only=False)
    model = ref_gruunet2.GRUUNet2(**ck["config"])
    model.load_state_dict(ck["model_state_dict"])
    model.eval()

    n_fft, hop, n_mels, sr = 1536, 768, 64, 48000
    win = torch.hann_window(n_fft)

    # mel fb per torchaudio melscale_fbanks(htk, norm=None)
    all_freqs = torch.linspace(0, sr // 2, n_fft // 2 + 1)
    m_pts = torch.linspace(0.0, 2595.0 * math.log10(1.0 + (sr / 2.0) / 700.0),
                           n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    fb = torch.clamp(torch.min(-slopes[:, :-2] / f_diff[:-1],
                               slopes[:, 2:] / f_diff[1:]), min=0)

    rng = np.random.default_rng(11)
    t = np.arange(sr // 2, dtype=np.float32) / sr
    clean = 0.5 * np.sin(2 * np.pi * 350 * t).astype(np.float32)
    noise = 0.1 * rng.standard_normal(t.shape).astype(np.float32)
    audio = np.clip(clean + noise, -1, 1)

    hx = None
    frames_in, mels, residuals, recon_mags = [], [], [], []
    buf = audio.copy()
    steps = 0
    while len(buf) >= n_fft and steps < 6:
        cur = buf[:n_fft]
        peak = float(np.max(np.abs(cur)))
        if peak > 1e-6:
            norm = cur / peak
        else:
            norm, peak = cur, 1.0
        windowed = norm * win.numpy()
        wt = torch.from_numpy(windowed).float().unsqueeze(0)
        spec = torch.stft(wt, n_fft, hop, window=win, center=True,
                          pad_mode="reflect", return_complex=True)
        mag = spec.abs()
        mel = (mag.transpose(-1, -2) @ fb).transpose(-1, -2).log1p()
        model_in = mel.transpose(-1, -2)
        if hx is None:
            hx = torch.zeros(1, 17, 4)
        with torch.no_grad():
            resid, hx = model(model_in, hx)
        recon = torch.nn.functional.leaky_relu(model_in - resid, 0.2)
        recon_mag = torch.clamp(torch.expm1(recon.transpose(-1, -2)), min=0)
        frames_in.append(windowed)
        mels.append(model_in.numpy())
        residuals.append(resid.numpy())
        recon_mags.append(recon_mag.numpy())
        buf = buf[hop:]
        steps += 1

    _save("pipeline_webrtc_GRUUNet2-dari_tult",
          audio=audio[: n_fft + hop * (steps - 1) + hop],
          frames_in=np.stack(frames_in),
          mels=np.concatenate(mels),
          residuals=np.concatenate(residuals),
          recon_mags=np.concatenate(recon_mags),
          final_hx=hx.numpy())


def golden_webrtc_waveform():
    """Waveform-level webrtc golden: the app2.py loop (app2.py:174-233)
    ALL THE WAY to the emitted audio — inverse mel, GriffinLim-32, peak
    de-norm, overlap-add. torch-core reimplementation of the torchaudio
    pieces (torchaudio wheel unavailable here): GriffinLim follows
    torchaudio.functional.griffinlim's momentum iteration exactly, with
    ``rand_init=False`` (deterministic all-ones phase init — torchaudio's
    default random init makes waveform goldens irreproducible; our
    ops/griffinlim.py defaults to the same 'ones' init). InverseMelScale
    is the relu'd pseudo-inverse (the documented parity-mode choice, see
    ops/mel.py — torchaudio 2.6 runs an lstsq per call)."""
    import math

    ck = torch.load(os.path.join(REF, "saves", "GRUUNet2-dari_tult",
                                 "checkpoint.pth"),
                    map_location="cpu", weights_only=False)
    model = ref_gruunet2.GRUUNet2(**ck["config"])
    model.load_state_dict(ck["model_state_dict"])
    model.eval()

    n_fft, hop, n_mels, sr = 1536, 768, 64, 48000
    n_iter, momentum = 32, 0.99
    win = torch.hann_window(n_fft)
    all_freqs = torch.linspace(0, sr // 2, n_fft // 2 + 1)
    m_pts = torch.linspace(0.0, 2595.0 * math.log10(1.0 + (sr / 2.0) / 700.0),
                           n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    fb = torch.clamp(torch.min(-slopes[:, :-2] / f_diff[:-1],
                               slopes[:, 2:] / f_diff[1:]), min=0)  # (F, M)
    fb_pinv = torch.linalg.pinv(fb.double(), rcond=1e-8).float()    # (M, F)

    def griffin_lim32(mag):
        """torchaudio.functional.griffinlim structure, rand_init=False."""
        mom = momentum / (1 + momentum)
        angles = torch.full_like(mag, 1.0).to(torch.complex64)
        tprev = torch.zeros_like(angles)
        for _ in range(n_iter):
            inverse = torch.istft(mag * angles, n_fft, hop, window=win)
            rebuilt = torch.stft(inverse, n_fft, hop, window=win,
                                 center=True, pad_mode="reflect",
                                 return_complex=True)
            upd = rebuilt - mom * tprev
            angles = upd / (upd.abs() + 1e-16)
            tprev = rebuilt
        return torch.istft(mag * angles, n_fft, hop, window=win)

    rng = np.random.default_rng(11)
    t = np.arange(sr // 2, dtype=np.float32) / sr
    clean = 0.5 * np.sin(2 * np.pi * 350 * t).astype(np.float32)
    noise = 0.1 * rng.standard_normal(t.shape).astype(np.float32)
    audio = np.clip(clean + noise, -1, 1)

    hx = None
    out_buffer = np.zeros(n_fft, np.float32)       # app2.py:140 OLA buffer
    out_hops = []
    buf = audio.copy()
    steps = 0
    while len(buf) >= n_fft and steps < 6:
        cur = buf[:n_fft]
        peak = float(np.max(np.abs(cur)))
        if peak > 1e-6:
            norm = cur / peak
        else:
            norm, peak = cur, 1.0
        windowed = norm * win.numpy()
        wt = torch.from_numpy(windowed).float().unsqueeze(0)
        spec = torch.stft(wt, n_fft, hop, window=win, center=True,
                          pad_mode="reflect", return_complex=True)
        mel = (spec.abs().transpose(-1, -2) @ fb).transpose(-1, -2).log1p()
        model_in = mel.transpose(-1, -2)
        if hx is None:
            hx = torch.zeros(1, 17, 4)
        with torch.no_grad():
            resid, hx = model(model_in, hx)
        recon = torch.nn.functional.leaky_relu(model_in - resid, 0.2)
        mel_mag = torch.clamp(torch.expm1(recon.transpose(-1, -2)), min=0)
        lin = torch.clamp(
            (mel_mag.transpose(-1, -2) @ fb_pinv).transpose(-1, -2), min=0)
        frame = griffin_lim32(lin)[0].numpy() * peak   # app2.py:220-224
        # app2.py:226-231: emit buf[:hop] FIRST, then shift and accumulate
        out_hops.append(out_buffer[:hop].copy())
        out_buffer = np.concatenate(
            [out_buffer[hop:], np.zeros(hop, np.float32)])
        out_buffer[:len(frame)] += frame
        buf = buf[hop:]
        steps += 1

    _save("pipeline_webrtc_waveform_GRUUNet2-dari_tult",
          audio=audio[: n_fft + hop * (steps - 1) + hop],
          out_hops=np.stack(out_hops),
          final_hx=hx.numpy())


def golden_server_pipeline():
    """Socket-path golden (server.py:200-216): 1024/512 transforms, noisy
    phase reuse, relu*3 gain, hx decay 0.9, on GRUUNet2-good weights."""
    import math

    ck = torch.load(os.path.join(REF, "saves", "GRUUNet2-good", "checkpoint.pth"),
                    map_location="cpu", weights_only=False)
    model = ref_gruunet2.GRUUNet2(**ck["config"])
    model.load_state_dict(ck["model_state_dict"])
    model.eval()

    n_fft, hop, n_mels, sr = 1024, 512, 64, 48000
    win = torch.hann_window(n_fft)
    all_freqs = torch.linspace(0, sr // 2, n_fft // 2 + 1)
    m_pts = torch.linspace(0.0, 2595.0 * math.log10(1.0 + (sr / 2.0) / 700.0),
                           n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    fb = torch.clamp(torch.min(-slopes[:, :-2] / f_diff[:-1],
                               slopes[:, 2:] / f_diff[1:]), min=0)
    fb_pinv = torch.linalg.pinv(fb.T.double(), rcond=1e-8).float()

    rng = np.random.default_rng(13)
    x = (0.4 * np.sin(2 * np.pi * 500 * np.arange(4800) / sr) +
         0.05 * rng.standard_normal(4800)).astype(np.float32)

    hx = None
    xt = torch.from_numpy(x).view(1, -1)
    spec = torch.stft(xt, n_fft, hop, window=win, center=True,
                      pad_mode="reflect", return_complex=True)
    phase = spec.angle()
    mag = spec.abs()
    logmel = (mag.transpose(-1, -2) @ fb).transpose(-1, -2).log1p()
    with torch.no_grad():
        out, hx = model(logmel.transpose(-1, -2), hx)
        out = torch.nn.functional.leaky_relu(out.transpose(-1, -2),
                                             negative_slope=0.0) * 3
        hx = hx * 0.9
    target_mel = (logmel - out).exp() - 1
    # min-norm inverse mel (framework semantics; torchaudio uses lstsq)
    o_mag = torch.relu(torch.einsum("fm,bmt->bft", fb_pinv, target_mel))
    rec = torch.polar(o_mag, phase)
    y = torch.istft(rec, n_fft, hop, window=win, length=4800)

    _save("pipeline_server_GRUUNet2-good",
          x=x, phase=phase.numpy(), mag=mag.numpy(),
          logmel=logmel.numpy(), out=out.numpy(),
          target_mel=target_mel.numpy(), o_mag=o_mag.numpy(),
          y=y.numpy(), final_hx=hx.numpy())


if __name__ == "__main__":
    if len(sys.argv) > 1:       # regenerate selected goldens only
        for name in sys.argv[1:]:
            globals()[f"golden_{name}"]()
    else:
        golden_checkpointed_recurrent()
        golden_random_weight_models()
        golden_streaming_pipeline()
        golden_webrtc_waveform()
        golden_server_pipeline()
    print("done")
