"""Golden tests of the DSP ops against torch core.

torchaudio is unavailable in this environment, but its transforms are thin
wrappers over torch core (torch.stft/istft, a published filterbank formula,
torch.linalg.lstsq): the goldens below re-derive those semantics with torch
core ops, which is exactly what torchaudio executes internally.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audio_denoising_tpu import ops


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


class TestWindow:
    def test_hann_matches_torch(self):
        for n in (4, 512, 1024, 1536):
            ours = np.asarray(ops.hann_window(n))
            ref = torch.hann_window(n).numpy()
            np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestSTFT:
    @pytest.mark.parametrize("n_fft,hop,length", [
        (1536, 768, 1536),   # WebRTC path frame (app2.py:28-32)
        (1024, 512, 4800),   # socket path (server.py:166-170)
        (480, 384, 48000),   # legacy era (utils.py:32-37)
        (256, 100, 1000),    # non-divisible hop
    ])
    def test_stft_matches_torch(self, rng, n_fft, hop, length):
        x = _rand(rng, 2, length)
        ours = np.asarray(ops.stft(jnp.asarray(x), n_fft, hop))
        ref = torch.stft(torch.from_numpy(x), n_fft, hop,
                         window=torch.hann_window(n_fft),
                         center=True, pad_mode="reflect",
                         return_complex=True).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)

    def test_stft_win_length_padding(self, rng):
        x = _rand(rng, 1, 2000)
        ours = np.asarray(ops.stft(jnp.asarray(x), 512, 128, win_length=400))
        ref = torch.stft(torch.from_numpy(x), 512, 128, win_length=400,
                         window=torch.hann_window(400), center=True,
                         pad_mode="reflect", return_complex=True).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)

    @pytest.mark.parametrize("n_fft,hop,length", [
        (1024, 512, 4800),
        (1536, 768, 6144),
    ])
    def test_istft_matches_torch(self, rng, n_fft, hop, length):
        x = _rand(rng, 2, length)
        spec = torch.stft(torch.from_numpy(x), n_fft, hop,
                          window=torch.hann_window(n_fft), center=True,
                          pad_mode="reflect", return_complex=True)
        ref = torch.istft(spec, n_fft, hop, window=torch.hann_window(n_fft),
                          center=True).numpy()
        ours = np.asarray(ops.istft(jnp.asarray(spec.numpy()), n_fft, hop))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)

    def test_istft_length_arg(self, rng):
        x = _rand(rng, 1, 4800)
        spec = ops.stft(jnp.asarray(x), 1024, 512)
        y = ops.istft(spec, 1024, 512, length=4800)
        assert y.shape == (1, 4800)
        # round trip is near-exact where the window envelope is healthy
        np.testing.assert_allclose(np.asarray(y)[0, 1024:-1024],
                                   x[0, 1024:-1024], atol=1e-4)

    def test_istft_length_matches_torch_on_modified_spec(self, rng):
        """torch.istft with an explicit length takes samples from the start
        offset INTO the tail that the no-length path would trim — exercised
        with a non-consistent (modified-magnitude) spectrogram, the serving
        path's actual input (server.py:215-216)."""
        x = _rand(rng, 1, 4800)
        spec = torch.stft(torch.from_numpy(x), 1024, 512,
                          window=torch.hann_window(1024), center=True,
                          pad_mode="reflect", return_complex=True)
        spec = spec * torch.rand(spec.shape)  # break consistency
        ref = torch.istft(spec, 1024, 512, window=torch.hann_window(1024),
                          length=4800).numpy()
        ours = np.asarray(ops.istft(jnp.asarray(spec.numpy()), 1024, 512,
                                    length=4800))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)

    def test_num_frames(self):
        assert ops.num_frames(1536, 1536, 768) == 3
        assert ops.num_frames(4800, 1024, 512) == 10


def _torch_mel_fb(n_stft, n_mels, sr):
    """torchaudio melscale_fbanks(norm=None, mel_scale='htk') re-derived."""
    all_freqs = torch.linspace(0, sr // 2, n_stft)
    def hz2mel(f):
        return 2595.0 * torch.log10(1.0 + f / 700.0)
    m_min = hz2mel(torch.tensor(0.0))
    m_max = hz2mel(torch.tensor(sr / 2.0))
    m_pts = torch.linspace(m_min.item(), m_max.item(), n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return torch.clamp(torch.min(down, up), min=0)


class TestMel:
    @pytest.mark.parametrize("n_stft,n_mels,sr", [
        (769, 64, 48000),   # app2 path
        (513, 64, 48000),   # server path
        (241, 22, 48000),   # MOMO3 era
    ])
    def test_filterbank(self, n_stft, n_mels, sr):
        ours = np.asarray(ops.mel_filterbank(n_stft, n_mels, sr))
        ref = _torch_mel_fb(n_stft, n_mels, sr).numpy()
        assert ours.shape == (n_stft, n_mels)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_mel_scale_apply(self, rng):
        spec = np.abs(_rand(rng, 2, 769, 3))
        fb = ops.mel_filterbank(769, 64, 48000)
        ours = np.asarray(ops.mel_scale(jnp.asarray(spec), fb))
        ref = torch.matmul(torch.from_numpy(spec).transpose(-1, -2),
                           _torch_mel_fb(769, 64, 48000)).transpose(-1, -2).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)

    def test_inverse_mel_solves_system(self, rng):
        """relu(pinv) solution must satisfy fb.T @ X = mel on realistic
        (non-negative) mel inputs to lstsq-level accuracy."""
        fb = np.asarray(ops.mel_filterbank(769, 64, 48000))
        mag = np.abs(_rand(rng, 1, 769, 5))
        mel = np.einsum("bft,fm->bmt", mag, fb)
        inv = ops.inverse_mel_matrix(769, 64, 48000)
        est = np.asarray(ops.inverse_mel_scale(jnp.asarray(mel), inv))
        assert est.min() >= 0.0
        mel_rt = np.einsum("bft,fm->bmt", est, fb)
        np.testing.assert_allclose(mel_rt, mel, atol=2e-2, rtol=1e-3)

    def test_inverse_close_to_torch_lstsq_residual(self, rng):
        """Our min-norm solve achieves the same residual as torch lstsq."""
        fb_t = _torch_mel_fb(769, 64, 48000)
        mel = torch.rand(1, 64, 4)
        sol = torch.linalg.lstsq(fb_t.T[None], mel).solution
        ours = np.asarray(ops.inverse_mel_scale(
            jnp.asarray(mel.numpy()), ops.inverse_mel_matrix(769, 64, 48000)))
        res_t = (fb_t.T[None] @ torch.relu(sol) - mel).abs().max().item()
        res_o = np.abs(np.einsum("fm,bft->bmt", fb_t.numpy(), ours) -
                       mel.numpy()).max()
        assert res_o <= res_t + 2e-2


class TestCompress:
    def test_clamp_roundtrip(self, rng):
        x = _rand(rng, 100) * 10
        y = np.asarray(ops.signed_log_clamp(jnp.asarray(x)))
        ref = (np.log(np.abs(x) + 1) * np.sign(x))
        np.testing.assert_allclose(y, ref, atol=1e-6)
        back = np.asarray(ops.signed_log_unclamp(jnp.asarray(y)))
        np.testing.assert_allclose(back, x, atol=1e-4, rtol=1e-5)

    def test_wrap_unwrap(self, rng):
        z = (_rand(rng, 2, 5, 3) + 1j * _rand(rng, 2, 5, 3)).astype(np.complex64)
        u = ops.unwrap_complex(jnp.asarray(z))
        assert u.shape == (2, 2, 5, 3)
        back = np.asarray(ops.wrap_complex(u))
        np.testing.assert_allclose(back, z, atol=1e-6)

    def test_normalize_roundtrip(self, rng):
        x = _rand(rng, 1, 241, 7)
        y = ops.normalize_stds(jnp.asarray(x))
        back = np.asarray(ops.denormalize_stds(y))
        np.testing.assert_allclose(back, x, atol=1e-5)


class TestGriffinLim:
    def test_converges_to_magnitude(self, rng):
        """After n_iter rounds, |STFT(y)| must approximate the target
        magnitude of a real signal (the reconstruction property GL provides)."""
        t = np.linspace(0, 1, 4800).astype(np.float32)
        x = (0.7 * np.sin(2 * np.pi * 440 * t) +
             0.3 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)[None]
        mag = jnp.abs(ops.stft(jnp.asarray(x), 1024, 256))
        y = ops.griffin_lim(mag, 1024, 256, n_iter=32, length=4800)
        assert y.shape == (1, 4800)
        mag_y = jnp.abs(ops.stft(y, 1024, 256))
        err = np.abs(np.asarray(mag_y) - np.asarray(mag)).mean()
        scale = np.abs(np.asarray(mag)).mean()
        # torch-core GL with the same unit-phase init reaches ~0.10 relative
        # error on this signal; GL iterates are chaotic so allow headroom.
        assert err / scale < 0.2

    def test_matches_torch_griffinlim_structure(self, rng):
        """Lockstep comparison with a torch-core reimplementation of
        torchaudio.functional.griffinlim (deterministic unit-phase init)."""
        mag_np = np.abs(_rand(rng, 1, 513, 7))
        n_fft, hop, n_iter, momentum = 1024, 512, 8, 0.99
        win = torch.hann_window(n_fft)

        specgram = torch.from_numpy(mag_np)
        angles = torch.full(specgram.size(), 1.0, dtype=torch.complex64)
        tprev = torch.tensor(0.0, dtype=torch.complex64)
        for _ in range(n_iter):
            inverse = torch.istft(specgram * angles, n_fft, hop, window=win)
            rebuilt = torch.stft(inverse, n_fft, hop, window=win, center=True,
                                 pad_mode="reflect", return_complex=True)
            angles = rebuilt - tprev * (momentum / (1 + momentum))
            angles = angles / (angles.abs() + 1e-16)
            tprev = rebuilt
        ref = torch.istft(specgram * angles, n_fft, hop, window=win).numpy()

        ours = np.asarray(ops.griffin_lim(
            jnp.asarray(mag_np), n_fft, hop, n_iter=n_iter, momentum=momentum))
        np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=1e-3)


class TestResample:
    @pytest.mark.parametrize("orig,new", [(44100, 48000), (48000, 44100),
                                          (8000, 48000), (48000, 16000)])
    def test_matches_torchaudio_algorithm(self, rng, orig, new):
        """Compare against a torch-core re-derivation of torchaudio's
        sinc_interp_hann polyphase resampler."""
        import math
        x = _rand(rng, 1, 8000)

        g = math.gcd(orig, new)
        o, n = orig // g, new // g
        base = min(o, n) * 0.99
        width = math.ceil(6 * o / base)
        idx = torch.arange(-width, width + o, dtype=torch.float64)[None] / o
        t = torch.arange(0, -n, -1, dtype=torch.float64)[:, None] / n + idx
        t = (t * base).clamp_(-6, 6)
        window = torch.cos(t * math.pi / 12) ** 2
        t = t * math.pi
        kern = torch.where(t == 0, torch.tensor(1.0, dtype=torch.float64),
                           t.sin() / t) * window * (base / o)
        kern = kern.to(torch.float32)[:, None]
        xt = torch.from_numpy(x)
        padded = torch.nn.functional.pad(xt, (width, width + o))
        res = torch.nn.functional.conv1d(padded[:, None], kern, stride=o)
        res = res.transpose(1, 2).reshape(1, -1)
        target = int(math.ceil(n * x.shape[-1] / o))
        ref = res[..., :target].numpy()

        ours = np.asarray(ops.resample(jnp.asarray(x), orig, new))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    def test_identity(self, rng):
        x = _rand(rng, 1, 100)
        np.testing.assert_array_equal(
            np.asarray(ops.resample(jnp.asarray(x), 48000, 48000)), x)


class TestConvs:
    def test_conv1d_matches_torch(self, rng):
        x = _rand(rng, 2, 7, 64)
        w = _rand(rng, 17, 7, 3)
        b = _rand(rng, 17)
        ours = np.asarray(ops.conv1d(jnp.asarray(x), jnp.asarray(w),
                                     jnp.asarray(b), stride=2, padding=1))
        ref = torch.nn.functional.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                                         torch.from_numpy(b), stride=2,
                                         padding=1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("in_len,out_len,k,s,p", [
        (4, 8, 3, 2, 1), (8, 16, 3, 2, 1),     # GRUUNet2 levels
        (3, 5, 3, 2, 1), (5, 11, 3, 2, 0),     # MOMO3 asymmetric up path
        (11, 22, 3, 2, 1),
    ])
    def test_conv_transpose1d_output_size(self, rng, in_len, out_len, k, s, p):
        x = _rand(rng, 2, 23, in_len)
        w = _rand(rng, 23, 17, k)
        b = _rand(rng, 17)
        op = ops.transpose_output_padding(in_len, out_len, k, s, p)
        ours = np.asarray(ops.conv_transpose1d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
            stride=s, padding=p, output_padding=op))
        ref = torch.nn.functional.conv_transpose1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=s, padding=p, output_padding=op).numpy()
        assert ours.shape[-1] == out_len
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    def test_conv2d_matches_torch(self, rng):
        x = _rand(rng, 1, 33, 241, 17)
        w = _rand(rng, 64, 33, 3, 3)
        b = _rand(rng, 64)
        ours = np.asarray(ops.conv2d(jnp.asarray(x), jnp.asarray(w),
                                     jnp.asarray(b), stride=2, padding=1))
        ref = torch.nn.functional.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                                         torch.from_numpy(b), stride=2,
                                         padding=1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)

    def test_conv_transpose2d_matches_torch(self, rng):
        x = _rand(rng, 1, 64, 8, 4)
        w = _rand(rng, 64, 64, 4, 3)
        b = _rand(rng, 64)
        ours = np.asarray(ops.conv_transpose2d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
            stride=(3, 2), padding=1, output_padding=0))
        ref = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=(3, 2), padding=1, output_padding=0).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)

    def test_depthwise_conv1d(self, rng):
        x = _rand(rng, 2, 128, 64)
        w = _rand(rng, 128, 1, 3)
        ours = np.asarray(ops.conv1d(jnp.asarray(x), jnp.asarray(w),
                                     stride=1, padding=1, groups=128))
        ref = torch.nn.functional.conv1d(torch.from_numpy(x),
                                         torch.from_numpy(w), stride=1,
                                         padding=1, groups=128).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)
