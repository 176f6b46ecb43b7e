"""Native C++ host runtime vs numpy reference semantics."""

import numpy as np
import pytest

from audio_denoising_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.native_available(),
    reason="native library unavailable (no g++?)")


class TestPCM:
    def test_pcm16_round_trip(self, rng):
        x = (rng.standard_normal(10000) * 0.5).astype(np.float32)
        pcm = native.f32_to_pcm16(x)
        ref = (np.clip(x, -1, 1) * 32767.0).astype(np.int16)
        np.testing.assert_array_equal(pcm, ref)
        back = native.pcm16_to_f32(pcm)
        np.testing.assert_allclose(back, pcm.astype(np.float32) / 32768.0)

    def test_f32_to_pcm16_clips(self):
        x = np.asarray([-2.0, -1.0, 0.0, 1.0, 2.0], np.float32)
        pcm = native.f32_to_pcm16(x)
        np.testing.assert_array_equal(
            pcm, np.asarray([-32767, -32767, 0, 32767, 32767], np.int16))

    def test_pcm24(self, rng):
        vals = rng.integers(-(1 << 23), 1 << 23, 1000, dtype=np.int32)
        raw = np.zeros(3000, np.uint8)
        raw[0::3] = vals & 0xFF
        raw[1::3] = (vals >> 8) & 0xFF
        raw[2::3] = (vals >> 16) & 0xFF
        out = native.pcm24_to_f32(raw)
        np.testing.assert_allclose(out, vals.astype(np.float64) / (1 << 23),
                                   atol=1e-7)

    def test_deinterleave(self, rng):
        x = rng.standard_normal(12 * 2).astype(np.float32)
        out = native.deinterleave(x, 2)
        np.testing.assert_array_equal(out, x.reshape(-1, 2).T)


class TestHelpers:
    def test_peak(self, rng):
        x = rng.standard_normal(5000).astype(np.float32)
        assert native.peak(x) == pytest.approx(float(np.abs(x).max()))

    def test_combine_clips(self, rng):
        a = rng.standard_normal(1000).astype(np.float32)
        b = rng.standard_normal(1000).astype(np.float32)
        out = native.combine(a, b)
        np.testing.assert_allclose(out, np.clip(a + b, -1, 1), atol=1e-7)


class TestChunker:
    def test_residue_carry(self, rng):
        """Matches the buffer_stream contract: arbitrary pushes, exact
        fixed-size pops, residue carried (utils.py:244-259)."""
        chunker = native.NativeChunker(chunk_size=768)
        stream = rng.standard_normal(10_000).astype(np.float32)
        got = []
        pos = 0
        for size in [100, 1536, 5, 3000, 768, 4591]:
            chunker.push(stream[pos:pos + size])
            pos += size
            while (c := chunker.pop()) is not None:
                got.append(c)
        got = np.concatenate(got)
        n_full = (pos // 768) * 768
        np.testing.assert_array_equal(got, stream[:n_full])
        assert chunker.pending == pos - n_full

    def test_ring_growth(self, rng):
        chunker = native.NativeChunker(chunk_size=10, capacity=16)
        stream = rng.standard_normal(1000).astype(np.float32)
        chunker.push(stream)       # forces multiple regrows
        got = []
        while (c := chunker.pop()) is not None:
            got.append(c)
        np.testing.assert_array_equal(np.concatenate(got), stream)

    def test_interleaved_push_pop(self, rng):
        chunker = native.NativeChunker(chunk_size=7)
        stream = rng.standard_normal(200).astype(np.float32)
        out = []
        for i in range(0, 200, 13):
            chunker.push(stream[i:i + 13])
            c = chunker.pop()          # at most one pop per push
            if c is not None:
                out.append(c)
        while (c := chunker.pop()) is not None:
            out.append(c)
        np.testing.assert_array_equal(np.concatenate(out),
                                      stream[:(200 // 7) * 7])


class TestWavioIntegration:
    def test_wav_round_trip_uses_native(self, tmp_path, rng):
        from audio_denoising_tpu.io.wavio import read_wav, write_wav
        x = (rng.standard_normal((2, 4800)) * 0.3).astype(np.float32)
        p = str(tmp_path / "t.wav")
        write_wav(p, x, 48000)
        back, sr = read_wav(p)
        assert sr == 48000
        # ~2 LSB: truncating encode at /32767 + decode at /32768 (the
        # reference's asymmetric PCM scaling, app2.py:177,246), plus
        # clipping of the gaussian tails beyond +-1
        np.testing.assert_allclose(back, np.clip(x, -1.0, 1.0),
                                   atol=2.1 / 32767)
