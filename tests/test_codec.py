"""System-codec decode (io/codec.py): MP3 via libmpg123, WebM/Opus via the
pure-Python Matroska demux + libopus.

Validation is three-way:
- real files produced by standard tools (the reference's shipped corpora)
  exercise the demuxer/decoder against the wild format;
- a synthesized WebM (libopus encoder + a minimal EBML muxer built here)
  checks signal-level correctness against a known sine;
- an independent decoder (pygame/SDL, when importable) cross-checks the
  MP3 samples.
"""

import ctypes
import glob
import os
import struct

import numpy as np
import pytest

from audio_denoising_tpu.io.codec import (
    _load, codec_available, mp3_available, opus_available, probe_mp3_rate,
    read_mp3, read_webm_opus)
from audio_denoising_tpu.io.cache import AudioCache

_REF = "/root/reference/data/uncompressed"
_SWEEP = os.path.join(_REF, "sine_sweep", "sine_sweep.mp3")
_COUNTDOWN = os.path.join(_REF, "countdown", "cd20_cleaned.mp3")
_NOISE_GLOB = os.path.join(_REF, "kaggle_audioNoiseDataset", "*.webm")

needs_mp3 = pytest.mark.skipif(
    not (mp3_available() and os.path.exists(_SWEEP)),
    reason="libmpg123 or reference mp3 fixtures absent")
needs_opus = pytest.mark.skipif(not opus_available(),
                                reason="libopus absent")


class TestMP3:
    @needs_mp3
    def test_sine_sweep_decodes(self):
        audio, sr = read_mp3(_SWEEP)
        assert sr == 44100
        assert audio.shape[0] == 1              # mono
        assert abs(audio.shape[1] / sr - 20.0) < 0.1
        assert np.all(np.isfinite(audio))
        assert 0.1 < np.abs(audio).max() <= 1.5

    @needs_mp3
    def test_sine_sweep_is_a_sweep(self):
        """Spectral centroid must rise monotonically through the file."""
        audio, sr = read_mp3(_SWEEP)
        x = audio[0]
        n = 4096
        centroids = []
        for start in range(sr, len(x) - sr, (len(x) - 2 * sr) // 8):
            seg = x[start:start + n]
            mag = np.abs(np.fft.rfft(seg * np.hanning(n)))
            freqs = np.fft.rfftfreq(n, 1 / sr)
            centroids.append(float((mag * freqs).sum() / (mag.sum() + 1e-9)))
        assert all(b > a for a, b in zip(centroids, centroids[1:])), centroids

    @needs_mp3
    def test_countdown_decodes(self):
        audio, sr = read_mp3(_COUNTDOWN)
        assert sr == 48000 and audio.shape[0] == 2
        assert np.all(np.isfinite(audio))

    @needs_mp3
    def test_probe_rate_matches_decode(self):
        assert probe_mp3_rate(_SWEEP) == 44100
        assert probe_mp3_rate(_COUNTDOWN) == 48000
        assert AudioCache.probe_rate(_SWEEP) == 44100

    @needs_mp3
    def test_cross_check_independent_decoder(self):
        """mpg123 samples must agree with SDL's decoder (pygame) after
        alignment — two unrelated MP3 implementations."""
        pygame = pytest.importorskip("pygame")
        os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
        ours, sr = read_mp3(_SWEEP)
        pygame.mixer.init(frequency=sr, channels=1)
        try:
            snd = pygame.mixer.Sound(_SWEEP)
            import pygame.sndarray
            theirs = pygame.sndarray.array(snd).astype(np.float32) / 32768.0
        finally:
            pygame.mixer.quit()
        theirs = theirs.reshape(len(theirs), -1).mean(axis=1)
        a = ours[0]
        # align by cross-correlation (decoders differ in delay trimming)
        w = 1 << 15
        a0, b0 = a[sr:sr + w], theirs[sr - 2048:sr + w + 2048]
        corr = np.correlate(b0 - b0.mean(), a0 - a0.mean(), "valid")
        lag = int(np.argmax(corr)) - 2048
        n = min(len(a) - sr - abs(lag), w * 4)
        x = a[sr:sr + n]
        y = theirs[sr + lag:sr + lag + n]
        c = float(np.corrcoef(x, y)[0, 1])
        assert c > 0.99, f"decoders disagree: corr={c}, lag={lag}"


class TestWebMOpus:
    @needs_opus
    @pytest.mark.skipif(not glob.glob(_NOISE_GLOB),
                        reason="reference noise corpus absent")
    def test_noise_corpus_decodes(self):
        files = sorted(glob.glob(_NOISE_GLOB))
        assert len(files) == 10
        for f in files:
            audio, sr = read_webm_opus(f)
            assert sr == 48000
            assert audio.shape[0] == 1
            assert audio.shape[1] > sr          # > 1 s of noise
            assert np.all(np.isfinite(audio))
            assert 1e-4 < np.abs(audio).max() < 1.5
        assert AudioCache.probe_rate(files[0]) == 48000

    @needs_opus
    def test_synthesized_roundtrip(self, tmp_path):
        """Encode a known sine with libopus, mux it into a minimal WebM
        with an independent writer, decode through read_webm_opus, and
        check the signal survives (sample-accurate up to codec noise)."""
        sr, freq, dur = 48000, 440.0, 1.0
        t = np.arange(int(sr * dur), dtype=np.float32) / sr
        sig = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)

        packets, preskip = _opus_encode(sig, sr)
        path = tmp_path / "sine.webm"
        path.write_bytes(_mux_webm(packets, preskip, channels=1))

        audio, rate = read_webm_opus(str(path))
        assert rate == sr and audio.shape[0] == 1
        out = audio[0]
        n = min(len(out), len(sig)) - 2000
        x, y = sig[1000:1000 + n], out[1000:1000 + n]
        c = float(np.corrcoef(x, y)[0, 1])
        assert c > 0.99, f"opus round trip corrupted the signal: corr={c}"

    def test_dispatch_gating(self):
        from audio_denoising_tpu.io.codec import vorbis_available
        assert codec_available("x.mp3") == mp3_available()
        assert codec_available("x.webm") == opus_available()
        assert codec_available("x.ogg") == vorbis_available()
        assert codec_available("x.flac")      # pure-Python, always on
        from audio_denoising_tpu.io.avdec import av_available
        # aac/m4a: linked-FFmpeg bridge (round 4); capability-gated
        assert codec_available("x.m4a") == av_available()
        assert codec_available("x.wma") == av_available()


# ---- fixture builders ------------------------------------------------------

def _opus_encode(sig: np.ndarray, sr: int):
    lib = _load("libopus.so.0", "libopus.so")
    lib.opus_encoder_create.restype = ctypes.c_void_p
    lib.opus_encoder_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int,
                                        ctypes.POINTER(ctypes.c_int)]
    lib.opus_encode_float.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int]
    err = ctypes.c_int(0)
    enc = lib.opus_encoder_create(sr, 1, 2049,  # OPUS_APPLICATION_AUDIO
                                  ctypes.byref(err))
    assert enc and err.value == 0
    look = ctypes.c_int(0)
    lib.opus_encoder_ctl(ctypes.c_void_p(enc), 4027,  # OPUS_GET_LOOKAHEAD
                         ctypes.byref(look))
    frame = 960                                 # 20 ms
    pad = (-len(sig)) % frame
    sig = np.concatenate([sig, np.zeros(pad, np.float32)])
    out = ctypes.create_string_buffer(4000)
    packets = []
    for i in range(0, len(sig), frame):
        seg = np.ascontiguousarray(sig[i:i + frame])
        n = lib.opus_encode_float(
            ctypes.c_void_p(enc),
            seg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame, out, len(out))
        assert n > 0
        packets.append(out.raw[:n])
    lib.opus_encoder_destroy(ctypes.c_void_p(enc))
    return packets, look.value


def _ebml(eid: bytes, payload: bytes) -> bytes:
    n = len(payload)
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            size = ((1 << (7 * length)) | n).to_bytes(length, "big")
            return eid + size + payload
    raise ValueError("payload too large")


def _mux_webm(packets, preskip: int, channels: int) -> bytes:
    opus_head = (b"OpusHead" + bytes([1, channels])
                 + struct.pack("<H", preskip) + struct.pack("<I", 48000)
                 + struct.pack("<h", 0) + bytes([0]))
    track = _ebml(b"\xae", b"".join([
        _ebml(b"\xd7", b"\x01"),                       # TrackNumber = 1
        _ebml(b"\x83", b"\x02"),                       # TrackType = audio
        _ebml(b"\x86", b"A_OPUS"),                     # CodecID
        _ebml(b"\x63\xa2", opus_head),                 # CodecPrivate
        _ebml(b"\xe1", b"".join([                      # Audio
            _ebml(b"\xb5", struct.pack(">d", 48000.0)),
            _ebml(b"\x9f", bytes([channels])),
        ])),
    ]))
    blocks = []
    for i, pkt in enumerate(packets):
        # SimpleBlock: track vint(1) + s16 timecode + flags + data
        hdr = b"\x81" + struct.pack(">h", i * 20) + b"\x80"
        blocks.append(_ebml(b"\xa3", hdr + pkt))
    cluster = _ebml(b"\x1f\x43\xb6\x75",
                    _ebml(b"\xe7", b"\x00") + b"".join(blocks))
    segment = _ebml(b"\x18\x53\x80\x67", b"".join([
        _ebml(b"\x16\x54\xae\x6b", track),             # Tracks
        cluster,
    ]))
    ebml_header = _ebml(b"\x1a\x45\xdf\xa3", b"".join([
        _ebml(b"\x42\x86", b"\x01"),                   # EBMLVersion
        _ebml(b"\x42\x82", b"webm"),                   # DocType
    ]))
    return ebml_header + segment


class TestRateAwareCache:
    def test_load_at_preserves_pitch(self, tmp_path, rng):
        """48 kHz -> 8 kHz cached resample keeps a 440 Hz tone at 440 Hz
        (the property the noise-mixing path depends on)."""
        from audio_denoising_tpu.io.wavio import write_wav
        t = np.arange(48000, dtype=np.float32) / 48000.0
        sig = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        p = tmp_path / "tone.wav"
        write_wav(str(p), sig[None], 48000)

        cache = AudioCache()
        out, sr = cache.load_at(str(p), 8000)
        assert sr == 8000 and out.shape[-1] == 8000
        spec = np.abs(np.fft.rfft(out[0, 1000:7000] *
                                  np.hanning(6000)))
        freq = np.fft.rfftfreq(6000, 1 / 8000)[np.argmax(spec)]
        assert abs(freq - 440.0) < 5.0, freq
        # second load serves the cached entry (no new decode)
        n_entries = len(cache)
        cache.load_at(str(p), 8000)
        assert len(cache) == n_entries


class TestOggVorbis:
    """Round 3: native Ogg Vorbis decode via ctypes libvorbisfile
    (VERDICT r2 task 9 — closes part of the reference's any-container
    PyAV generality without an ffmpeg binary)."""

    @pytest.fixture(scope="class")
    def ogg_file(self, tmp_path_factory):
        from tests.helpers_oggenc import (
            vorbis_encoder_available, write_ogg)
        from audio_denoising_tpu.io.codec import vorbis_available
        if not vorbis_available():
            pytest.skip("libvorbisfile not present")
        if not vorbis_encoder_available():
            pytest.skip("libvorbisenc not present (fixture encoder)")
        sr = 16000
        t = np.arange(sr * 2) / sr
        tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        p = str(tmp_path_factory.mktemp("ogg") / "tone.ogg")
        write_ogg(p, tone, sr)
        return p, tone, sr

    def test_decode_round_trip(self, ogg_file):
        from audio_denoising_tpu.io.codec import read_ogg_vorbis
        p, tone, sr = ogg_file
        data, rate = read_ogg_vorbis(p)
        assert rate == sr
        assert data.shape[0] == 1
        n = min(data.shape[1], len(tone))
        assert n > sr * 2 - 4096            # length preserved (± lapping)
        # lossy codec: assert high correlation + matched RMS, not bits
        a, b = data[0, :n], tone[:n]
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.97, corr
        assert abs(np.sqrt((a ** 2).mean()) / np.sqrt((b ** 2).mean())
                   - 1.0) < 0.1

    def test_dispatch_and_listing(self, ogg_file, tmp_path):
        from audio_denoising_tpu.io.codec import (
            codec_available, list_decodable_audio, read_audio_codec)
        p, _tone, sr = ogg_file
        assert codec_available(p)
        data, rate = read_audio_codec(p)
        assert rate == sr and data.shape[0] == 1
        import shutil
        d = tmp_path / "corpus"
        d.mkdir()
        shutil.copy(p, d / "a.ogg")
        listed = list_decodable_audio(str(d))
        assert [os.path.basename(x) for x in listed] == ["a.ogg"]

    def test_cache_loads_ogg(self, ogg_file):
        """AudioCache (the training/eval loader) decodes .ogg natively."""
        from audio_denoising_tpu.io.cache import AudioCache
        p, tone, sr = ogg_file
        samples, rate = AudioCache().load(p)
        assert rate == sr
        assert samples.ndim == 2 and samples.shape[0] == 1


class TestFLAC:
    """Round 3: pure-Python FLAC decoder (io/flac.py) — no libFLAC or
    ffmpeg on this machine; fixtures come from the spec-valid minimal
    encoder in tests/helpers_flacenc.py."""

    def _tone(self, n=5000, sr=16000, ch=1):
        t = np.arange(n) / sr
        x = np.stack([0.5 * np.sin(2 * np.pi * (300 + 120 * c) * t)
                      for c in range(ch)]).astype(np.float32)
        return x[0] if ch == 1 else x

    @pytest.mark.parametrize("kind", ["constant", "verbatim", "fixed2",
                                      "lpc1"])
    def test_subframe_kinds_bit_exact(self, tmp_path, kind):
        from tests.helpers_flacenc import write_flac
        from audio_denoising_tpu.io.flac import read_flac
        sr = 16000
        if kind == "constant":
            raw = np.full(4096, 123, np.int64)
        else:
            raw = np.round(self._tone() * 32767).astype(np.int64)
        p = str(tmp_path / f"{kind}.flac")
        write_flac(p, raw, sr, kind=kind)
        data, rate = read_flac(p)
        assert rate == sr
        got = np.round(data[0] * 32768).astype(np.int64)
        np.testing.assert_array_equal(got, raw)      # lossless: bit exact

    @pytest.mark.parametrize("mode", ["independent", "left_side",
                                      "right_side", "mid_side"])
    def test_stereo_modes_bit_exact(self, tmp_path, mode):
        from tests.helpers_flacenc import write_flac
        from audio_denoising_tpu.io.flac import read_flac
        sr = 8000
        raw = np.round(self._tone(n=3000, ch=2) * 30000).astype(np.int64)
        p = str(tmp_path / f"{mode}.flac")
        write_flac(p, raw, sr, stereo_mode=mode)
        data, rate = read_flac(p)
        assert rate == sr and data.shape[0] == 2
        got = np.round(data * 32768).astype(np.int64)
        np.testing.assert_array_equal(got, raw)

    def test_header_crc_verified(self, tmp_path):
        from tests.helpers_flacenc import write_flac
        from audio_denoising_tpu.io.flac import read_flac
        raw = np.round(self._tone(n=2048) * 20000).astype(np.int64)
        p = str(tmp_path / "bad.flac")
        write_flac(p, raw, 16000)
        blob = bytearray(open(p, "rb").read())
        # find the first frame (sync FF F8) and corrupt a header byte
        i = blob.index(b"\xff\xf8", 4)
        blob[i + 3] ^= 0xFF
        open(p, "wb").write(bytes(blob))
        with pytest.raises(ValueError):
            read_flac(p)

    def test_unknown_total_trailing_garbage_is_eof(self, tmp_path):
        """STREAMINFO total_samples == 0 means 'unknown' (RFC 9639 §8.2,
        spec-legal): trailing padding after the last frame must terminate
        decoding cleanly, not raise 'lost frame sync' (ADVICE r3)."""
        from tests.helpers_flacenc import write_flac
        from audio_denoising_tpu.io.flac import read_flac
        raw = np.round(self._tone(n=2048) * 20000).astype(np.int64)
        p = str(tmp_path / "unk.flac")
        write_flac(p, raw, 16000)
        blob = bytearray(open(p, "rb").read())
        # zero the 36-bit total_samples field: body byte 13 low nibble +
        # bytes 14..17 (body starts at file offset 8)
        blob[8 + 13] &= 0xF0
        blob[8 + 14:8 + 18] = b"\x00\x00\x00\x00"
        blob += b"\x00" * 37          # trailing padding/garbage
        open(p, "wb").write(bytes(blob))
        data, rate = read_flac(p)
        got = np.round(data[0] * 32768).astype(np.int64)
        np.testing.assert_array_equal(got, raw)   # still bit exact

    def test_reserved_bps_code_raises_flac_error(self, tmp_path):
        """A reserved bits-per-sample code (3) must raise a flac
        ValueError, not a bare KeyError from the lookup table (ADVICE
        r3)."""
        from tests.helpers_flacenc import write_flac, _CRC8
        from audio_denoising_tpu.io.flac import read_flac
        raw = np.round(self._tone(n=1024) * 20000).astype(np.int64)
        p = str(tmp_path / "rbps.flac")
        write_flac(p, raw, 16000, block=1024)
        blob = bytearray(open(p, "rb").read())
        i = blob.index(b"\xff\xf8", 4)
        # frame byte 3 = ch_code(4) | bps_code(3) | reserved(1): set the
        # reserved bps code 3 and recompute the header CRC-8 so the error
        # exercised is the bps check, not the CRC check (header = 4 fixed
        # bytes + 1 UTF-8 frame number + 2 block-size bytes, then CRC-8)
        blob[i + 3] = (blob[i + 3] & 0xF1) | (3 << 1)
        crc = 0
        for b in blob[i:i + 7]:
            crc = _CRC8[crc ^ b]
        blob[i + 7] = crc
        open(p, "wb").write(bytes(blob))
        with pytest.raises(ValueError, match="bits-per-sample"):
            read_flac(p)

    def test_dispatch_listing_and_cache(self, tmp_path):
        from tests.helpers_flacenc import write_flac
        from audio_denoising_tpu.io.codec import (
            codec_available, list_decodable_audio, read_audio_codec)
        from audio_denoising_tpu.io.cache import AudioCache
        sr = 16000
        tone = self._tone()
        p = str(tmp_path / "a.flac")
        write_flac(p, np.round(tone * 32767).astype(np.int64), sr)
        assert codec_available(p)
        data, rate = read_audio_codec(p)
        assert rate == sr and data.shape[0] == 1
        np.testing.assert_allclose(data[0], tone, atol=1 / 32768)
        assert [os.path.basename(x)
                for x in list_decodable_audio(str(tmp_path))] == ["a.flac"]
        samples, rate = AudioCache().load(p)
        assert rate == sr and samples.shape[0] == 1


class TestProbeRates:
    def test_probe_flac_and_ogg_header_only(self, tmp_path):
        from tests.helpers_flacenc import write_flac
        from audio_denoising_tpu.io.cache import AudioCache
        t = np.round(0.3 * np.sin(np.arange(3000) / 5.0) * 32767)
        p = str(tmp_path / "x.flac")
        write_flac(p, t.astype(np.int64), 22050)
        assert AudioCache.probe_rate(p) == 22050
        try:
            from tests.helpers_oggenc import (
                vorbis_encoder_available, write_ogg)
            from audio_denoising_tpu.io.codec import vorbis_available
            if vorbis_available() and vorbis_encoder_available():
                q = str(tmp_path / "x.ogg")
                write_ogg(q, (t / 32768).astype(np.float32), 16000)
                assert AudioCache.probe_rate(q) == 16000
        except RuntimeError:
            pass


class TestAVDecode:
    """Linked-FFmpeg any-container decode (native/adt_codec.cpp via
    io/avdec.py) — closes the reference's PyAV long tail (m4a/aac/mp4/
    wma/aiff, utils.py:179-198) with NO ffmpeg binary. Fixtures are
    synthesized by the same TU's test encoder (AAC in mp4), mirroring
    the FLAC/ogg test-encoder approach."""

    def _skip_unless_av(self):
        from audio_denoising_tpu.io.avdec import av_available
        if not av_available():
            pytest.skip("FFmpeg dev libraries not present")

    def test_m4a_roundtrip(self, tmp_path, rng):
        self._skip_unless_av()
        from audio_denoising_tpu.io.avdec import encode_m4a, read_audio_av
        sr, n = 44100, 44100
        t = np.arange(n) / sr
        pcm = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                        0.4 * np.sin(2 * np.pi * 880 * t)]
                       ).astype(np.float32)
        path = str(tmp_path / "tone.m4a")
        encode_m4a(path, pcm, sr)
        out, rate = read_audio_av(path)
        assert rate == sr
        assert out.shape[0] == 2
        assert out.shape[1] >= n  # AAC pads to frame multiples
        # lossy codec: align by cross-correlation, then demand high
        # correlation + level match on each channel
        for c in range(2):
            lag = int(np.argmax(np.correlate(out[c][:8000],
                                             pcm[c][:4000], "valid")))
            seg_d = out[c][lag:lag + 30000]
            seg_p = pcm[c][:30000]
            corr = np.corrcoef(seg_d, seg_p)[0, 1]
            assert corr > 0.95, f"ch{c} corr {corr}"
            assert abs(np.std(seg_d) / np.std(seg_p) - 1.0) < 0.05

    def test_cache_and_dispatch(self, tmp_path, rng):
        """AudioCache.load and codec_available route .m4a through the
        linked decoder (no ffmpeg binary on this machine — the old
        subprocess fallback would raise)."""
        self._skip_unless_av()
        from audio_denoising_tpu.io import AudioCache, codec_available
        from audio_denoising_tpu.io.avdec import encode_m4a
        from audio_denoising_tpu.io.codec import list_decodable_audio
        sr = 48000
        sig = (0.3 * rng.standard_normal(sr)).astype(np.float32)
        path = str(tmp_path / "noise.m4a")
        encode_m4a(path, sig[None], sr)
        assert codec_available(path)
        out, rate = AudioCache().load(path)
        assert rate == sr and out.shape[0] == 1
        assert path in list_decodable_audio(str(tmp_path))

    def test_decode_error_is_clean(self, tmp_path):
        self._skip_unless_av()
        from audio_denoising_tpu.io.avdec import read_audio_av
        bad = tmp_path / "bad.m4a"
        bad.write_bytes(b"\x00" * 64)
        with pytest.raises(RuntimeError, match="av decode failed"):
            read_audio_av(str(bad))
