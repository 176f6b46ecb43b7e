"""Minimal Ogg Vorbis ENCODER via ctypes (libvorbisenc + libogg) — test
fixture generator for io/codec.py's read_ogg_vorbis. Follows the standard
libvorbis encoding sequence (the encoder_example.c flow documented in the
Vorbis API): three header packets, then analysis-buffer / blockout /
bitrate-flushpacket loops, pages concatenated into the .ogg byte stream.

Opaque library structs (ogg_stream_state, vorbis_dsp_state, vorbis_block)
are stood in by oversized byte buffers — the libraries initialize them in
place; only ogg_page and ogg_packet need real field access.
"""

import ctypes
import ctypes.util
import os

import numpy as np


class _OggPacket(ctypes.Structure):
    _fields_ = [("packet", ctypes.POINTER(ctypes.c_ubyte)),
                ("bytes", ctypes.c_long), ("b_o_s", ctypes.c_long),
                ("e_o_s", ctypes.c_long), ("granulepos", ctypes.c_int64),
                ("packetno", ctypes.c_int64)]


class _OggPage(ctypes.Structure):
    _fields_ = [("header", ctypes.POINTER(ctypes.c_ubyte)),
                ("header_len", ctypes.c_long),
                ("body", ctypes.POINTER(ctypes.c_ubyte)),
                ("body_len", ctypes.c_long)]


def _load(*names):
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


def vorbis_encoder_available() -> bool:
    return (_load("libvorbisenc.so.2", "libvorbisenc.so") is not None
            and _load("libvorbis.so.0", "libvorbis.so") is not None
            and _load("libogg.so.0", "libogg.so") is not None)


def write_ogg(path: str, samples: np.ndarray, rate: int,
              quality: float = 0.4) -> str:
    """samples: (N,) or (C, N) float32 in [-1, 1] -> .ogg file."""
    enc = _load("libvorbisenc.so.2", "libvorbisenc.so")
    vor = _load("libvorbis.so.0", "libvorbis.so")
    ogg = _load("libogg.so.0", "libogg.so")
    if not (enc and vor and ogg):
        raise RuntimeError("vorbis encoder libs unavailable")

    x = np.asarray(samples, np.float32)
    if x.ndim == 1:
        x = x[None]
    channels, n_total = x.shape

    vi = (ctypes.c_char * 4096)()        # vorbis_info
    vc = (ctypes.c_char * 4096)()        # vorbis_comment
    vd = (ctypes.c_char * 8192)()        # vorbis_dsp_state
    vb = (ctypes.c_char * 8192)()        # vorbis_block
    osx = (ctypes.c_char * 4096)()       # ogg_stream_state

    vor.vorbis_info_init(vi)
    enc.vorbis_encode_init_vbr.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_float]
    rc = enc.vorbis_encode_init_vbr(vi, channels, rate,
                                    ctypes.c_float(quality))
    if rc != 0:
        raise RuntimeError(f"vorbis_encode_init_vbr failed ({rc})")
    vor.vorbis_comment_init(vc)
    vor.vorbis_analysis_init(vd, vi)
    vor.vorbis_block_init(vd, vb)
    ogg.ogg_stream_init(osx, 1)

    out = bytearray()
    page = _OggPage()

    def drain(flush: bool):
        fn = ogg.ogg_stream_flush if flush else ogg.ogg_stream_pageout
        while fn(osx, ctypes.byref(page)) != 0:
            out.extend(ctypes.string_at(page.header, page.header_len))
            out.extend(ctypes.string_at(page.body, page.body_len))

    h1, h2, h3 = _OggPacket(), _OggPacket(), _OggPacket()
    vor.vorbis_analysis_headerout(vd, vc, ctypes.byref(h1),
                                  ctypes.byref(h2), ctypes.byref(h3))
    for h in (h1, h2, h3):
        ogg.ogg_stream_packetin(osx, ctypes.byref(h))
    drain(flush=True)                    # audio starts on a fresh page

    vor.vorbis_analysis_buffer.restype = ctypes.POINTER(
        ctypes.POINTER(ctypes.c_float))
    op = _OggPacket()
    pos = 0
    chunk = 1024
    while True:
        n = min(chunk, n_total - pos)
        if n > 0:
            buf = vor.vorbis_analysis_buffer(vd, chunk)
            for ch in range(channels):
                ctypes.memmove(buf[ch],
                               np.ascontiguousarray(
                                   x[ch, pos:pos + n]).ctypes.data,
                               n * 4)
        vor.vorbis_analysis_wrote(vd, n)
        pos += n
        while vor.vorbis_analysis_blockout(vd, vb) == 1:
            vor.vorbis_analysis(vb, None)
            vor.vorbis_bitrate_addblock(vb)
            while vor.vorbis_bitrate_flushpacket(vd, ctypes.byref(op)) == 1:
                ogg.ogg_stream_packetin(osx, ctypes.byref(op))
                drain(flush=False)
        if n == 0:
            break
    drain(flush=True)

    ogg.ogg_stream_clear(osx)
    vor.vorbis_block_clear(vb)
    vor.vorbis_dsp_clear(vd)
    vor.vorbis_comment_clear(vc)
    vor.vorbis_info_clear(vi)

    with open(path, "wb") as f:
        f.write(bytes(out))
    return path
