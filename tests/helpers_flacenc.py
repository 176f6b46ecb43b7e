"""Minimal FLAC *encoder* — test-fixture generator for io/flac.py.

Writes spec-valid FLAC (RFC 9639) streams covering the decoder's paths:
CONSTANT / VERBATIM / FIXED(2) / LPC(1) subframes, Rice residuals with a
chosen parameter, and the four stereo modes. Not a compressor — fixed
choices, no rate/size optimization. CRC-8 and CRC-16 are computed for
real so external decoders accept the files too.
"""

from typing import List

import numpy as np

_CRC8 = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8.append(_c)

_CRC16 = []
for _i in range(256):
    _c = _i << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 \
            else (_c << 1) & 0xFFFF
    _CRC16.append(_c)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int):
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)           # q zeros + terminating 1

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


def _rice_write(bw: _BitWriter, resid: List[int], k: int):
    bw.write(0, 2)                     # method: 4-bit Rice
    bw.write(0, 4)                     # partition order 0
    bw.write(k, 4)
    for v in resid:
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1   # zigzag
        bw.write_unary(u >> k)
        if k:
            bw.write(u & ((1 << k) - 1), k)


def _write_subframe(bw: _BitWriter, s: np.ndarray, bps: int, kind: str,
                    k: int = 6):
    s = [int(v) for v in s]
    n = len(s)
    bw.write(0, 1)                     # padding
    if kind == "constant":
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write_signed(s[0], bps)
    elif kind == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)                 # no wasted bits
        for v in s:
            bw.write_signed(v, bps)
    elif kind == "fixed2":
        bw.write(8 + 2, 6)
        bw.write(0, 1)
        bw.write_signed(s[0], bps)
        bw.write_signed(s[1], bps)
        resid = [s[i] - (2 * s[i - 1] - s[i - 2]) for i in range(2, n)]
        _rice_write(bw, resid, k)
    elif kind == "lpc1":
        # order-1 LPC, precision 5, shift 2, coeff 3 (pred = 3*prev >> 2)
        bw.write(32, 6)                # 100000 -> order 1
        bw.write(0, 1)
        bw.write_signed(s[0], bps)
        bw.write(5 - 1, 4)             # precision - 1
        bw.write_signed(2, 5)          # shift
        bw.write_signed(3, 5)          # coefficient
        resid = [s[i] - ((3 * s[i - 1]) >> 2) for i in range(1, n)]
        _rice_write(bw, resid, k)
    else:
        raise ValueError(kind)


def write_flac(path: str, samples: np.ndarray, rate: int, bps: int = 16,
               block: int = 1024, kind: str = "fixed2",
               stereo_mode: str = "independent") -> str:
    """samples: (N,) or (C, N) float32 in [-1, 1] (or int array of raw
    sample values). ``kind``: subframe coding; ``stereo_mode``:
    independent | left_side | right_side | mid_side (2ch only)."""
    x = np.asarray(samples)
    if x.dtype.kind == "f":
        x = np.clip(np.round(x * (1 << (bps - 1))), -(1 << (bps - 1)),
                    (1 << (bps - 1)) - 1).astype(np.int64)
    if x.ndim == 1:
        x = x[None]
    channels, total = x.shape

    out = bytearray(b"fLaC")
    info = _BitWriter()
    info.write(block, 16)              # min block
    info.write(block, 16)              # max block
    info.write(0, 24)                  # min frame size (unknown)
    info.write(0, 24)
    info.write(rate, 20)
    info.write(channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(total, 36)
    body = info.bytes() + b"\x00" * 16  # md5 unknown
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    ch_code = {"independent": channels - 1, "left_side": 8,
               "right_side": 9, "mid_side": 10}[stereo_mode]
    if stereo_mode != "independent":
        assert channels == 2

    frame_no = 0
    for start in range(0, total, block):
        n = min(block, total - start)
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)                 # reserved
        bw.write(0, 1)                 # fixed block strategy
        bw.write(7, 4)                 # block size: 16 bits at end
        bw.write(0, 4)                 # rate: from STREAMINFO
        bw.write(ch_code, 4)
        bw.write(0, 3)                 # bps: from STREAMINFO
        bw.write(0, 1)
        assert frame_no < 0x80
        bw.write(frame_no, 8)          # UTF-8 (1 byte)
        bw.write(n - 1, 16)
        hdr = bw.buf[:]
        assert bw.n == 0
        crc8 = 0
        for b in hdr:
            crc8 = _CRC8[crc8 ^ b]
        bw.write(crc8, 8)

        seg = x[:, start:start + n]
        if stereo_mode == "independent":
            for ch in range(channels):
                _write_subframe(bw, seg[ch], bps, kind)
        else:
            left, right = seg[0], seg[1]
            if stereo_mode == "left_side":
                _write_subframe(bw, left, bps, kind)
                _write_subframe(bw, left - right, bps + 1, kind)
            elif stereo_mode == "right_side":
                _write_subframe(bw, left - right, bps + 1, kind)
                _write_subframe(bw, right, bps, kind)
            else:                      # mid/side
                _write_subframe(bw, (left + right) >> 1, bps, kind)
                _write_subframe(bw, left - right, bps + 1, kind)
        bw.align()
        frame = bw.bytes()
        crc16 = 0
        for b in frame:
            crc16 = ((crc16 << 8) & 0xFFFF) ^ _CRC16[(crc16 >> 8) ^ b]
        out += frame + crc16.to_bytes(2, "big")
        frame_no += 1

    with open(path, "wb") as f:
        f.write(bytes(out))
    return path
