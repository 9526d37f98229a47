"""Minimal FLAC *encoder* used only as a test fixture.

The repo ships a from-scratch native FLAC decoder (native/speechio.cc) for
the VCTK corpus; no FLAC encoder exists in this environment, so the tests
synthesize well-formed streams themselves. Supports mono/stereo 16-bit with
constant, verbatim, fixed-predictor, and LPC subframes, Rice residuals
(both 4-bit method and the raw-bits escape), and the left/side stereo
assignment — enough to cover every decoder path.
"""
import numpy as np


class BitWriter:
    def __init__(self):
        self.bits = []

    def w(self, value: int, n: int):
        v = int(value) & ((1 << n) - 1) if n < 64 else int(value)
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _rice_residual(bw: BitWriter, res, param: int, escape_bits=None):
    """One partition (order 0) holding all residuals."""
    bw.w(0, 2)                       # method 0: 4-bit Rice
    bw.w(0, 4)                       # partition order 0
    if escape_bits is not None:
        bw.w(0xF, 4)                 # escape
        bw.w(escape_bits, 5)
        for r in res:
            bw.w(int(r), escape_bits)
        return
    bw.w(param, 4)
    for r in res:
        r = int(r)
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1   # zigzag
        q = u >> param
        for _ in range(q):
            bw.w(0, 1)
        bw.w(1, 1)
        bw.w(u & ((1 << param) - 1), param)


def _subframe(bw: BitWriter, x, mode: str, bps: int = 16):
    x = np.asarray(x, np.int64)
    bw.w(0, 1)                       # pad bit
    if mode == "constant":
        bw.w(0, 6)
        bw.w(0, 1)                   # no wasted bits
        bw.w(int(x[0]), bps)
    elif mode == "verbatim":
        bw.w(1, 6)
        bw.w(0, 1)
        for s in x:
            bw.w(int(s), bps)
    elif mode == "fixed0_escape":
        bw.w(8, 6)                   # fixed order 0: residual == signal
        bw.w(0, 1)
        _rice_residual(bw, [int(s) for s in x], param=0, escape_bits=bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        bw.w(8 + order, 6)
        bw.w(0, 1)
        for s in x[:order]:
            bw.w(int(s), bps)
        coef = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}[order]
        res = [int(x[i]) - sum(c * int(x[i - 1 - j])
                               for j, c in enumerate(coef))
               for i in range(order, len(x))]
        _rice_residual(bw, res, param=6)
    elif mode == "lpc1":
        order, precision, shift, coef = 1, 15, 5, 31   # x[i] ≈ coef/32 x[i-1]
        bw.w(31 + order, 6)
        bw.w(0, 1)
        for s in x[:order]:
            bw.w(int(s), bps)
        bw.w(precision - 1, 4)
        bw.w(shift, 5)
        bw.w(coef, precision)
        res = [int(x[i]) - ((coef * int(x[i - 1])) >> shift)
               for i in range(order, len(x))]
        _rice_residual(bw, res, param=6)
    elif mode == "wasted_constant":
        bw.w(0, 6)
        bw.w(1, 1)                   # wasted-bits flag; unary "1" -> k=1
        bw.w(1, 1)
        bw.w(int(x[0]) >> 1, bps - 1)
    else:
        raise ValueError(mode)


def encode(channels, sr=48000, bps=16, modes=None, ch_code=None,
           frame_size=None) -> bytes:
    """channels: list of 1-D int arrays (all same length). modes: per-channel
    subframe mode (default 'verbatim'). ch_code: override channel assignment
    (8 = left/side: channels must then be [left, side])."""
    channels = [np.asarray(c, np.int64) for c in channels]
    n_ch = len(channels)
    total = len(channels[0])
    modes = modes or ["verbatim"] * n_ch
    frame_size = frame_size or total

    bw = BitWriter()
    bw.w(int.from_bytes(b"fLaC", "big"), 32)
    # STREAMINFO (last metadata block), length 34
    bw.w(0x80, 8)
    bw.w(34, 24)
    bw.w(frame_size, 16)             # min block size
    bw.w(frame_size, 16)             # max block size
    bw.w(0, 24)
    bw.w(0, 24)
    bw.w(sr, 20)
    bw.w(n_ch - 1, 3)
    bw.w(bps - 1, 5)
    bw.w(total, 36)
    for _ in range(16):              # md5 (unchecked)
        bw.w(0, 8)

    for f0 in range(0, total, frame_size):
        bs = min(frame_size, total - f0)
        bw.w(0x3FFE, 14)             # sync
        bw.w(0, 1)
        bw.w(0, 1)                   # fixed blocksize strategy
        bw.w(7, 4)                   # block size: 16 bits - 1 follows
        bw.w(0, 4)                   # sample rate: from STREAMINFO
        bw.w(ch_code if ch_code is not None else n_ch - 1, 4)
        bw.w(4, 3)                   # sample size: 16-bit
        bw.w(0, 1)
        bw.w(f0 // frame_size, 8)    # UTF-8 frame number (small -> 1 byte)
        bw.w(bs - 1, 16)
        bw.w(0, 8)                   # header CRC-8 (not verified)
        for c, mode in zip(channels, modes):
            extra = 0
            if ch_code == 8:         # side channel gets +1 bit
                extra = 1 if c is channels[1] else 0
            _subframe(bw, c[f0:f0 + bs], mode, bps=bps + extra)
        bw.align()
        bw.w(0, 16)                  # frame CRC-16 (not verified)
    return bw.bytes()
