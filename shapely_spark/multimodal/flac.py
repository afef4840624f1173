"""FLAC decoder (+ fixture encoder), pure stdlib + numpy.

FLAC is the one widespread *lossless* audio codec, and its entropy layer
(Rice/Golomb residuals over fixed or LPC predictors) is pure integer
math — no external library needed, same rationale as the PNG/GIF/JPEG
and G.711/ADPCM codecs in this package. Supported: STREAMINFO +
metadata-block walk, frame sync with CRC-8 header / CRC-16 frame
verification, UTF-8-coded frame numbers, all block-size/sample-rate/
sample-size header codes, subframe types CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC (any order), wasted bits, 4- and 5-bit Rice
partitions with escape codes, and stereo decorrelation (left/side,
right/side, mid/side). Output: float32 mono in [-1, 1], matching
decode_audio's contract (stereo is mean-downmixed).

The fixture encoder writes mono/stereo 16-bit streams using CONSTANT,
VERBATIM, or FIXED(order 2)+Rice subframes per block — enough to
exercise every decoder path the synthetic corpora hit; real-world
streams additionally exercise LPC, which is pinned by a hand-packed
golden (test_multimodal.py).

Format reference: the public FLAC format specification (RFC 9639).
"""

from __future__ import annotations

import struct

import numpy as np

_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader with byte-position access (frame CRCs are
    computed over whole bytes, so subframe parsing must stay in sync)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.bytepos = pos
        self.bitpos = 0

    def read(self, n: int) -> int:
        v = 0
        while n > 0:
            avail = 8 - self.bitpos
            take = min(n, avail)
            cur = self.d[self.bytepos]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


def _read_utf8_number(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (bits.read(8) & 0x3F)
    return v


def _rice_decode(bits: _Bits, n: int, order: int) -> np.ndarray:
    """Residual section: coding method + partitioned Rice."""
    method = bits.read(2)
    if method > 1:
        raise ValueError("FLAC reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = bits.read(4)
    out = np.empty(n - order, dtype=np.int64)
    idx = 0
    nparts = 1 << po
    for p in range(nparts):
        cnt = (n >> po) - (order if p == 0 else 0)
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            for _ in range(cnt):
                out[idx] = bits.read_signed(raw) if raw else 0
                idx += 1
        else:
            for _ in range(cnt):
                q = bits.unary()
                u = (q << param) | (bits.read(param) if param else 0)
                out[idx] = (u >> 1) ^ -(u & 1)  # zigzag
                idx += 1
    return out


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _predict(warmup: list[int], resid: np.ndarray, coefs: list[int],
             shift: int = 0) -> np.ndarray:
    order = len(coefs)
    out = np.empty(order + len(resid), dtype=np.int64)
    out[:order] = warmup
    c = np.array(coefs, dtype=np.int64)[::-1]
    for i in range(len(resid)):
        pred = int(np.dot(out[i:i + order], c)) >> shift
        out[order + i] = resid[i] + pred
    return out


def _decode_subframe(bits: _Bits, n: int, bps: int) -> np.ndarray:
    if bits.read(1) != 0:
        raise ValueError("FLAC subframe padding bit set")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.unary()
        bps -= wasted
    if ftype == 0:  # CONSTANT
        out = np.full(n, bits.read_signed(bps), dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.array([bits.read_signed(bps) for _ in range(n)], dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED
        order = ftype - 8
        warm = [bits.read_signed(bps) for _ in range(order)]
        out = _predict(warm, _rice_decode(bits, n, order), _FIXED_COEFS[order])
    elif ftype >= 32:  # LPC
        order = ftype - 31
        warm = [bits.read_signed(bps) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC invalid LPC precision")
        shift = bits.read_signed(5)
        coefs = [bits.read_signed(prec) for _ in range(order)]
        out = _predict(warm, _rice_decode(bits, n, order), coefs, max(shift, 0))
    else:
        raise ValueError(f"FLAC reserved subframe type {ftype}")
    return out << wasted if wasted else out


def decode_flac(b: bytes) -> np.ndarray:
    """FLAC bytes -> float32 mono in [-1, 1] (stereo mean-downmixed)."""
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    total = None
    while pos < len(b):  # metadata blocks
        hdr = b[pos]
        (ln,) = struct.unpack(">I", b"\x00" + b[pos + 1:pos + 4])
        if hdr & 0x7F == 0:  # STREAMINFO
            si = b[pos + 4:pos + 4 + ln]
            total = ((si[13] & 0x0F) << 32) | struct.unpack(">I", si[14:18])[0]
            if total == 0:
                # RFC 9639 §8.2: a total-samples field of 0 means UNKNOWN
                # (piped/live encodes) — decode every frame, no truncation.
                total = None
        pos += 4 + ln
        if hdr & 0x80:
            break
    chunks = []
    while pos < len(b) - 1:
        frame, pos = _decode_frame(b, pos)
        chunks.append(frame)
        if total is not None and sum(len(c) for c in chunks) >= total:
            break
    if not chunks:
        raise ValueError("FLAC stream has no frames")
    x = np.concatenate(chunks)
    if total is not None:
        x = x[:total]
    return x


def _decode_frame(b: bytes, pos: int) -> tuple[np.ndarray, int]:
    bits = _Bits(b, pos)
    sync = bits.read(14)
    if sync != 0x3FFE:
        raise ValueError(f"FLAC frame sync lost at byte {pos}")
    bits.read(1)  # reserved
    bits.read(1)  # blocking strategy
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    chan = bits.read(4)
    ss_code = bits.read(3)
    bits.read(1)  # reserved
    _read_utf8_number(bits)
    if bs_code == 6:
        n = bits.read(8) + 1
    elif bs_code == 7:
        n = bits.read(16) + 1
    else:
        n = _BLOCK_SIZES[bs_code]
    if sr_code == 12:
        bits.read(8)
    elif sr_code in (13, 14):
        bits.read(16)
    bps = _SAMPLE_SIZES[ss_code]
    crc_at = bits.bytepos
    if _crc8(b[pos:crc_at]) != bits.read(8):
        raise ValueError("FLAC frame header CRC-8 mismatch")
    if chan < 8:
        nch = chan + 1
        subs = [_decode_subframe(bits, n, bps) for _ in range(nch)]
    elif chan == 8:  # left/side
        left = _decode_subframe(bits, n, bps)
        side = _decode_subframe(bits, n, bps + 1)
        subs = [left, left - side]
    elif chan == 9:  # right/side
        side = _decode_subframe(bits, n, bps + 1)
        right = _decode_subframe(bits, n, bps)
        subs = [right + side, right]
    elif chan == 10:  # mid/side
        mid = _decode_subframe(bits, n, bps)
        side = _decode_subframe(bits, n, bps + 1)
        lef = (mid << 1 | (side & 1)) + side
        subs = [lef >> 1, (lef - (side << 1)) >> 1]
    else:
        raise ValueError("FLAC reserved channel assignment")
    bits.align()
    crc_at = bits.bytepos
    if _crc16(b[pos:crc_at]) != bits.read(16):
        raise ValueError("FLAC frame CRC-16 mismatch")
    scale = float(1 << (bps - 1))
    mono = np.mean(np.stack(subs, axis=0), axis=0) if len(subs) > 1 \
        else subs[0].astype(np.float64)
    return (mono / scale).astype(np.float32), bits.bytepos


# ---- fixture encoder --------------------------------------------------------

class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)


def _utf8_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (5 * nbytes + 1)):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (v >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((v >> shift) & 0x3F))
    return bytes(out)


def _rice_encode(w: _BitW, resid: np.ndarray, param: int):
    w.write(0, 2)   # 4-bit Rice
    w.write(0, 4)   # partition order 0
    w.write(param, 4)
    for e in resid.tolist():
        u = (abs(e) << 1) - (1 if e < 0 else 0)  # zigzag
        q, r = u >> param, u & ((1 << param) - 1)
        if q:
            w.write(0, q)
        w.write(1, 1)
        if param:
            w.write(r, param)


def encode_flac(x: np.ndarray, sample_rate: int = 16000,
                block_size: int = 4096, mode: str = "fixed2") -> bytes:
    """Mono int16 -> FLAC bytes. mode: 'fixed2' (order-2 fixed predictor
    + Rice), 'verbatim', or 'auto' (CONSTANT for uniform blocks, else
    fixed2). Lossless: decode_flac(encode_flac(x)) == x / 32768."""
    x = np.asarray(x, dtype=np.int64)
    out = bytearray(b"fLaC")
    si = bytearray(34)
    struct.pack_into(">HH", si, 0, block_size, block_size)
    # sample rate (20) | channels-1 (3) | bps-1 (5) | total (36)
    packed = (sample_rate << 44) | (0 << 41) | (15 << 36) | len(x)
    si[10:18] = struct.pack(">Q", packed)
    out += bytes([0x80]) + struct.pack(">I", 34)[1:] + si

    for fi, start in enumerate(range(0, max(len(x), 1), block_size)):
        seg = x[start:start + block_size]
        if len(seg) == 0:
            break
        n = len(seg)
        hdr = _BitW()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)   # fixed blocking
        hdr.write(7, 4)   # block size: 16-bit at end of header
        hdr.write(0, 4)   # sample rate: from STREAMINFO
        hdr.write(0, 4)   # 1 channel
        hdr.write(4, 3)   # 16 bps
        hdr.write(0, 1)
        hdr.align()
        head = bytes(hdr.out) + _utf8_number(fi) + struct.pack(">H", n - 1)
        head += bytes([_crc8(head)])

        body = _BitW()
        uniform = bool((seg == seg[0]).all())
        use_mode = ("constant" if uniform else "fixed2") if mode == "auto" else mode
        body.write(0, 1)
        if use_mode == "constant":
            body.write(0, 6)
            body.write(0, 1)
            body.write(int(seg[0]) & 0xFFFF, 16)
        elif use_mode == "verbatim":
            body.write(1, 6)
            body.write(0, 1)
            for v in seg.tolist():
                body.write(v & 0xFFFF, 16)
        else:  # fixed order 2 (order min(2, n-?) — fall back for tiny blocks)
            order = min(2, n - 1) if n > 1 else 0
            body.write(8 + order, 6)
            body.write(0, 1)
            for v in seg[:order].tolist():
                body.write(v & 0xFFFF, 16)
            if order == 2:
                resid = seg[2:] - 2 * seg[1:-1] + seg[:-2]
            elif order == 1:
                resid = seg[1:] - seg[:-1]
            else:
                resid = seg.copy()
            mean = float(np.abs(resid).mean()) if len(resid) else 0.0
            param = min(14, max(0, int(np.ceil(np.log2(mean + 1))) + 1))
            _rice_encode(body, resid, param)
        body.align()
        frame = head + bytes(body.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)
