"""Baseline JPEG (ITU-T T.81 sequential DCT, 8-bit) codec, pure numpy.

Closes the last image-format gap from the round-2 verdict: JPEG needs
no external library either — the entropy layer is canonical Huffman
over run-length-coded zigzag DCT coefficients, all implementable with
numpy (IDCT as an 8x8 orthonormal matrix sandwich). Supported: SOF0
baseline, interleaved and single-component scans, arbitrary chroma
subsampling declared in SOF (4:4:4 / 4:2:2 / 4:2:0 decoded; nearest
upsampling), restart markers, 8/16-bit DQT, JFIF YCbCr (BT.601
full-range). Progressive (SOF2), arithmetic coding, and 12-bit inputs
raise NotImplementedError.

The fixture encoder emits 4:4:4 or 4:2:0 with IJG-quality-scaled
Annex-K quantization tables and deliberately *flat* (fixed-length)
Huffman tables — every DC category at 4 bits, every AC symbol at 8
bits. Flat tables are legal canonical tables (Kraft sums < 1, the
all-ones code stays unused as T.81 K.2 requires), remove any risk of
mis-remembered Annex-K Huffman counts, and force the decoder through
the same canonical-table machinery real files use.

Lossy contract: decode(encode(img)) is NOT exact; tests pin (a) exact
closed-form values on uniform blocks (DC-only path is deterministic:
round(8v/q)*q/8), (b) bounded error on smooth gradients, (c) exact
marker/structure handling via hand-packed streams.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- constants -------------------------------------------------------------

_ZIGZAG = []  # (row, col) pairs in zigzag scan order
for _s in range(15):
    _diag = [(_r, _s - _r) for _r in range(8) if 0 <= _s - _r < 8]
    _ZIGZAG.extend(reversed(_diag) if _s % 2 == 0 else _diag)
_ZZ_ROWS = np.array([p[0] for p in _ZIGZAG])
_ZZ_COLS = np.array([p[1] for p in _ZIGZAG])

# Annex K (K.1/K.2) quantization tables, natural (row-major) order
_QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)
_QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: spatial = A.T @ coef @ A."""
    n = np.arange(8)
    a = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    a[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return a


_A = _dct_matrix()

# flat fixture Huffman tables: counts-per-length 1..16 plus symbol list
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)]
_AC_BITS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: {(length, code): symbol} (T.81 C.2)."""
    lut = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lut[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    return {sym: (ln, code) for (ln, code), sym in
            _build_decode_table(bits, vals).items()}


# ---- bit I/O ---------------------------------------------------------------

class _BitReader:
    """MSB-first reader over de-stuffed entropy bytes."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.nbits = 0
        self.acc = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.d):
                raise ValueError("JPEG entropy data truncated")
            self.acc = (self.acc << 8) | self.d[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def decode_huff(self, lut: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---- decoder ---------------------------------------------------------------

def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> H×W×3 uint8 (grayscale replicated)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> lut
    frame = None
    restart = 0
    out = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        while b[pos + 1] == 0xFF:  # fill bytes before a marker are legal
            pos += 1
        m = b[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", b, pos)
        seg = b[pos + 2:pos + ln]
        pos += ln
        if m == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 15
                sp += 1
                if pq:
                    vals = np.frombuffer(seg, ">u2", 64, sp).astype(np.int32)
                    sp += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, 64, sp).astype(np.int32)
                    sp += 64
                t = np.zeros((8, 8), np.int32)
                t[_ZZ_ROWS, _ZZ_COLS] = vals
                qt[tq] = t
        elif m == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 15
                bits = list(seg[sp + 1:sp + 17])
                n = sum(bits)
                vals = list(seg[sp + 17:sp + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                sp += 17 + n
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 baseline(-ish) sequential
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("progressive/arithmetic JPEG not supported")
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cid, tt = seg[1 + 2 * si:3 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan.append((comp, huff[(0, tt >> 4)], huff[(1, tt & 15)]))
            # entropy-coded data runs to the next non-RST/stuffed marker
            end = pos
            while end + 1 < len(b):
                if b[end] == 0xFF and b[end + 1] not in (0x00,) and not (0xD0 <= b[end + 1] <= 0xD7):
                    break
                end += 1
            planes = _decode_scan(b[pos:end], frame, scan, qt, restart)
            pos = end
            out = planes
        # APPn/COM/others: skipped via generic length
    if out is None:
        raise ValueError("JPEG contains no scan")
    return _to_rgb(out, frame)


def _decode_scan(data: bytes, frame, scan, qt, restart) -> dict:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    interleaved = len(scan) > 1
    # Allocate sample planes only for THIS scan's components, and only once:
    # a multi-scan baseline file (one SOS per component) must keep planes
    # decoded by earlier scans intact.
    for c, _, _ in scan:
        if "plane" in c:
            continue
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        if interleaved:
            bw = -(-w // (8 * hmax)) * c["h"]
            bh = -(-h // (8 * vmax)) * c["v"]
        else:
            bw, bh = -(-cw // 8), -(-ch // 8)
        c["cw"], c["ch"] = cw, ch
        c["plane"] = np.zeros((bh * 8, bw * 8), np.float64)
    if interleaved:
        n_mcus = (-(-w // (8 * hmax))) * (-(-h // (8 * vmax)))
        mcus_x = -(-w // (8 * hmax))
    else:
        comp = scan[0][0]
        mcus_x = -(-comp["cw"] // 8)
        n_mcus = mcus_x * (-(-comp["ch"] // 8))

    # split on restart markers; de-stuff each segment
    segments = []
    seg_start = 0
    i = 0
    while i + 1 < len(data):
        if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
            segments.append(data[seg_start:i])
            seg_start = i + 2
            i += 2
        else:
            i += 1
    segments.append(data[seg_start:])

    mcu = 0
    for seg in segments:
        rd = _BitReader(seg.replace(b"\xff\x00", b"\xff"))
        pred = {id(c): 0 for c, _, _ in scan}
        limit = mcu + restart if restart else n_mcus
        while mcu < min(limit, n_mcus):
            my, mx = divmod(mcu, mcus_x)
            for comp, dct, act in scan:
                reps = comp["h"] * comp["v"] if interleaved else 1
                for bi in range(reps):
                    if interleaved:
                        by = my * comp["v"] + bi // comp["h"]
                        bx = mx * comp["h"] + bi % comp["h"]
                    else:
                        by, bx = my, mx
                    block = _decode_block(rd, dct, act, qt[comp["tq"]], pred, comp)
                    comp["plane"][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = block
            mcu += 1
    return {c["id"]: c for c in frame["comps"]}


def _decode_block(rd, dct, act, q, pred, comp) -> np.ndarray:
    zz = np.zeros(64, np.int32)
    t = rd.decode_huff(dct)
    diff = _extend(rd.read(t), t) if t else 0
    pred[id(comp)] += diff
    zz[0] = pred[id(comp)]
    k = 1
    while k < 64:
        rs = rd.decode_huff(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        zz[k] = _extend(rd.read(s), s)
        k += 1
    coef = np.zeros((8, 8), np.float64)
    coef[_ZZ_ROWS, _ZZ_COLS] = zz * q[_ZZ_ROWS, _ZZ_COLS]
    return _A.T @ coef @ _A + 128.0


def _to_rgb(planes: dict, frame) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    chans = []
    for c in comps:
        if "plane" not in c:
            raise ValueError("JPEG scan data missing for a frame component")
        p = c["plane"][: c["ch"], : c["cw"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        chans.append(p[:h, :w])
    if len(chans) == 1:
        g = np.clip(np.rint(chans[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], -1)
    y, cb, cr = chans[0], chans[1] - 128.0, chans[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, bl], -1)), 0, 255).astype(np.uint8)


# ---- encoder (fixture; 4:4:4 or 4:2:0) -------------------------------------

def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def sc(t):
        return np.clip((t * scale + 50) // 100, 1, 255).astype(np.int32)
    return sc(_QUANT_LUMA), sc(_QUANT_CHROMA)


def _encode_block(bw, block, q, pred, dc_tab, ac_tab) -> int:
    coef = _A @ (block - 128.0) @ _A.T
    zz = np.rint(coef[_ZZ_ROWS, _ZZ_COLS] / q[_ZZ_ROWS, _ZZ_COLS]).astype(np.int32)
    diff = int(zz[0]) - pred
    t = _category(diff)
    ln, code = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = np.max(np.nonzero(zz)[0]) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        ln, code = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_tab[0x00]
        bw.write(code, ln)
    return int(zz[0])


def _pad_to(p: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    return np.pad(p, ((0, bh - p.shape[0]), (0, bw_ - p.shape[1])), mode="edge")


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = False, multi_scan: bool = False) -> bytes:
    """H×W×3 uint8 (or H×W gray) -> baseline JFIF bytes. subsample=True
    emits 4:2:0 (2x2 box-averaged chroma), else 4:4:4. multi_scan=True
    emits one single-component SOS per channel (legal sequential baseline,
    T.81 §B.2.3) instead of one interleaved scan — a decoder fixture."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql, qc = _quality_tables(quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qids = [0]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
        if subsample:
            ph = -(-h // 2) * 2
            pw = -(-w // 2) * 2
            cb = _pad_to(cb, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            cr = _pad_to(cr, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        padded.append(_pad_to(p, mcus_y * sv * 8, mcus_x * sh * 8))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, t in ((0, ql), (1, qc))[: 1 if gray else 2]:
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(t[r, c]) for r, c in _ZIGZAG)
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qids[ci]])
    for tc, th, bits, vals in ((0, 0, _DC_BITS, _DC_VALS),
                               (1, 0, _AC_BITS, _AC_SYMBOLS)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + sum(bits), (tc << 4) | th)
        out += bytes(bits) + bytes(vals)
    dc_tab = _build_encode_table(_DC_BITS, _DC_VALS)
    ac_tab = _build_encode_table(_AC_BITS, _AC_SYMBOLS)
    if multi_scan:
        # one non-interleaved scan per component, blocks in raster order
        # over that component's own block grid (DC pred resets per scan)
        for ci in range(nc):
            sh, sv = samp[ci]
            cw = -(-w * sh // hmax)
            ch_ = -(-h * sv // vmax)
            bxs, bys = -(-cw // 8), -(-ch_ // 8)
            out += b"\xff\xda" + struct.pack(">HB", 8, 1)
            out += bytes([ci + 1, 0x00]) + b"\x00\x3f\x00"
            bw = _BitWriter()
            pred = 0
            q = ql if qids[ci] == 0 else qc
            for by in range(bys):
                for bx in range(bxs):
                    block = padded[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    pred = _encode_block(bw, block, q, pred, dc_tab, ac_tab)
            bw.flush()
            out += bw.out
        out += b"\xff\xd9"
        return bytes(out)

    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00])
    out += b"\x00\x3f\x00"

    bw = _BitWriter()
    preds = [0] * nc
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                sh, sv = samp[ci]
                for bi in range(sh * sv):
                    by = my * sv + bi // sh
                    bx = mx * sh + bi % sh
                    block = padded[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    preds[ci] = _encode_block(bw, block, ql if qids[ci] == 0 else qc,
                                              preds[ci], dc_tab, ac_tab)
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)
