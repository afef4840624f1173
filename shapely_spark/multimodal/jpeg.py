"""JPEG (ITU-T T.81, 8-bit Huffman) codec, pure numpy.

Closes the last image-format gap from the round-2 verdict: JPEG needs
no external library either — the entropy layer is canonical Huffman
over run-length-coded zigzag DCT coefficients, all implementable with
numpy (IDCT as an 8x8 orthonormal matrix sandwich). Supported: SOF0/1
sequential baseline (interleaved and single-component scans, arbitrary
chroma subsampling declared in SOF — 4:4:4 / 4:2:2 / 4:2:0 decoded,
nearest upsampling), **SOF2 progressive** (r4: spectral selection +
successive approximation per Annex G — DC first/refine, AC first/refine
with EOB run batching, coefficients accumulated across scans and
IDCT'd once), restart markers in both modes, 8/16-bit DQT, JFIF YCbCr
(BT.601 full-range). Arithmetic coding, lossless/hierarchical modes,
and 12-bit inputs raise NotImplementedError.

The progressive fixture encoder (`encode_jpeg_progressive`) emits the
SAME quantized coefficients as `encode_jpeg` restructured into a
6+2·nc-scan script, so tests can pin an exact contract: the progressive
decode must be pixel-identical to the baseline decode of the same
image (progressive is a reordering, not a different approximation).

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
        elif m == 0xC2:  # SOF2 progressive DCT, Huffman
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": True}
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "lossless/arithmetic/hierarchical JPEG not supported")
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
                # progressive AC scans carry no DC table (and vice versa);
                # missing ids resolve lazily inside the scan decoders
                scan.append((comp, huff.get((0, tt >> 4)), huff.get((1, tt & 15))))
            ss, se, a = seg[1 + 2 * ns:4 + 2 * ns]
            # entropy-coded data runs to the next non-RST/stuffed marker
            end = pos
            while end + 1 < len(b):
                if b[end] == 0xFF and b[end + 1] not in (0x00,) and not (0xD0 <= b[end + 1] <= 0xD7):
                    break
                end += 1
            if frame.get("progressive"):
                _decode_scan_progressive(
                    b[pos:end], frame, scan, restart, ss, se, a >> 4, a & 15)
                out = frame
            else:
                planes = _decode_scan(b[pos:end], frame, scan, qt, restart)
                out = planes
            pos = end
        # APPn/COM/others: skipped via generic length
    if out is None:
        raise ValueError("JPEG contains no scan")
    if frame.get("progressive"):
        _idct_coefs(frame, qt)
        out = {c["id"]: c for c in frame["comps"]}
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


def _alloc_coefs(frame) -> None:
    """Progressive frames accumulate zigzag COEFFICIENTS per component
    across scans (T.81 Annex G); samples appear only at the final IDCT.
    Block grids are MCU-padded (interleaved DC scans touch every padded
    block; non-interleaved AC scans cover the component's own grid)."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    for c in frame["comps"]:
        if "coef" in c:
            continue
        c["cw"] = -(-w * c["h"] // hmax)
        c["ch"] = -(-h * c["v"] // vmax)
        bw_ = -(-w // (8 * hmax)) * c["h"]
        bh = -(-h // (8 * vmax)) * c["v"]
        c["coef"] = np.zeros((bh, bw_, 64), np.int32)


def _split_restarts(data: bytes) -> list[bytes]:
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
    return segments


def _decode_scan_progressive(data, frame, scan, restart, ss, se, ah, al):
    """One progressive scan (T.81 G.2): DC first/refine (interleaved OK),
    AC first/refine (single component, EOBRUN coding)."""
    _alloc_coefs(frame)
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])

    if ss == 0:  # DC scan (se must be 0)
        interleaved = len(scan) > 1
        if interleaved:
            mcus_x = -(-w // (8 * hmax))
            n_mcus = mcus_x * (-(-h // (8 * vmax)))
        else:
            comp = scan[0][0]
            mcus_x = -(-comp["cw"] // 8)
            n_mcus = mcus_x * (-(-comp["ch"] // 8))
        mcu = 0
        for seg in _split_restarts(data):
            rd = _BitReader(seg.replace(b"\xff\x00", b"\xff"))
            pred = {id(c): 0 for c, _, _ in scan}
            limit = mcu + restart if restart else n_mcus
            while mcu < min(limit, n_mcus):
                my, mx = divmod(mcu, mcus_x)
                for comp, dct, _ in scan:
                    reps = comp["h"] * comp["v"] if interleaved else 1
                    for bi in range(reps):
                        if interleaved:
                            by = my * comp["v"] + bi // comp["h"]
                            bx = mx * comp["h"] + bi % comp["h"]
                        else:
                            by, bx = my, mx
                        cz = comp["coef"][by, bx]
                        if ah == 0:  # first pass: diff-coded, scaled by Al
                            t = rd.decode_huff(dct)
                            diff = _extend(rd.read(t), t) if t else 0
                            pred[id(comp)] += diff
                            cz[0] = pred[id(comp)] << al
                        else:        # refinement: one bit per block
                            if rd.read(1):
                                cz[0] |= 1 << al
                mcu += 1
        return

    # AC scan: exactly one component (T.81 G.1.1.1.1)
    comp, _, act = scan[0]
    bxs = -(-comp["cw"] // 8)
    bys = -(-comp["ch"] // 8)
    n_blocks = bxs * bys
    blk = 0
    for seg in _split_restarts(data):
        rd = _BitReader(seg.replace(b"\xff\x00", b"\xff"))
        eobrun = 0
        limit = blk + restart if restart else n_blocks
        while blk < min(limit, n_blocks):
            by, bx = divmod(blk, bxs)
            cz = comp["coef"][by, bx]
            if ah == 0:
                _ac_first(rd, act, cz, ss, se, al, eobrun_box := [eobrun])
                eobrun = eobrun_box[0]
            else:
                _ac_refine(rd, act, cz, ss, se, al, eobrun_box := [eobrun])
                eobrun = eobrun_box[0]
            blk += 1


def _ac_first(rd, act, cz, ss, se, al, eobrun_box):
    """T.81 G.2.2: first AC pass of a band — coefficients at scale 1<<al,
    EOB run-lengths batched across blocks."""
    if eobrun_box[0] > 0:
        eobrun_box[0] -= 1
        return
    k = ss
    while k <= se:
        rs = rd.decode_huff(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun_box[0] = (1 << r) - 1
            if r:
                eobrun_box[0] += rd.read(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG progressive AC run past band end")
        cz[k] = _extend(rd.read(s), s) << al
        k += 1


def _ac_refine(rd, act, cz, ss, se, al, eobrun_box):
    """T.81 G.1.2.3 successive-approximation AC refinement: new ±1<<al
    coefficients positioned by runs over ZERO-history slots; every
    nonzero-history coefficient passed on the way (and after EOB) absorbs
    one correction bit."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun_box[0] == 0:
        while k <= se:
            rs = rd.decode_huff(act)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r < 15:
                    # EOB run INCLUDES the current block (libjpeg
                    # convention): its tail corrections are consumed below
                    eobrun_box[0] = (1 << r)
                    if r:
                        eobrun_box[0] += rd.read(r)
                    break
                # r == 15: pass 16 zero-history slots
            else:
                if s != 1:
                    raise ValueError("JPEG refinement size must be 1")
                val = p1 if rd.read(1) else m1
            while k <= se:
                if cz[k] != 0:
                    if rd.read(1) and (cz[k] & p1) == 0:
                        cz[k] += p1 if cz[k] > 0 else m1
                else:
                    if r == 0:
                        if val:
                            cz[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun_box[0] > 0:
        while k <= se:
            if cz[k] != 0 and rd.read(1) and (cz[k] & p1) == 0:
                cz[k] += p1 if cz[k] > 0 else m1
            k += 1
        eobrun_box[0] -= 1


def _idct_coefs(frame, qt) -> None:
    """Final pass of a progressive decode: dequantize + IDCT every block
    into the component sample planes (one vectorized einsum per comp)."""
    for c in frame["comps"]:
        if "coef" not in c:
            raise ValueError("JPEG progressive frame missing scans")
        bh, bw_, _ = c["coef"].shape
        q = qt[c["tq"]]
        coef = np.zeros((bh, bw_, 8, 8), np.float64)
        coef[:, :, _ZZ_ROWS, _ZZ_COLS] = c["coef"] * q[_ZZ_ROWS, _ZZ_COLS]
        # same matmul chain as the baseline _decode_block — a different
        # summation order (einsum) shifts ulps across rint's .5 boundary
        blocks = (_A.T @ coef @ _A) + 128.0
        c["plane"] = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)


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


# ---- progressive encoder helpers (fixture) ----------------------------------

def _quantized_blocks(padded: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) padded plane -> (by, bx, 64) quantized zigzag coefficients."""
    bh, bw_ = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = padded.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3)
    # same matmul chain as _encode_block: a different summation order
    # (einsum) shifts ulps across rint's .5 quantization boundary
    co = _A @ (np.ascontiguousarray(blocks) - 128.0) @ _A.T
    return np.rint(co[:, :, _ZZ_ROWS, _ZZ_COLS]
                   / q[_ZZ_ROWS, _ZZ_COLS]).astype(np.int32)


def _pt(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al toward zero (T.81 G.1.2.1)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _emit_ac_first_block(bw, ac_tab, v, ss, se, al):
    """First AC pass of one block at scale Al (no cross-block EOB runs —
    per-block EOB0 is legal and keeps the fixture simple)."""
    vals = [_pt(int(v[k]), al) for k in range(ss, se + 1)]
    nz = [i for i, x in enumerate(vals) if x]
    run = 0
    for i, x in enumerate(vals):
        if x == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(x)
        ln, code = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(x if x >= 0 else x + (1 << s) - 1, s)
        run = 0
        if i == nz[-1]:
            break
    if not nz or nz[-1] < se - ss:  # EOB0 unless the band ends on a value
        ln, code = ac_tab[0x00]
        bw.write(code, ln)


def _emit_ac_refine_block(bw, ac_tab, v, ss, se, al):
    """AC refinement of one block (T.81 G.1.2.3 encoder): newly
    significant ±1·2^Al positioned by zero-HISTORY runs; correction bits
    for nonzero-history slots buffered and flushed after each symbol
    (and after the per-block EOB0)."""
    absv = [abs(int(v[k])) for k in range(ss, se + 1)]
    new_idx = [i for i, a in enumerate(absv)
               if (a >> al) and not (a >> (al + 1))]
    last_new = new_idx[-1] if new_idx else -1
    corr: list[int] = []
    run = 0
    for i, a in enumerate(absv):
        hist = a >> (al + 1)
        now = a >> al
        if now == 0:                  # zero history AND still insignificant
            run += 1
            continue
        # a ZRL splits the walk the moment the zero-history run exceeds 15
        # at ANY nonzero slot — its correction bits belong to the walk
        # they positionally fall in (T.81 G.1.2.3 / libjpeg BE buffering).
        # Suppressed when the run folds into the trailing EOB instead.
        while run > 15 and i <= last_new:
            ln, code = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
            for bit in corr:
                bw.write(bit, 1)
            corr = []
        if hist:                      # nonzero history: one correction bit
            corr.append(now & 1)
            continue
        ln, code = ac_tab[(run << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if v[ss + i] > 0 else 0, 1)
        for bit in corr:
            bw.write(bit, 1)
        corr = []
        run = 0
    if last_new < len(absv) - 1:      # decoder still inside the band: EOB0
        ln, code = ac_tab[0x00]
        bw.write(code, ln)
        for bit in corr:
            bw.write(bit, 1)
    else:
        assert not corr


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90,
                            subsample: bool = False) -> bytes:
    """H×W×3 uint8 (or H×W gray) -> progressive (SOF2) JFIF bytes.
    subsample=True emits 4:2:0 (2×2 box-averaged chroma, same as
    encode_jpeg) — the interleaved DC scans then carry multi-block MCUs.

    Scan script (covers every Annex-G decode shape): interleaved DC
    first at Al=1 → DC refinement (1 bit/block) → per component AC
    first for bands 1..5 and 6..63 at Al=1 → per component AC
    refinement 1..63 to Al=0. Coefficients are identical to
    encode_jpeg's at the same quality, so a progressive decode must be
    pixel-identical to the baseline decode of the same image — the
    contract the tests pin."""
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
        cb = (-0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1]
              + 0.5 * rgb[..., 2] + 128.0)
        cr = (0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1]
              - 0.081312 * rgb[..., 2] + 128.0)
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
    nc = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    coefs = [
        _quantized_blocks(_pad_to(p, mcus_y * samp[ci][1] * 8,
                                  mcus_x * samp[ci][0] * 8),
                          ql if qids[ci] == 0 else qc)
        for ci, p in enumerate(planes)
    ]

    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, t in ((0, ql), (1, qc))[: 1 if gray else 2]:
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(t[r, c]) for r, c in _ZIGZAG)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qids[ci]])
    for tc, th, bits, vals in ((0, 0, _DC_BITS, _DC_VALS),
                               (1, 0, _AC_BITS, _AC_SYMBOLS)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + sum(bits), (tc << 4) | th)
        out += bytes(bits) + bytes(vals)
    dc_tab = _build_encode_table(_DC_BITS, _DC_VALS)
    ac_tab = _build_encode_table(_AC_BITS, _AC_SYMBOLS)

    def sos(comp_ids, ss, se, ah, al):
        hdr = bytearray(b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids),
                                                  len(comp_ids)))
        for cid in comp_ids:
            hdr += bytes([cid, 0x00])
        hdr += bytes([ss, se, (ah << 4) | al])
        return hdr

    def mcu_blocks():
        """(ci, by, bx) in interleaved MCU order (T.81 A.2.3)."""
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(nc):
                    sh, sv = samp[ci]
                    for bi in range(sh * sv):
                        yield ci, my * sv + bi // sh, mx * sh + bi % sh

    # scan 1: DC first, interleaved, Al=1 (point transform: arithmetic >>)
    out += sos(list(range(1, nc + 1)), 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * nc
    for ci, by, bx in mcu_blocks():
        dc = int(coefs[ci][by, bx, 0]) >> 1
        diff = dc - preds[ci]
        preds[ci] = dc
        t = _category(diff)
        ln, code = dc_tab[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    bw.flush()
    out += bw.out

    # scan 2: DC refinement to Al=0 — one raw bit per block
    out += sos(list(range(1, nc + 1)), 0, 0, 1, 0)
    bw = _BitWriter()
    for ci, by, bx in mcu_blocks():
        bw.write(int(coefs[ci][by, bx, 0]) & 1, 1)
    bw.flush()
    out += bw.out

    # AC scans: per component over its own NON-interleaved block grid
    # (ceil(cw/8) × ceil(ch/8) — MCU-padding dummy blocks are DC-only,
    # exactly the blocks the crop discards), two bands first at Al=1,
    # then refinement
    grids = []
    for ci in range(nc):
        cw = -(-w * samp[ci][0] // hmax)
        ch_ = -(-h * samp[ci][1] // vmax)
        grids.append((-(-ch_ // 8), -(-cw // 8)))
    for ci in range(nc):
        bys, bxs = grids[ci]
        for ss, se in ((1, 5), (6, 63)):
            out += sos([ci + 1], ss, se, 0, 1)
            bw = _BitWriter()
            for by in range(bys):
                for bx in range(bxs):
                    _emit_ac_first_block(bw, ac_tab, coefs[ci][by, bx], ss, se, 1)
            bw.flush()
            out += bw.out
    for ci in range(nc):
        bys, bxs = grids[ci]
        out += sos([ci + 1], 1, 63, 1, 0)
        bw = _BitWriter()
        for by in range(bys):
            for bx in range(bxs):
                _emit_ac_refine_block(bw, ac_tab, coefs[ci][by, bx], 1, 63, 0)
        bw.flush()
        out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


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
