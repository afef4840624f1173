"""Lossless WebP (VP8L) codec, pure stdlib + numpy.

Continues the round-3 codec program (codecs.py PNG/GIF, jpeg.py, flac.py):
VP8L's entropy layer is canonical prefix coding + LZ77 + an optional color
cache — no DSP library needed, so the decode is REAL. Implements the
public "WebP Lossless Bitstream Specification" (RFC 9649 §3-5):

- RIFF container walk ("WEBP" form, `VP8L` chunk; `VP8 ` lossy and the
  alpha-compressed `ALPH` path need the VP8 boolean coder and raise).
- LSB-first bitstream; 14-bit width/height-1 header.
- All four transforms, inverse-applied in reverse read order:
  PREDICTOR (14 modes, per-block sub-image), COLOR (cross-color
  deltas, signed ``(t*c)>>5`` arithmetic), SUBTRACT_GREEN,
  COLOR_INDEXING (delta-coded palette, sub-byte packing for ≤16 colors).
- Entropy-coded images at every level: optional color cache
  (hash ``0x1e35a7bd * argb >> (32-bits)``), optional meta-huffman
  (entropy image selects one of N groups of 5 prefix codes), simple
  (1-2 symbol) and code-length-coded prefix codes (RLE symbols 16/17/18,
  optional max_symbol short-circuit), LZ77 length/distance prefix values
  with the 120-entry 2D neighbor map for short distances.

The neighbor map is generated, not transcribed: the spec orders the 120
(dx, dy) offsets by squared euclidean distance, ties by larger dy first,
then positive dx first — the generator reproduces every entry printed in
the spec table and yields exactly 120 offsets at the d²=74 cutoff
(validated in tests against the spec's published prefix).

Encoder (`encode_webp_lossless`) exists for fixtures and the oracle
query: single huffman group, real frequency-built canonical prefix codes
(simple or code-length-coded), optional subtract-green / palette
transforms, optional run-left LZ77 (both the 2D-map and plain distance
encodings), optional color cache. Decoder-only paths (predictor / color
transforms, meta-huffman) are unit-tested against hand-computed arrays.

Reference parity note: the reference engine (shapely/shapely) has no
media surface; this belongs to the training-data-pipeline additions
(SURVEY.md "pipeline ops").
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O (VP8L is LSB-first, like DEFLATE; prefix codes are read MSB-of-
# code-first, i.e. table-inverted exactly as in DEFLATE)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        # 8 zero bytes of tail padding let peeks run past the end; actual
        # over-reads are caught against nbits
        self.data = bytes(data) + b"\x00" * 8
        self.nbits = len(data) * 8
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("VP8L: truncated bitstream")
        self.pos = p + n
        # LSB-first: bit i of the result is stream bit p+i
        window = int.from_bytes(self.data[p >> 3:(p >> 3) + 8], "little")
        return (window >> (p & 7)) & ((1 << n) - 1)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def getvalue(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


def _rev(code: int, length: int) -> int:
    r = 0
    for _ in range(length):
        r = (r << 1) | (code & 1)
        code >>= 1
    return r


# ---------------------------------------------------------------------------
# canonical prefix codes (DEFLATE-style canonical assignment, RFC 9649 §5.2)
# ---------------------------------------------------------------------------

MAX_CODE_LENGTH = 15
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _canonical_codes(lengths: np.ndarray) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical over (length, symbol)."""
    codes = {}
    code = 0
    for ln in range(1, int(lengths.max(initial=0)) + 1):
        for sym in np.nonzero(lengths == ln)[0]:
            codes[int(sym)] = (code, ln)
            code += 1
        code <<= 1
    return codes


class _PrefixCode:
    """Decode table: lut over max_len reversed bits -> (symbol, length).
    A single-symbol code (length 0) decodes without consuming bits."""

    __slots__ = ("lut", "max_len", "single")

    def __init__(self, lengths: np.ndarray):
        used = np.nonzero(lengths)[0]
        if len(used) == 0:
            raise ValueError("VP8L: empty prefix code")
        if len(used) == 1:
            self.single = int(used[0])
            self.lut = None
            self.max_len = 0
            return
        self.single = -1
        # completeness (Kraft equality) — over/under-subscribed is corrupt
        kraft = int(np.sum(1 << (MAX_CODE_LENGTH - lengths[used])))
        if kraft != 1 << MAX_CODE_LENGTH:
            raise ValueError("VP8L: invalid prefix code (Kraft)")
        self.max_len = int(lengths.max())
        size = 1 << self.max_len
        lut_sym = [0] * size
        lut_len = [0] * size
        for sym, (code, ln) in _canonical_codes(lengths).items():
            base = _rev(code, ln)
            step = 1 << ln
            for idx in range(base, size, step):
                lut_sym[idx] = sym
                lut_len[idx] = ln
        self.lut = (lut_sym, lut_len)

    def read(self, br: _BitReader) -> int:
        if self.single >= 0:
            return self.single
        p = br.pos
        window = int.from_bytes(br.data[p >> 3:(p >> 3) + 8], "little")
        v = (window >> (p & 7)) & ((1 << self.max_len) - 1)
        ln = self.lut[1][v]
        if ln == 0 or p + ln > br.nbits:
            raise ValueError("VP8L: truncated prefix code")
        br.pos = p + ln
        return self.lut[0][v]


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    """RFC 9649 §5.2.1/5.2.2: simple (1-2 symbols) or code-length-coded."""
    lengths = np.zeros(alphabet_size, dtype=np.int32)
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        s0 = br.read(8 if first_8bits else 1)
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = br.read(8)
            lengths[s1] = 1
        else:
            return _PrefixCode(lengths)  # single symbol, zero-bit code
        return _PrefixCode(lengths)
    # normal: 3-bit lengths for the code-length code, in _CLC_ORDER
    num_code_lengths = 4 + br.read(4)
    clc_lengths = np.zeros(19, dtype=np.int32)
    for i in range(num_code_lengths):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    if br.read(1):  # limited max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("VP8L: max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            slot = code_len - 16
            repeat = br.read((2, 3, 7)[slot]) + (3, 3, 11)[slot]
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflow")
            fill = prev_len if code_len == 16 else 0
            lengths[symbol:symbol + repeat] = fill
            symbol += repeat
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix values + the 2D distance map (RFC 9649 §4.2.2)
# ---------------------------------------------------------------------------


def _lz77_value(code: int, br: _BitReader) -> int:
    """prefix code (0..39) + extra bits -> value ≥ 1 (lengths & distances)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_code(value: int) -> tuple[int, int, int]:
    """value ≥ 1 -> (prefix code, extra bits payload, extra bit count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    offset = (2 + ((v >> extra) & 1)) << extra
    return 2 * extra + ((v >> extra) & 1) + 2, v - offset, extra


def _distance_map() -> np.ndarray:
    """The 120 short-distance (dx, dy) offsets: every neighbor ordered by
    squared distance, ties by larger dy then positive-before-negative dx —
    this rule reproduces the spec's printed table exactly and its d²=74
    cutoff yields exactly 120 entries (test_multimodal pins the published
    prefix)."""
    offs = []
    for dy in range(0, 9):
        for dx in range(-8, 9):
            if (dx, dy) == (0, 0) or (dy == 0 and dx <= 0):
                continue
            offs.append((dx * dx + dy * dy, -dy, -dx, dx, dy))
    offs.sort()
    return np.array([(dx, dy) for _, _, _, dx, dy in offs[:120]], dtype=np.int32)


_DIST_MAP = _distance_map()


def _plane_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    return max(int(dy) * xsize + int(dx), 1)


# ---------------------------------------------------------------------------
# entropy-coded image (RFC 9649 §5.2.2)
# ---------------------------------------------------------------------------

def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_entropy_image(br: _BitReader, w: int, h: int, level0: bool,
                          transforms: list | None = None) -> np.ndarray:
    """Decode one spatially-coded image -> (h*w, 4) uint8 [a, r, g, b].
    At level 0, reads transforms first (appending (type, data) to
    `transforms`) and w may shrink via color-indexing packing."""
    if level0:
        while br.read(1):
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("VP8L: duplicate transform")
            if ttype == 2:  # SUBTRACT_GREEN
                transforms.append((2, None))
            elif ttype in (0, 1):  # PREDICTOR / COLOR
                bits = br.read(3) + 2
                tw, th = _subsample(w, bits), _subsample(h, bits)
                data = _decode_entropy_image(br, tw, th, False)
                transforms.append((ttype, (bits, data.reshape(th, tw, 4))))
            else:  # COLOR_INDEXING
                n_colors = br.read(8) + 1
                pal = _decode_entropy_image(br, n_colors, 1, False)
                pal = np.cumsum(pal.astype(np.int64), axis=0).astype(np.uint8)
                if n_colors <= 2:
                    pack_bits = 3
                elif n_colors <= 4:
                    pack_bits = 2
                elif n_colors <= 16:
                    pack_bits = 1
                else:
                    pack_bits = 0
                transforms.append((3, (pack_bits, w, pal)))
                w = _subsample(w, pack_bits)

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not (1 <= cache_bits <= 11):
        raise ValueError("VP8L: bad color cache size")
    cache = [(0, 0, 0, 0)] * (1 << cache_bits) if cache_bits else None

    group_idx = None
    hbits = 0
    n_groups = 1
    if level0 and br.read(1):  # meta-huffman
        hbits = br.read(3) + 2
        ew, eh = _subsample(w, hbits), _subsample(h, hbits)
        eimg = _decode_entropy_image(br, ew, eh, False).reshape(eh, ew, 4)
        group_idx = (eimg[:, :, 1].astype(np.int32) << 8) | eimg[:, :, 2]
        n_groups = int(group_idx.max()) + 1

    groups = []
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_size),
            _read_prefix_code(br, 256),   # red
            _read_prefix_code(br, 256),   # blue
            _read_prefix_code(br, 256),   # alpha
            _read_prefix_code(br, 40),    # distance
        ))

    n = w * h
    out: list = [None] * n
    pos = 0
    g = groups[0]
    while pos < n:
        if group_idx is not None:
            y, x = divmod(pos, w)
            g = groups[int(group_idx[y >> hbits, x >> hbits])]
        s = g[0].read(br)
        if s < 256:  # literal: green, then red, blue, alpha
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha, red, s, blue)
            out[pos] = px
            if cache is not None:
                cache[_cache_slot(px, cache_bits)] = px
            pos += 1
        elif s < 280:  # backward reference
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(g[4].read(br), br)
            dist = _plane_distance(dist_code, w)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backref out of range")
            for i in range(pos, pos + length):  # overlap-safe in-order copy
                out[i] = out[i - dist]
            if cache is not None:
                for i in range(pos, pos + length):
                    cache[_cache_slot(out[i], cache_bits)] = out[i]
            pos += length
        else:  # color cache hit
            if cache is None:
                raise ValueError("VP8L: cache symbol without cache")
            out[pos] = cache[s - 280]
            pos += 1
    return np.array(out, dtype=np.uint8)


def _cache_slot(px, bits: int) -> int:
    a, r, g, b = (int(v) for v in px)
    argb = (a << 24) | (r << 16) | (g << 8) | b
    # uint32 wraparound by mask (ANSI-safe; matches the spec's u32 multiply)
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


# ---------------------------------------------------------------------------
# inverse transforms (RFC 9649 §4) — arrays are (h, w, 4) uint8 [a, r, g, b]
# ---------------------------------------------------------------------------


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return ((a.astype(np.int32) + b) >> 1).astype(np.int32)


def _predict(mode: int, L, T, TL, TR) -> np.ndarray:
    """One pixel's predictor (int32[4] channels [a, r, g, b])."""
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.int32)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select: whole-pixel choice by Manhattan proximity;
        # |p-L| = |T-TL| and |p-T| = |L-TL|; ties pick TOP (libwebp Sub3)
        p = L.astype(np.int32) + T - TL
        pl = int(np.abs(p - L).sum())
        pt = int(np.abs(p - T).sum())
        return T if pt <= pl else L
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(L.astype(np.int32) + T - TL, 0, 255)
    if mode == 13:  # ClampAddSubtractHalf (C truncating /2)
        ave = _avg2(L, T)
        d = ave - TL.astype(np.int32)
        half = np.where(d >= 0, d >> 1, -((-d) >> 1))
        return np.clip(ave + half, 0, 255)
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _inv_predictor(img: np.ndarray, bits: int, modes_img: np.ndarray) -> np.ndarray:
    """In-place inverse of the predictor transform. modes_img: (bh, bw, 4)
    sub-image whose GREEN channel holds the mode per block. Edge rules per
    spec: (0,0) uses mode 0; top row mode 1 (L); left column mode 2 (T);
    TR at the right edge wraps to the current row's leftmost pixel."""
    h, w, _ = img.shape
    px = img.astype(np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = _predict(0, None, None, None, None)
            elif y == 0:
                pred = _predict(1, px[0, x - 1], None, None, None)
            elif x == 0:
                pred = _predict(2, None, px[y - 1, 0], None, None)
            else:
                mode = int(modes_img[y >> bits, x >> bits, 2])
                L = px[y, x - 1]
                T = px[y - 1, x]
                TL = px[y - 1, x - 1]
                TR = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
                pred = _predict(mode, L, T, TL, TR)
            px[y, x] = (px[y, x] + pred) & 0xFF
    return px.astype(np.uint8)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5, arithmetic shift."""
    prod = t.astype(np.int8).astype(np.int32) * c.astype(np.int8).astype(np.int32)
    return prod >> 5


def _inv_color_transform(img: np.ndarray, bits: int, cte: np.ndarray) -> np.ndarray:
    """Inverse cross-color transform. cte sub-image channels per spec:
    green_to_red in BLUE, green_to_blue in GREEN, red_to_blue in RED."""
    h, w, _ = img.shape
    by = np.arange(h) >> bits
    bx = np.arange(w) >> bits
    g2r = cte[by][:, bx, 3]
    g2b = cte[by][:, bx, 2]
    r2b = cte[by][:, bx, 1]
    green = img[:, :, 2]
    red = (img[:, :, 1].astype(np.int32) + _ct_delta(g2r, green)) & 0xFF
    blue = (img[:, :, 3].astype(np.int32)
            + _ct_delta(g2b, green) + _ct_delta(r2b, red.astype(np.uint8))) & 0xFF
    out = img.copy()
    out[:, :, 1] = red
    out[:, :, 3] = blue
    return out


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    out = img.copy()
    g = img[:, :, 2].astype(np.int32)
    out[:, :, 1] = (img[:, :, 1] + g) & 0xFF
    out[:, :, 3] = (img[:, :, 3] + g) & 0xFF
    return out


def _inv_color_indexing(img: np.ndarray, pack_bits: int, width: int,
                        pal: np.ndarray) -> np.ndarray:
    """Palette lookup; sub-byte indices unpack LSB-first along x.
    Out-of-range index -> transparent black (spec §4.2.4)."""
    h = img.shape[0]
    if pack_bits:
        per = 1 << pack_bits
        depth = 8 >> pack_bits
        packed = img[:, :, 2]
        idx = np.zeros((h, img.shape[1] * per), dtype=np.int32)
        for k in range(per):
            idx[:, k::per] = (packed >> (k * depth)) & ((1 << depth) - 1)
        idx = idx[:, :width]
    else:
        idx = img[:, :, 2].astype(np.int32)
    n_colors = pal.shape[0]
    safe = np.clip(idx, 0, n_colors - 1)
    out = pal[safe]
    out[idx >= n_colors] = 0
    return out


# ---------------------------------------------------------------------------
# container + public decode
# ---------------------------------------------------------------------------


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload -> H×W×4 uint8 [a, r, g, b]."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha_is_used hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unknown version")
    transforms: list = []
    data = _decode_entropy_image(br, w, h, True, transforms)
    # color-indexing is the only transform that shrinks the coded width
    dec_w = w
    for ttype, tdata in transforms:
        if ttype == 3:
            dec_w = _subsample(w, tdata[0])
    img = data.reshape(h, dec_w, 4)
    for ttype, tdata in reversed(transforms):
        if ttype == 0:
            img = _inv_predictor(img, tdata[0], tdata[1])
        elif ttype == 1:
            img = _inv_color_transform(img, tdata[0], tdata[1])
        elif ttype == 2:
            img = _inv_subtract_green(img)
        else:
            img = _inv_color_indexing(img, tdata[0], tdata[1], tdata[2])
    if img.shape != (h, w, 4):
        raise ValueError("VP8L: decoded size mismatch")
    return img


def decode_webp(b: bytes) -> np.ndarray:
    """WebP bytes -> H×W×3 uint8 (alpha dropped, matching decode_png).
    Lossless (VP8L) only; lossy VP8 needs the boolean arithmetic coder
    and raises NotImplementedError."""
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    pos = 12
    while pos + 8 <= len(b):
        tag = b[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", b, pos + 4)
        payload = b[pos + 8:pos + 8 + ln]
        if tag == b"VP8L":
            argb = decode_vp8l(payload)
            return argb[:, :, 1:4].copy()
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) needs the boolean arithmetic coder; "
                "only lossless (VP8L) is supported here")
        pos += 8 + ln + (ln & 1)
    raise ValueError("WebP: no VP8L chunk")


# ---------------------------------------------------------------------------
# encoder (fixtures + oracle query synthesis)
# ---------------------------------------------------------------------------


def _build_lengths(freqs: np.ndarray, max_len: int = MAX_CODE_LENGTH) -> np.ndarray:
    """Real huffman code lengths from frequencies (heapq), depth-capped by
    construction for the tiny alphabets used here."""
    import heapq

    used = np.nonzero(freqs)[0]
    lengths = np.zeros(len(freqs), dtype=np.int32)
    if len(used) == 0:
        return lengths
    if len(used) == 1:
        lengths[used[0]] = 1
        return lengths
    heap = [(int(freqs[s]), int(s), (int(s),)) for s in used]
    heapq.heapify(heap)
    while len(heap) > 1:
        fa, _, syms_a = heapq.heappop(heap)
        fb, _, syms_b = heapq.heappop(heap)
        for s in syms_a + syms_b:
            lengths[s] += 1
        heapq.heappush(heap, (fa + fb, min(syms_a + syms_b), syms_a + syms_b))
    if lengths.max() > max_len:
        raise ValueError("encoder: code too deep (use more uniform data)")
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: np.ndarray) -> dict:
    """Emit a prefix code (simple when ≤2 symbols, else code-length-coded
    with a fixed 19-entry code-length code); returns symbol -> (code, len)."""
    used = np.nonzero(lengths)[0]
    if len(used) == 0:
        raise ValueError("encoder: empty code")
    if len(used) <= 2 and used[-1] <= 255:  # simple codes carry 8-bit symbols
        bw.write(1, 1)                       # simple
        bw.write(len(used) - 1, 1)           # num_symbols - 1
        s0 = int(used[0])
        first_8bits = 1 if s0 > 1 else 0
        bw.write(first_8bits, 1)
        bw.write(s0, 8 if first_8bits else 1)
        if len(used) == 2:
            bw.write(int(used[1]), 8)
            return {int(used[0]): (0, 1), int(used[1]): (1, 1)}
        return {int(used[0]): (0, 0)}
    bw.write(0, 1)                           # normal
    # code-length symbols actually present (no 16/17/18 RLE: explicit runs
    # of zeros are encoded as repeated '0' lengths — legal, just larger)
    clc_freq = np.zeros(19, dtype=np.int64)
    for ln in lengths:
        clc_freq[int(ln)] += 1
    clc_lengths = _build_lengths(clc_freq, max_len=7)
    bw.write(15, 4)                          # num_code_lengths = 4 + 15 = 19
    for sym in _CLC_ORDER:
        bw.write(int(clc_lengths[sym]), 3)
    bw.write(0, 1)                           # no max_symbol short-circuit
    clc_codes = _canonical_codes(clc_lengths)
    for ln in lengths:
        code, cl = clc_codes[int(ln)]
        bw.write(_rev(code, cl), cl)
    return _canonical_codes(lengths)


def _emit(bw: _BitWriter, codes: dict, sym: int) -> None:
    code, ln = codes[sym]
    if ln:
        bw.write(_rev(code, ln), ln)


def encode_webp_lossless(
    img: np.ndarray,
    subtract_green: bool = False,
    palette: bool = False,
    use_lz77: bool = True,
    cache_bits: int = 0,
    prefer_map_distance: bool = True,
) -> bytes:
    """H×W×3 (or H×W×4 RGBA) uint8 -> lossless WebP bytes. Single huffman
    group, frequency-built canonical codes; optional subtract-green or
    palette transform, run-left LZ77 (2D-map code 2 or plain code 121),
    optional color cache."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("expected H×W×3 or H×W×4 uint8")
    h, w = img.shape[:2]
    if img.shape[2] == 3:
        alpha = np.full((h, w, 1), 255, dtype=np.uint8)
        img = np.concatenate([img, alpha], axis=2)
    # to [a, r, g, b]
    px = np.stack([img[:, :, 3], img[:, :, 0], img[:, :, 1], img[:, :, 2]],
                  axis=2).astype(np.int32)

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int((img[:, :, 3] != 255).any()), 1)
    bw.write(0, 3)  # version

    pal = None
    pack_bits = 0
    if palette:
        flat = px.reshape(-1, 4)
        pal, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError("palette: more than 256 colors")
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(len(pal) - 1, 8)
        dpal = np.diff(pal.astype(np.int64), axis=0,
                       prepend=np.zeros((1, 4), dtype=np.int64)) & 0xFF
        _encode_entropy_image(bw, dpal.astype(np.int32).reshape(1, -1, 4),
                              use_lz77=False, cache_bits=0, level0=False)
        n_colors = len(pal)
        if n_colors <= 2:
            pack_bits = 3
        elif n_colors <= 4:
            pack_bits = 2
        elif n_colors <= 16:
            pack_bits = 1
        idx = inverse.reshape(h, w).astype(np.int32)
        if pack_bits:
            per = 1 << pack_bits
            depth = 8 >> pack_bits
            pw = _subsample(w, pack_bits)
            packed = np.zeros((h, pw), dtype=np.int32)
            for k in range(per):
                col = idx[:, k::per]
                packed[:, :col.shape[1]] |= col << (k * depth)
            green = packed
        else:
            green = idx
        px = np.zeros((h, green.shape[1], 4), dtype=np.int32)
        px[:, :, 0] = 255
        px[:, :, 2] = green
    elif subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        g = px[:, :, 2]
        px = px.copy()
        px[:, :, 1] = (px[:, :, 1] - g) & 0xFF
        px[:, :, 3] = (px[:, :, 3] - g) & 0xFF
    bw.write(0, 1)  # no more transforms

    _encode_entropy_image(bw, px, use_lz77=use_lz77, cache_bits=cache_bits,
                          prefer_map_distance=prefer_map_distance)
    payload = b"\x2f" + bw.getvalue()
    riff = b"WEBPVP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _encode_entropy_image(bw: _BitWriter, px: np.ndarray, use_lz77: bool,
                          cache_bits: int, prefer_map_distance: bool = True,
                          level0: bool = True) -> None:
    """Single-group spatially-coded image from (h, w, 4) int32 [a,r,g,b]."""
    h, w = px.shape[:2]
    flat = px.reshape(-1, 4)
    n = len(flat)

    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
        cache = np.full((1 << cache_bits, 4), -1, dtype=np.int64)
    else:
        bw.write(0, 1)
        cache = None
    if level0:
        bw.write(0, 1)  # no meta-huffman (inner images never carry the bit)

    # token stream: ('lit', a, r, g, b) | ('copy', length, dist_code) |
    # ('cache', slot)
    tokens = []
    pos = 0
    while pos < n:
        if use_lz77 and pos > 0:
            run = 0
            while (pos + run < n and run < 4096
                   and (flat[pos + run] == flat[pos + run - 1]).all()):
                run += 1
            if run >= 3:
                dist_code = 2 if (prefer_map_distance and w > 1) else 121
                # map code 2 is (dx=1, dy=0) -> distance 1; plain 121 -> 1
                tokens.append(("copy", run, dist_code))
                if cache is not None:
                    for i in range(run):
                        cache[_cache_slot(flat[pos + i], cache_bits)] = flat[pos + i]
                pos += run
                continue
        a, r, g, b = (int(v) for v in flat[pos])
        if cache is not None:
            slot = _cache_slot(flat[pos], cache_bits)
            if (cache[slot] == flat[pos]).all():
                tokens.append(("cache", slot))
                pos += 1
                continue
            cache[slot] = flat[pos]
        tokens.append(("lit", a, r, g, b))
        pos += 1

    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    fg = np.zeros(green_size, dtype=np.int64)
    fr = np.zeros(256, dtype=np.int64)
    fb = np.zeros(256, dtype=np.int64)
    fa = np.zeros(256, dtype=np.int64)
    fd = np.zeros(40, dtype=np.int64)
    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            fg[g] += 1
            fr[r] += 1
            fb[b] += 1
            fa[a] += 1
        elif t[0] == "copy":
            lc, _, _ = _lz77_code(t[1])
            fg[256 + lc] += 1
            dc, _, _ = _lz77_code(t[2])
            fd[dc] += 1
        else:
            fg[280 + t[1]] += 1
    # every alphabet needs ≥1 used symbol for a valid code
    for f in (fr, fb, fa, fd):
        if f.sum() == 0:
            f[0] = 1

    cg = _write_prefix_code(bw, _build_lengths(fg))
    cr = _write_prefix_code(bw, _build_lengths(fr))
    cb = _write_prefix_code(bw, _build_lengths(fb))
    ca = _write_prefix_code(bw, _build_lengths(fa))
    cd = _write_prefix_code(bw, _build_lengths(fd))

    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            _emit(bw, cg, g)
            _emit(bw, cr, r)
            _emit(bw, cb, b)
            _emit(bw, ca, a)
        elif t[0] == "copy":
            lc, lx, ln = _lz77_code(t[1])
            _emit(bw, cg, 256 + lc)
            if ln:
                bw.write(lx, ln)
            dc, dx, dn = _lz77_code(t[2])
            _emit(bw, cd, dc)
            if dn:
                bw.write(dx, dn)
        else:
            _emit(bw, cg, 280 + t[1])
