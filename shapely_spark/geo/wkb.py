"""WKB reader/writer, pure Python/NumPy.

Semantics pinned to the reference codec (shapely/io.py:119 to_wkb /
:313 from_wkb): ISO flavor uses type = base + 1000*Z + 2000*M; extended
(EWKB) flavor uses high-bit flags (0x80000000 Z, 0x40000000 M,
0x20000000 SRID). Default write: little-endian extended (EWKB), matching
the reference's to_wkb default (shapely/io.py:119 flavor="extended");
identical bytes to ISO for 2-D SRID-less geometries.
POINT EMPTY serializes as POINT (nan nan), matching GEOS. LINEARRING has
no WKB code and is written as LINESTRING.

WKB (BinaryType) is the canonical storage/shuffle format for geometry
columns in the Spark engine (SURVEY.md §1.4).
"""

from __future__ import annotations

import struct

import numpy as np

from .geom import (
    GEOMETRYCOLLECTION,
    LINEARRING,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
    empty,
)

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


class WKBError(ValueError):
    pass


def _broadcast(fn, seq):
    """Reference ufunc semantics ('Geometry or array_like',
    shapely/io.py): map a scalar codec over a 1-D array_like, returning
    an object ndarray. Built via empty+fill so a (hypothetically)
    sequence-like element can never trigger np.array's nested-iteration
    guessing."""
    items = [fn(x) for x in seq]
    out = np.empty(len(items), dtype=object)
    for i, v in enumerate(items):
        out[i] = v
    return out


# --------------------------------------------------------------------------
# Writer
# --------------------------------------------------------------------------

def to_wkb(
    geom: Geometry | None,
    hex: bool = False,
    output_dimension: int | None = None,
    byte_order: int = -1,
    include_srid: bool = False,
    flavor: str = "extended",
) -> bytes | str | None:
    """geometry → WKB bytes (or uppercase hex string with hex=True).
    byte_order: -1 native (little everywhere this engine runs), 1=little,
    0=big. output_dimension 2 strips Z/M, 3 keeps Z (strips M), 4 keeps
    both; None (the default) resolves to 4 — GEOS WKBWriter semantics.

    reference: shapely/io.py:119 to_wkb(geometry, hex=False,
    output_dimension=None, byte_order=-1, include_srid=False,
    flavor="extended") — defaults matched exactly (r4: previously this
    defaulted to iso/3, silently dropping M and diverging on 3-D bytes).
    None resolves to 4 because M is supported here, mirroring the
    reference on GEOS >= 3.12. For 2-D SRID-less geometries (the engine's
    internal hot path) extended and iso bytes are identical.

    Accepts a Geometry or a 1-D array_like of them (reference ufunc
    broadcasting) — array input returns an object ndarray of bytes/hex.
    """
    if isinstance(geom, (list, tuple, np.ndarray)):
        return _broadcast(
            lambda g: to_wkb(g, hex, output_dimension, byte_order,
                             include_srid, flavor), geom)
    if geom is None:
        return None
    if output_dimension is None:
        output_dimension = 4
    if output_dimension == 2 and (geom.has_z or geom.has_m):
        from .constructive import force_2d

        geom = force_2d(geom)
    elif output_dimension == 3 and geom.has_m:
        geom = _drop_m(geom)
    out = bytearray()
    bo = 1 if byte_order == -1 else byte_order
    _write_geom(out, geom, bo, include_srid, flavor, top=True)
    return bytes(out).hex().upper() if hex else bytes(out)


def _drop_m(geom: Geometry) -> Geometry:
    """Copy without the M column (keeps Z when present)."""
    keep = 3 if geom.has_z else 2

    def strip(c):
        return None if c is None else np.asarray(c, dtype=np.float64)[:, :keep]

    tid = geom.type_id
    if geom.rings is not None:
        return Geometry(tid, rings=[strip(r) for r in geom.rings],
                        has_z=geom.has_z, has_m=False, srid=geom.srid)
    if geom.parts is not None:
        return Geometry(tid, parts=[_drop_m(p) for p in geom.parts],
                        has_z=geom.has_z, has_m=False, srid=geom.srid)
    return Geometry(tid, coords=strip(geom.coords),
                    has_z=geom.has_z, has_m=False, srid=geom.srid)


# internal type id (shapely/_geometry.py enum, 0-based) ↔ WKB code (1-based
# for point/linestring; polygon+ coincide)
_TO_WKB_CODE = {POINT: 1, LINESTRING: 2, LINEARRING: 2, POLYGON: 3,
                MULTIPOINT: 4, MULTILINESTRING: 5, MULTIPOLYGON: 6,
                GEOMETRYCOLLECTION: 7}
_FROM_WKB_CODE = {1: POINT, 2: LINESTRING, 3: POLYGON, 4: MULTIPOINT,
                  5: MULTILINESTRING, 6: MULTIPOLYGON, 7: GEOMETRYCOLLECTION}


def _wkb_type_code(geom: Geometry, include_srid, flavor, top) -> int:
    base = _TO_WKB_CODE[geom.type_id]
    if flavor == "extended":
        code = base
        if geom.has_z:
            code |= _EWKB_Z
        if geom.has_m:
            code |= _EWKB_M
        if include_srid and top and geom.srid:
            code |= _EWKB_SRID
        return code
    return base + (1000 if geom.has_z else 0) + (2000 if geom.has_m else 0)


def _write_geom(out, geom, bo, include_srid, flavor, top=False):
    endian = "<" if bo == 1 else ">"
    out += struct.pack(endian + "B", bo)
    code = _wkb_type_code(geom, include_srid, flavor, top)
    out += struct.pack(endian + "I", code)
    if flavor == "extended" and include_srid and top and geom.srid:
        out += struct.pack(endian + "I", geom.srid)
    ndim = geom.ndim
    tid = geom.type_id

    def write_coords(a):
        arr = np.asarray(a, dtype=np.float64)
        if bo == 1:
            arr = arr.astype("<f8", copy=False)
        else:
            arr = arr.astype(">f8", copy=False)
        out.extend(arr.tobytes())

    if tid == POINT:
        if geom.is_empty:
            write_coords(np.full((1, ndim), np.nan))
        else:
            write_coords(geom.coords[0])
    elif tid in (LINESTRING, LINEARRING):
        n = 0 if geom.coords is None else len(geom.coords)
        out += struct.pack(endian + "I", n)
        if n:
            write_coords(geom.coords[:, :ndim])
    elif tid == POLYGON:
        rings = geom.rings or []
        out += struct.pack(endian + "I", len(rings))
        for r in rings:
            out += struct.pack(endian + "I", len(r))
            write_coords(np.asarray(r)[:, :ndim])
    elif tid in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        parts = geom.parts or []
        out += struct.pack(endian + "I", len(parts))
        for p in parts:
            _write_geom(out, p, bo, include_srid, flavor, top=False)
    else:
        raise WKBError(f"cannot write type {tid}")


# --------------------------------------------------------------------------
# Reader
# --------------------------------------------------------------------------

def from_wkb(data: bytes | None, on_invalid: str = "raise") -> Geometry | None:
    """WKB bytes → Geometry. on_invalid ∈ raise|warn|ignore|fix
    (shapely/io.py:313). 'fix': unparseable bytes → None; parseable but
    topologically invalid geometry → make_valid repair.

    Accepts bytes/hex-str or a 1-D array_like of them (reference ufunc
    broadcasting) — array input returns an object ndarray of
    Geometry/None (previously a list input fell into the scalar
    bytes() coercion and, under non-raise modes, silently returned a
    single None)."""
    if isinstance(data, (list, tuple, np.ndarray)):
        return _broadcast(lambda d: from_wkb(d, on_invalid), data)
    if data is None:
        return None
    try:
        if isinstance(data, str):
            # reference from_wkb accepts hex-encoded strings
            # (shapely/io.py:313 "bytes object or hexadecimal string")
            data = bytes.fromhex(data)
        geom, _ = _read_geom(memoryview(bytes(data)), 0)
    except Exception as exc:
        if on_invalid == "raise":
            raise WKBError(str(exc)) from exc
        if on_invalid == "warn":
            import warnings

            warnings.warn(f"invalid WKB: {exc}")
        return None
    if on_invalid == "fix" and geom is not None and not geom.is_empty:
        from . import kernels as K

        if not K.is_valid(geom):
            from .overlay import make_valid

            return make_valid(geom)
    return geom


def _read_geom(buf: memoryview, off: int):
    bo = buf[off]
    endian = "<" if bo == 1 else ">"
    off += 1
    (code,) = struct.unpack_from(endian + "I", buf, off)
    off += 4
    srid = 0
    has_z = has_m = False
    if code & (_EWKB_Z | _EWKB_M | _EWKB_SRID):  # extended flavor
        has_z = bool(code & _EWKB_Z)
        has_m = bool(code & _EWKB_M)
        if code & _EWKB_SRID:
            (srid,) = struct.unpack_from(endian + "I", buf, off)
            off += 4
        base = _FROM_WKB_CODE[code & 0xFF]
    else:  # ISO flavor
        base = _FROM_WKB_CODE[code % 1000]
        dims = code // 1000
        has_z = dims in (1, 3)
        has_m = dims in (2, 3)
    ndim = 2 + has_z + has_m

    def read_pts(n, off):
        nbytes = n * ndim * 8
        arr = np.frombuffer(buf, dtype=endian + "f8", count=n * ndim, offset=off)
        return arr.reshape(n, ndim).astype(np.float64), off + nbytes

    if base == POINT:
        pts, off = read_pts(1, off)
        if np.all(np.isnan(pts)):
            g = empty(POINT)
        else:
            g = Geometry(POINT, coords=pts)
    elif base == LINESTRING:
        (n,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        pts, off = read_pts(n, off)
        g = Geometry(LINESTRING, coords=pts)
    elif base == POLYGON:
        (nr,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(endian + "I", buf, off)
            off += 4
            pts, off = read_pts(n, off)
            rings.append(pts)
        g = Geometry(POLYGON, rings=rings)
    elif base in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        (np_,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        parts = []
        for _ in range(np_):
            p, off = _read_geom(buf, off)
            parts.append(p)
        g = Geometry(base, parts=parts)
    else:
        raise WKBError(f"unknown WKB type code {code}")
    g.has_z, g.has_m, g.srid = has_z, has_m, srid
    return g, off


# --------------------------------------------------------------------------
# Batch helpers (the UDF-facing surface)
# --------------------------------------------------------------------------

def from_wkb_batch(column, on_invalid: str = "ignore") -> list[Geometry | None]:
    """Decode a pandas/arrow binary column to a list of Geometry (None-safe)."""
    return [None if b is None else from_wkb(b, on_invalid=on_invalid) for b in column]


def to_wkb_batch(geoms) -> list[bytes | None]:
    return [None if g is None else to_wkb(g) for g in geoms]


# --------------------------------------------------------------------------
# Legacy 1.x module API (reference: shapely/wkb.py:9 loads, :23 load,
# :36 dumps, :69 dump) — veneers over from_wkb/to_wkb including the
# big_endian= translation the reference keeps for 1.x callers.
# --------------------------------------------------------------------------

def loads(data, hex: bool = False):
    """reference: shapely/wkb.py:9 (from_wkb auto-detects hex strings,
    matching the reference, so hex= only documents intent)."""
    if hex and isinstance(data, str):
        data = bytes.fromhex(data)
    return from_wkb(data)


def load(fp, hex: bool = False):
    """reference: shapely/wkb.py:23."""
    return loads(fp.read(), hex=hex)


def dumps(ob, hex: bool = False, srid: int | None = None, **kw):
    """reference: shapely/wkb.py:36 — srid= clones with the SRID set and
    forces include_srid; big_endian= maps to byte_order 0/1."""
    if srid is not None:
        from dataclasses import replace

        ob = replace(ob, srid=int(srid))
        kw["include_srid"] = True
    if "big_endian" in kw:
        kw["byte_order"] = 0 if kw.pop("big_endian") else 1
    return to_wkb(ob, hex=hex, **kw)


def dump(ob, fp, hex: bool = False, **kw):
    """reference: shapely/wkb.py:69."""
    fp.write(dumps(ob, hex=hex, **kw))
