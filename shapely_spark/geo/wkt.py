"""WKT reader/writer.

Semantics pinned to shapely/io.py:33 to_wkt (rounding_precision=6,
trim=True defaults) and :269 from_wkt. Used for golden fixtures ported
from the reference test corpus (shapely/tests/common.py) and debugging;
WKB is the engine's interchange format.
"""

from __future__ import annotations

import re

import numpy as np

from .geom import (
    GEOMETRYCOLLECTION,
    LINEARRING,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    NAME_TO_TYPE,
    POINT,
    POLYGON,
    TYPE_NAMES,
    Geometry,
    empty,
)


class WKTError(ValueError):
    pass


def _fmt(v: float, precision: int, trim: bool) -> str:
    if precision >= 0:
        s = f"{v:.{precision}f}"
    elif not trim:
        s = f"{v:.16f}"  # legacy dumps(): GEOS WKTWriter untrimmed default
    else:
        s = repr(float(v))
    if trim and "." in s:
        s = s.rstrip("0").rstrip(".")
    if s in ("-0", ""):
        s = "0"
    return s


def to_wkt(geom: Geometry | None, rounding_precision: int = 6, trim: bool = True) -> str | None:
    if isinstance(geom, (list, tuple, np.ndarray)):
        from .wkb import _broadcast
        return _broadcast(lambda g: to_wkt(g, rounding_precision, trim), geom)
    if geom is None:
        return None

    def coords_str(a):
        return ", ".join(
            " ".join(_fmt(v, rounding_precision, trim) for v in row) for row in np.asarray(a)
        )

    def z_tag(g):
        t = ""
        if g.has_z:
            t += "Z"
        if g.has_m:
            t += "M"
        return (t + " ") if t else ""

    tid = geom.type_id
    name = TYPE_NAMES[tid]
    if geom.is_empty:
        return f"{name} {z_tag(geom)}EMPTY"
    if tid == POINT:
        return f"POINT {z_tag(geom)}({coords_str(geom.coords)})"
    if tid in (LINESTRING, LINEARRING):
        return f"{name} {z_tag(geom)}({coords_str(geom.coords)})"
    if tid == POLYGON:
        rings = ", ".join(f"({coords_str(r)})" for r in geom.rings)
        return f"POLYGON {z_tag(geom)}({rings})"
    if tid == MULTIPOINT:
        pts = ", ".join(f"({coords_str(p.coords)})" for p in geom.parts)
        return f"MULTIPOINT {z_tag(geom)}({pts})"
    if tid == MULTILINESTRING:
        ls = ", ".join(f"({coords_str(p.coords)})" for p in geom.parts)
        return f"MULTILINESTRING {z_tag(geom)}({ls})"
    if tid == MULTIPOLYGON:
        ps = ", ".join(
            "(" + ", ".join(f"({coords_str(r)})" for r in p.rings) + ")" for p in geom.parts
        )
        return f"MULTIPOLYGON {z_tag(geom)}({ps})"
    if tid == GEOMETRYCOLLECTION:
        ps = ", ".join(to_wkt(p, rounding_precision, trim) for p in geom.parts)
        return f"GEOMETRYCOLLECTION {z_tag(geom)}({ps})"
    raise WKTError(f"cannot write type {tid}")


# --------------------------------------------------------------------------
# Parser — small recursive-descent over a token stream
# --------------------------------------------------------------------------

_TOKEN = re.compile(r"[A-Za-z]+|\(|\)|,|[-+0-9.eE]+")


def from_wkt(text: str | None, on_invalid: str = "raise") -> Geometry | None:
    if isinstance(text, (list, tuple, np.ndarray)):
        from .wkb import _broadcast
        return _broadcast(lambda t: from_wkt(t, on_invalid), text)
    if text is None:
        return None
    try:
        tokens = _TOKEN.findall(text)
        geom, pos = _parse_geom(tokens, 0)
        return geom
    except Exception as exc:
        if on_invalid == "raise":
            raise WKTError(f"{exc} in {text!r}") from exc
        if on_invalid == "warn":
            import warnings

            warnings.warn(f"invalid WKT: {exc}")
        return None


def _parse_geom(toks: list[str], i: int):
    name = toks[i].upper()
    if name not in NAME_TO_TYPE:
        raise WKTError(f"unknown geometry type {name!r}")
    tid = NAME_TO_TYPE[name]
    i += 1
    has_z = has_m = False
    if i < len(toks) and toks[i].upper() in ("Z", "M", "ZM"):
        tag = toks[i].upper()
        has_z = "Z" in tag
        has_m = "M" in tag
        i += 1
    if i < len(toks) and toks[i].upper() == "EMPTY":
        g = empty(tid)
        g.has_z, g.has_m = has_z, has_m
        return g, i + 1
    ndim = 2 + has_z + has_m

    def parse_coord_list(i):
        # inside parens: x y [z [m]], comma-separated; a bare EMPTY is an
        # empty element inside a multi (reference accepts
        # "MULTILINESTRING (EMPTY, (0 0, 1 1))")
        if toks[i].upper() == "EMPTY":
            return np.zeros((0, ndim)), i + 1
        assert toks[i] == "(", f"expected ( at {i}"
        i += 1
        rows = []
        cur = []
        while toks[i] != ")":
            if toks[i] == ",":
                rows.append(cur)
                cur = []
            else:
                cur.append(float(toks[i]))
            i += 1
        rows.append(cur)
        a = np.array(rows, dtype=np.float64)
        if a.shape[1] != ndim:
            # tolerate untagged 3D WKT (e.g. "POINT (0 0 0)") as XYZ
            pass
        return a, i + 1

    def parse_ring_list(i):
        if toks[i].upper() == "EMPTY":  # empty element inside a multi
            return [], i + 1
        assert toks[i] == "("
        i += 1
        rings = []
        while True:
            r, i = parse_coord_list(i)
            rings.append(r)
            if toks[i] == ",":
                i += 1
                continue
            assert toks[i] == ")"
            return rings, i + 1

    if tid == POINT:
        a, i = parse_coord_list(i)
        g = Geometry(POINT, coords=a)
    elif tid in (LINESTRING, LINEARRING):
        a, i = parse_coord_list(i)
        g = Geometry(tid, coords=a)
    elif tid == POLYGON:
        rings, i = parse_ring_list(i)
        g = Geometry(POLYGON, rings=rings)
    elif tid == MULTIPOINT:
        # MULTIPOINT ((0 0), (1 2)) or MULTIPOINT (0 0, 1 2)
        assert toks[i] == "("
        if toks[i + 1] == "(":
            rings, i = parse_ring_list(i)
            parts = [Geometry(POINT, coords=r) for r in rings]
        else:
            a, i = parse_coord_list(i)
            parts = [Geometry(POINT, coords=row.reshape(1, -1)) for row in a]
        g = Geometry(MULTIPOINT, parts=parts)
    elif tid == MULTILINESTRING:
        rings, i = parse_ring_list(i)
        g = Geometry(MULTILINESTRING, parts=[Geometry(LINESTRING, coords=r) for r in rings])
    elif tid == MULTIPOLYGON:
        assert toks[i] == "("
        i += 1
        parts = []
        while True:
            rings, i = parse_ring_list(i)
            parts.append(Geometry(POLYGON, rings=rings))
            if toks[i] == ",":
                i += 1
                continue
            assert toks[i] == ")"
            i += 1
            break
        g = Geometry(MULTIPOLYGON, parts=parts)
    elif tid == GEOMETRYCOLLECTION:
        assert toks[i] == "("
        i += 1
        parts = []
        while True:
            p, i = _parse_geom(toks, i)
            parts.append(p)
            if toks[i] == ",":
                i += 1
                continue
            assert toks[i] == ")"
            i += 1
            break
        g = Geometry(GEOMETRYCOLLECTION, parts=parts)
    else:
        raise WKTError(f"cannot parse type {tid}")

    # propagate/infer dimensionality
    if not (has_z or has_m):
        seqs = list(g.coord_seqs())
        if seqs and seqs[0].shape[1] >= 3:
            has_z = True
    g.has_z, g.has_m = has_z, has_m
    for p in g.parts or []:
        p.has_z, p.has_m = has_z, has_m
    return g, i


# --------------------------------------------------------------------------
# Legacy 1.x module API (reference: shapely/wkt.py:9 loads, :25 load,
# :42 dumps, :65 dump) — thin veneers over from_wkt/to_wkt with the
# reference's legacy defaults (trim=False, full precision).
# --------------------------------------------------------------------------

def loads(data):
    """reference: shapely/wkt.py:9."""
    return from_wkt(data)


def load(fp):
    """reference: shapely/wkt.py:25."""
    return loads(fp.read())


def dumps(ob, trim: bool = False, rounding_precision: int = -1, **kw):
    """reference: shapely/wkt.py:42 (legacy defaults: no trim, full
    precision — unlike to_wkt's trim=True/6)."""
    return to_wkt(ob, trim=trim, rounding_precision=rounding_precision, **kw)


def dump(ob, fp, **settings):
    """reference: shapely/wkt.py:65."""
    fp.write(dumps(ob, **settings))
