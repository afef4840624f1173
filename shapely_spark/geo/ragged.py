"""Scalar GeoArrow ragged-array interchange (reference:
shapely/_ragged_array.py:159 to_ragged_array, :417 from_ragged_array).

Same layout contract as the reference: one contiguous float64 coordinate
array plus 0–3 offset arrays (Apache Arrow variable-size-list offsets per
the GeoArrow spec), int32 offsets when the counts fit. Missing/empty
points are NaN rows; missing/empty list-typed geometries are zero-length
slices (equal consecutive offsets). Mixed single/multi inputs of one
family promote to the multi type; other mixes raise — exactly the
reference's dispatch (reference lines 287-328).

The DataFrame-scale twin (flat SQL-typed columns a parquet scan can prune)
is spark/ragged.py wkb_to_ragged / ragged_to_wkb; these callables are the
reference-named scalar entry points, returning plain lists like
creation.py.
"""

from __future__ import annotations

import numpy as np

from .geom import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
    multilinestring,
    multipoint,
    multipolygon,
)
from .inspection import GeometryType

__all__ = ["to_ragged_array", "from_ragged_array"]


def _offsets(counts):
    off = np.insert(np.cumsum(counts, dtype=np.int64), 0, 0)
    if off[-1] <= np.iinfo(np.int32).max:
        off = off.astype(np.int32)
    return off


def _xy(g: Geometry, width: int) -> np.ndarray:
    """All coordinates of g padded/truncated to `width` columns (NaN Z/M
    when absent, matching get_coordinates semantics)."""
    c = g.all_coords()
    out = np.full((len(c), width), np.nan)
    w = min(width, c.shape[1])
    out[:, :w] = c[:, :w]
    return out


def _width(geometries, include_z, include_m) -> tuple[int, bool, bool]:
    live = [g for g in geometries if g is not None and not g.is_empty]
    if include_z is None:
        include_z = any(g.has_z for g in live)
    if include_m is None:
        include_m = any(g.has_m for g in live)
    return 2 + bool(include_z) + bool(include_m), include_z, include_m


def _lines_of(g):
    if g is None or g.is_empty:
        return []
    return list(g.parts or []) if g.type_id == MULTILINESTRING else [g]


def _polys_of(g):
    if g is None or g.is_empty:
        return []
    return list(g.parts or []) if g.type_id == MULTIPOLYGON else [g]


def to_ragged_array(geometries, include_z=None, include_m=None):
    """reference: shapely/_ragged_array.py:159 — returns
    (GeometryType, coords, offsets-tuple)."""
    geoms = list(geometries)
    width, _, _ = _width(geoms, include_z, include_m)
    types = {g.type_id for g in geoms if g is not None}
    types.discard(None)
    types = {t for t in types if t >= 0}

    def fam(singles, multi):
        return types and types <= {singles, multi}

    if types <= {POINT}:
        rows = [(_xy(g, width)[0] if (g is not None and not g.is_empty)
                 else np.full(width, np.nan)) for g in geoms]
        coords = (np.asarray(rows) if rows
                  else np.zeros((0, width)))
        return GeometryType.POINT, coords, ()

    if types == {LINESTRING}:
        blocks = [_xy(g, width) if g is not None and not g.is_empty
                  else np.zeros((0, width)) for g in geoms]
        coords = np.concatenate(blocks) if blocks else np.zeros((0, width))
        return (GeometryType.LINESTRING, coords,
                (_offsets([len(b) for b in blocks]),))

    if fam(POINT, MULTIPOINT):
        pts_per_geom, rows = [], []
        for g in geoms:
            if g is None or g.is_empty:
                pts_per_geom.append(0)
            elif g.type_id == POINT:
                pts_per_geom.append(1)
                rows.append(_xy(g, width))
            else:
                parts = g.parts or []
                pts_per_geom.append(len(parts))
                rows.extend(_xy(p, width) for p in parts)
        coords = np.concatenate(rows) if rows else np.zeros((0, width))
        return GeometryType.MULTIPOINT, coords, (_offsets(pts_per_geom),)

    if fam(LINESTRING, MULTILINESTRING):
        lines_per_geom, blocks = [], []
        for g in geoms:
            lines = _lines_of(g)
            lines_per_geom.append(len(lines))
            blocks.extend(_xy(ln, width) for ln in lines)
        coords = np.concatenate(blocks) if blocks else np.zeros((0, width))
        return (GeometryType.MULTILINESTRING, coords,
                (_offsets([len(b) for b in blocks]),
                 _offsets(lines_per_geom)))

    if types == {POLYGON}:
        rings_per_geom, blocks = [], []
        for g in geoms:
            rings = [] if g is None or g.is_empty else (g.rings or [])
            rings_per_geom.append(len(rings))
            for r in rings:
                a = np.asarray(r, dtype=np.float64)
                out = np.full((len(a), width), np.nan)
                out[:, :min(width, a.shape[1])] = a[:, :min(width, a.shape[1])]
                blocks.append(out)
        coords = np.concatenate(blocks) if blocks else np.zeros((0, width))
        return (GeometryType.POLYGON, coords,
                (_offsets([len(b) for b in blocks]),
                 _offsets(rings_per_geom)))

    if fam(POLYGON, MULTIPOLYGON):
        polys_per_geom, rings_per_poly, blocks = [], [], []
        for g in geoms:
            polys = _polys_of(g)
            polys_per_geom.append(len(polys))
            for p in polys:
                rings = p.rings or []
                rings_per_poly.append(len(rings))
                for r in rings:
                    a = np.asarray(r, dtype=np.float64)
                    out = np.full((len(a), width), np.nan)
                    w = min(width, a.shape[1])
                    out[:, :w] = a[:, :w]
                    blocks.append(out)
        coords = np.concatenate(blocks) if blocks else np.zeros((0, width))
        return (GeometryType.MULTIPOLYGON, coords,
                (_offsets([len(b) for b in blocks]),
                 _offsets(rings_per_poly),
                 _offsets(polys_per_geom)))

    names = sorted(GeometryType(t).name for t in types)
    raise ValueError(f"Geometry type combination is not supported ({names})")


def _slices(coords, off):
    off = np.asarray(off, dtype=np.int64)
    return [coords[off[i]:off[i + 1]] for i in range(len(off) - 1)]


def from_ragged_array(geometry_type, coords, offsets=None):
    """reference: shapely/_ragged_array.py:417 — rebuild a list of
    geometries from (type, coords, offsets)."""
    typ = GeometryType(geometry_type)
    coords = np.asarray(coords, dtype=np.float64)
    has_z = coords.shape[1] >= 3

    def line_from(rows):
        if len(rows) == 0:
            return Geometry(LINESTRING, coords=np.zeros((0, 2)))
        return Geometry(LINESTRING, coords=np.asarray(rows), has_z=has_z)

    if typ == GeometryType.POINT:
        if offsets:
            raise ValueError(
                "'offsets' should not be provided for geometry type Point")
        out = []
        for row in coords:
            if np.isnan(row).all():
                out.append(Geometry(POINT, coords=np.zeros((0, 2))))
            else:
                out.append(Geometry(POINT, coords=row.reshape(1, -1),
                                    has_z=has_z))
        return out

    if offsets is None:
        raise ValueError(
            "'offsets' must be provided for any geometry type except for Point")

    if typ == GeometryType.LINESTRING:
        return [line_from(s) for s in _slices(coords, offsets[0])]

    if typ == GeometryType.MULTIPOINT:
        out = []
        for s in _slices(coords, offsets[0]):
            if len(s) == 0:
                out.append(Geometry(MULTIPOINT, parts=[]))
            else:
                out.append(multipoint(
                    [Geometry(POINT, coords=r.reshape(1, -1), has_z=has_z)
                     for r in s]))
        return out

    if typ == GeometryType.MULTILINESTRING:
        lines = [line_from(s) for s in _slices(coords, offsets[0])]
        out = []
        off2 = np.asarray(offsets[1], dtype=np.int64)
        for i in range(len(off2) - 1):
            grp = lines[off2[i]:off2[i + 1]]
            out.append(multilinestring(grp) if grp
                       else Geometry(MULTILINESTRING, parts=[]))
        return out

    rings = [np.asarray(s) for s in _slices(coords, offsets[0])]
    if typ == GeometryType.POLYGON:
        out = []
        off2 = np.asarray(offsets[1], dtype=np.int64)
        for i in range(len(off2) - 1):
            grp = rings[off2[i]:off2[i + 1]]
            if not grp:
                out.append(Geometry(POLYGON, rings=[]))
            else:
                out.append(Geometry(POLYGON, rings=grp, has_z=has_z))
        return out

    if typ == GeometryType.MULTIPOLYGON:
        off2 = np.asarray(offsets[1], dtype=np.int64)
        polys = []
        for i in range(len(off2) - 1):
            grp = rings[off2[i]:off2[i + 1]]
            polys.append(Geometry(POLYGON, rings=grp, has_z=has_z)
                         if grp else Geometry(POLYGON, rings=[]))
        off3 = np.asarray(offsets[2], dtype=np.int64)
        out = []
        for i in range(len(off3) - 1):
            grp = polys[off3[i]:off3[i + 1]]
            out.append(multipolygon(grp) if grp
                       else Geometry(MULTIPOLYGON, parts=[]))
        return out

    raise ValueError(f"Geometry type {typ.name} is not supported")
