"""Array-style geometry creation under the reference's callable names.

reference: shapely/creation.py — points:54, linestrings:142,
polygons:334, multipoints:500, multilinestrings:585, multipolygons:641,
geometrycollections:696. Same shape contract: coordinate rows (or
separate x/y/z columns) build one geometry, and ``indices=`` groups rows
(non-decreasing group keys, the reference's ufunc contract) to build one
geometry per group. Scalar constructors live in geom.py; the
DataFrame-scale equivalent is the grouped collect in spark/parts.py
(collect_multipoints — creation with indices= over a shuffle).

Unlike the reference these return plain Python lists (this engine has no
object ndarray layer; Spark columns are the array type), and a
single-geometry input returns the geometry itself, not a 0-d array.
"""

from __future__ import annotations

import numpy as np

from .geom import (
    GEOMETRYCOLLECTION,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    Geometry,
    geometrycollection,
    linearring,
    linestring,
    multilinestring,
    multipoint,
    multipolygon,
    point,
    polygon,
)

__all__ = [
    "points", "linestrings", "linearrings", "polygons", "multipoints",
    "multilinestrings", "multipolygons", "geometrycollections",
]

from .geom import linearrings  # noqa: E402,F401  (shared indices= contract)


def _rows(coords, y, z) -> np.ndarray:
    a = np.asarray(coords, dtype=np.float64)
    if y is not None:
        cols = [a, np.asarray(y, dtype=np.float64)]
        if z is not None:
            cols.append(np.asarray(z, dtype=np.float64))
        a = np.column_stack(cols)
    if a.ndim == 1:
        a = a.reshape(1, -1)
    return a


def points(coords, y=None, z=None, indices=None):
    """One POINT per coordinate row. reference: shapely/creation.py:54.
    indices= is accepted for signature parity; points are row-wise so it
    only validates lengths."""
    a = _rows(coords, y, z)
    out = [point(*row[:3]) if len(row) >= 3 else point(row[0], row[1])
           for row in a]
    if indices is not None and len(np.asarray(indices)) != len(out):
        raise ValueError("indices length must match coordinate rows")
    return out[0] if np.asarray(coords).ndim == 1 and y is None else out


def linestrings(coords, y=None, z=None, indices=None):
    """reference: shapely/creation.py:142 — one linestring per index
    group (or one from the whole array)."""
    a = _rows(coords, y, z)
    if indices is None:
        return linestring(a)
    idx = np.asarray(indices)
    return [linestring(a[idx == u]) for u in np.unique(idx)]


def polygons(geometries, holes=None, indices=None):
    """Build polygons from shell rings (+ optional hole rings).
    reference: shapely/creation.py:334 — geometries are rings (LINEARRING
    geometries or coordinate arrays); with indices=, holes are grouped to
    the shell of the same index."""
    def ring_coords(r):
        if r is None:
            return None
        if isinstance(r, Geometry):
            return r.coords
        return np.asarray(r, dtype=np.float64)

    if isinstance(geometries, Geometry) or (
            not isinstance(geometries, (list, tuple)) and np.asarray(geometries, dtype=object).ndim == 0):
        geometries = [geometries]
    shells = [ring_coords(g) for g in geometries]
    if holes is None:
        return [polygon(s) for s in shells]
    if indices is None:
        hs = [ring_coords(h) for h in holes if h is not None]
        if len(shells) != 1:
            raise ValueError("holes without indices need a single shell")
        return [polygon(shells[0], hs)]
    idx = np.asarray(indices)
    grouped: dict[int, list] = {}
    for i, h in zip(idx, holes):
        if h is not None:
            grouped.setdefault(int(i), []).append(ring_coords(h))
    return [polygon(s, grouped.get(i, [])) for i, s in enumerate(shells)]


def _grouped(geometries, indices, build, empty_tid):
    geoms = list(geometries)
    if indices is None:
        return build(geoms)
    idx = np.asarray(indices)
    out = []
    for u in np.unique(idx):
        members = [g for g, i in zip(geoms, idx) if i == u and g is not None]
        out.append(build(members) if members else Geometry(empty_tid, parts=[]))
    return out


def multipoints(geometries, indices=None):
    """reference: shapely/creation.py:500."""
    return _grouped(geometries, indices, multipoint, MULTIPOINT)


def multilinestrings(geometries, indices=None):
    """reference: shapely/creation.py:585."""
    return _grouped(geometries, indices, multilinestring, MULTILINESTRING)


def multipolygons(geometries, indices=None):
    """reference: shapely/creation.py:641."""
    return _grouped(geometries, indices, multipolygon, MULTIPOLYGON)


def geometrycollections(geometries, indices=None):
    """reference: shapely/creation.py:696."""
    return _grouped(geometries, indices, geometrycollection, GEOMETRYCOLLECTION)
