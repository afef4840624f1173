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
    LINEARRING,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
    empty,
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
    """Build polygons from rings. reference: shapely/creation.py:334 —
    without ``indices`` the geometries are outer shells (rings or
    coordinate arrays; a bare (N, 2+) coordinate array is ONE shell) and
    ``holes`` attaches hole rings per shell. With ``indices`` the holes
    are expected INSIDE ``geometries``: the first ring per index is the
    shell and subsequent rings of that index are its holes; ``holes``
    must not be combined with ``indices`` and missing indices raise
    ValueError (reference docstring lines 344-355)."""
    def ring_coords(r):
        if r is None:
            return None
        if isinstance(r, Geometry):
            return r.coords
        return np.asarray(r, dtype=np.float64)

    if isinstance(geometries, Geometry):
        geometries = [geometries]
        single = indices is None
    else:
        try:
            arr = np.asarray(geometries, dtype=np.float64)
        except (TypeError, ValueError):
            arr = None
        if arr is not None and arr.ndim == 2:
            # a bare coordinate array is a single shell
            # (reference example: polygons([[0,0],[0,10],...]) → 1 POLYGON)
            geometries = [arr]
            single = indices is None
        else:
            geometries = list(geometries)
            single = False

    if indices is not None:
        if holes is not None:
            raise ValueError(
                "holes must not be combined with indices (reference "
                "shapely/creation.py:346)")
        idx = _checked_indices(indices, len(geometries))
        for g in geometries:
            if isinstance(g, Geometry) and g.type_id not in (
                    LINESTRING, LINEARRING):
                raise TypeError(
                    "polygons with indices= takes ring geometries "
                    "(reference test_creation_indices.test_incompatible_types)")
        grouped: dict[int, list] = {}
        for i, g in zip(idx, geometries):
            # None rings are skipped inside their group; a group whose
            # rings are ALL None yields an empty polygon (reference
            # test_creation_indices.test_polygons: [None, ring] →
            # [POLYGON EMPTY, poly])
            grouped.setdefault(int(i), [])
            if g is not None:
                grouped[int(i)].append(ring_coords(g))
        out = []
        for u in sorted(grouped):
            rings = grouped[u]
            out.append(polygon(rings[0], rings[1:]) if rings
                       else empty(POLYGON))
        return out

    shells = [ring_coords(g) for g in geometries]
    if holes is None:
        out = [polygon(s) for s in shells]
        return out[0] if single else out
    if len(shells) == 1:
        hs = [ring_coords(h) for h in holes if h is not None]
        p = polygon(shells[0], hs)
        return p if single else [p]
    if len(holes) != len(shells):
        raise ValueError(
            "holes must be one list of hole rings per shell")
    return [
        polygon(s, [ring_coords(h) for h in hs_i if h is not None])
        for s, hs_i in zip(shells, holes)
    ]


def _checked_indices(indices, n_geoms: int) -> np.ndarray:
    """Validate an ``indices=`` array per the reference ufunc contract:
    same length as the geometries, non-decreasing, and no gaps (missing
    indices raise ValueError — reference shapely/creation.py:353)."""
    idx = np.asarray(indices)
    if idx.dtype == object or not np.issubdtype(idx.dtype, np.number):
        raise TypeError("indices must be integers")
    if len(idx) != n_geoms:
        raise ValueError("indices length must match geometries")
    if len(idx) and int(idx.min()) < 0:
        raise ValueError("indices must be non-negative")
    if len(idx) and np.any(np.diff(idx) < 0):
        raise ValueError("indices should be in increasing order")
    if len(idx):
        present = np.unique(idx)
        expected = np.arange(int(present[0]), int(present[-1]) + 1)
        if len(present) != len(expected) or np.any(present != expected):
            raise ValueError("missing indices in indices array")
    return idx


def _grouped(geometries, indices, build, empty_tid, part_tids=None):
    geoms = list(geometries)
    if part_tids is not None:
        for g in geoms:
            if isinstance(g, Geometry) and g.type_id not in part_tids:
                raise TypeError(
                    f"geometry type {g.type_id} is not a valid part here "
                    "(reference test_creation_indices.test_incompatible_types)")
    if indices is None:
        return build(geoms)
    idx = _checked_indices(indices, len(geoms))
    out = []
    for u in np.unique(idx):
        members = [g for g, i in zip(geoms, idx) if i == u and g is not None]
        out.append(build(members) if members else Geometry(empty_tid, parts=[]))
    return out


def multipoints(geometries, indices=None):
    """reference: shapely/creation.py:500."""
    return _grouped(geometries, indices, multipoint, MULTIPOINT,
                    part_tids={POINT})


def multilinestrings(geometries, indices=None):
    """reference: shapely/creation.py:585."""
    return _grouped(geometries, indices, multilinestring, MULTILINESTRING,
                    part_tids={LINESTRING, LINEARRING})


def multipolygons(geometries, indices=None):
    """reference: shapely/creation.py:641."""
    return _grouped(geometries, indices, multipolygon, MULTIPOLYGON,
                    part_tids={POLYGON})


def geometrycollections(geometries, indices=None):
    """reference: shapely/creation.py:696 — parts may be any type."""
    return _grouped(geometries, indices, geometrycollection, GEOMETRYCOLLECTION)
