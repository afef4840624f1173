"""Geometry inspection functions under the reference's callable names.

reference: shapely/_geometry.py (get_type_id:60, get_dimensions:100,
get_coordinate_dimension:136, get_srid:207, set_srid:239, get_point:400,
get_num_points:445, get_exterior_ring:482, get_interior_ring:510,
get_num_interior_rings:552, get_num_geometries:790, get_parts / get_rings,
get_precision:824), shapely/coordinates.py (count_coordinates:289,
get_coordinates:324, transform:28) and shapely/predicates.py module
functions that mirror Geometry attributes (has_z, has_m, is_empty,
equals_exact:1081, equals_identical:1149).

The engine's scalar Geometry already carries the state (geom.py); these
are the module-level entry points a caller porting reference code by name
expects. DataFrame-scale equivalents live in spark/parts.py
(get_parts_df / get_coordinates_df) and spark/geometry_cols.py.
"""

from __future__ import annotations

import math
from dataclasses import replace
from enum import IntEnum

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
    linearring,
    point as make_point,
)


class GeometryType(IntEnum):
    """reference: shapely/_geometry.py:42 — the GEOS type-id enum."""

    MISSING = -1
    POINT = 0
    LINESTRING = 1
    LINEARRING = 2
    POLYGON = 3
    MULTIPOINT = 4
    MULTILINESTRING = 5
    MULTIPOLYGON = 6
    GEOMETRYCOLLECTION = 7


def get_type_id(geometry: Geometry | None) -> int:
    """reference: shapely/_geometry.py:60 (None -> -1)."""
    return -1 if geometry is None else geometry.type_id


def get_dimensions(geometry: Geometry | None) -> int:
    """Inherent (topological) dimension; empty collections and None -> -1.
    reference: shapely/_geometry.py:100."""
    if geometry is None:
        return -1
    tid = geometry.type_id
    if tid in (POINT, MULTIPOINT):
        return 0
    if tid in (LINESTRING, LINEARRING, MULTILINESTRING):
        return 1
    if tid in (POLYGON, MULTIPOLYGON):
        return 2
    parts = geometry.parts or []
    if not parts:
        return -1
    return max(get_dimensions(p) for p in parts)


def get_coordinate_dimension(geometry: Geometry | None) -> int:
    """2 for XY, 3 for XYZ/XYM, 4 for XYZM, -1 for None.
    reference: shapely/_geometry.py:136."""
    if geometry is None:
        return -1
    return 2 + (1 if geometry.has_z else 0) + (1 if geometry.has_m else 0)


def get_srid(geometry: Geometry | None) -> int:
    """reference: shapely/_geometry.py:207 (None -> -1, unset -> 0)."""
    return -1 if geometry is None else geometry.srid


def set_srid(geometry: Geometry | None, srid: int) -> Geometry | None:
    """reference: shapely/_geometry.py:239 — returns a geometry carrying
    the SRID (no CRS semantics, per SURVEY §1.2)."""
    if geometry is None:
        return None
    return replace(geometry, srid=int(srid))


def get_precision(geometry: Geometry | None) -> float:
    """Grid size set by set_precision; 0.0 if never set, NaN for None.
    reference: shapely/_geometry.py:824."""
    return math.nan if geometry is None else geometry.precision


def get_num_coordinates(geometry: Geometry | None) -> int:
    """reference: shapely/_geometry.py get_num_coordinates (None -> 0)."""
    return 0 if geometry is None else geometry.num_coordinates()


def count_coordinates(geometry) -> int:
    """Total coordinate count over one geometry or a sequence.
    reference: shapely/coordinates.py:289."""
    if geometry is None:
        return 0
    if isinstance(geometry, Geometry):
        return geometry.num_coordinates()
    return sum(0 if g is None else g.num_coordinates() for g in geometry)


def get_num_geometries(geometry: Geometry | None) -> int:
    """reference: shapely/_geometry.py:790 (None -> 0)."""
    return 0 if geometry is None else geometry.num_geometries()


def get_geometry(geometry: Geometry | None, index: int) -> Geometry | None:
    """reference: shapely/_geometry.py:595 (negative index supported)."""
    return None if geometry is None else geometry.get_geometry(index)


def get_num_points(geometry: Geometry | None) -> int:
    """Points in a linestring/linearring; 0 for anything else.
    reference: shapely/_geometry.py:445."""
    if geometry is None or geometry.type_id not in (LINESTRING, LINEARRING):
        return 0
    return 0 if geometry.coords is None else len(geometry.coords)


def get_point(geometry: Geometry | None, index: int) -> Geometry | None:
    """Nth point of a linestring/linearring (negative index ok), None
    otherwise. reference: shapely/_geometry.py:400."""
    n = get_num_points(geometry)
    if n == 0 or not (-n <= index < n):
        return None
    c = geometry.coords[index]
    out = Geometry(POINT, coords=c.reshape(1, -1), has_z=geometry.has_z,
                   has_m=geometry.has_m)
    return out


def get_num_interior_rings(geometry: Geometry | None) -> int:
    """reference: shapely/_geometry.py:552 (non-polygons -> 0)."""
    if geometry is None or geometry.type_id != POLYGON:
        return 0
    return max(0, len(geometry.rings or []) - 1)


def get_exterior_ring(geometry: Geometry | None) -> Geometry | None:
    """Shell as LINEARRING; None for non-polygons.
    reference: shapely/_geometry.py:482."""
    if geometry is None or geometry.type_id != POLYGON or not geometry.rings:
        return None
    return Geometry(LINEARRING, coords=np.asarray(geometry.rings[0]),
                    has_z=geometry.has_z, has_m=geometry.has_m)


def get_interior_ring(geometry: Geometry | None, index: int) -> Geometry | None:
    """Nth hole as LINEARRING (negative index ok); None out of range.
    reference: shapely/_geometry.py:510."""
    n = get_num_interior_rings(geometry)
    if n == 0 or not (-n <= index < n):
        return None
    idx = index + 1 if index >= 0 else len(geometry.rings) + index
    return Geometry(LINEARRING, coords=np.asarray(geometry.rings[idx]),
                    has_z=geometry.has_z, has_m=geometry.has_m)


def get_parts(geometry, return_index: bool = False):
    """Parts of (a sequence of) multi-geometries, exploded one level.
    reference: shapely/_geometry.py get_parts — single geometries yield
    themselves; None/empty yield nothing. The DataFrame-scale twin is
    spark/parts.py:28 get_parts_df."""
    geoms = [geometry] if geometry is None or isinstance(geometry, Geometry) else list(geometry)
    parts, idx = [], []
    for i, g in enumerate(geoms):
        if g is None or g.is_empty:
            continue
        if g.type_id in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
            for p in g.parts or []:
                parts.append(p)
                idx.append(i)
        else:
            parts.append(g)
            idx.append(i)
    if return_index:
        return parts, np.asarray(idx, dtype=np.int64)
    return parts


def get_rings(geometry, return_index: bool = False):
    """All rings of (a sequence of) polygons as LINEARRINGs (shell first).
    reference: shapely/_geometry.py get_rings."""
    geoms = [geometry] if geometry is None or isinstance(geometry, Geometry) else list(geometry)
    rings, idx = [], []
    for i, g in enumerate(geoms):
        if g is None or g.type_id != POLYGON:
            continue
        for r in g.rings or []:
            rings.append(linearring(np.asarray(r)))
            idx.append(i)
    if return_index:
        return rings, np.asarray(idx, dtype=np.int64)
    return rings


def get_coordinates(geometry, include_z: bool = False,
                    return_index: bool = False, *, include_m: bool = False):
    """Flattened (n, 2/3/4) float64 coordinate array over one geometry or
    a sequence; absent Z/M filled with NaN when requested.
    reference: shapely/coordinates.py:324. DataFrame twin:
    spark/parts.py:54 get_coordinates_df."""
    geoms = [geometry] if geometry is None or isinstance(geometry, Geometry) else list(geometry)
    width = 2 + (1 if include_z else 0) + (1 if include_m else 0)
    blocks, idx = [], []
    for i, g in enumerate(geoms):
        if g is None:
            continue
        c = g.all_coords()
        if not len(c):
            continue
        out = np.full((len(c), width), np.nan)
        out[:, :2] = c[:, :2]
        col = 2
        if include_z:
            if g.has_z:
                out[:, col] = c[:, 2]
            col += 1
        if include_m:
            if g.has_m:
                out[:, col] = c[:, 2 + (1 if g.has_z else 0)]
        blocks.append(out)
        idx.append(np.full(len(c), i, dtype=np.int64))
    coords = np.concatenate(blocks) if blocks else np.zeros((0, width))
    if return_index:
        return coords, (np.concatenate(idx) if idx else np.zeros(0, np.int64))
    return coords


def transform(geometry, transformation, include_z: bool | None = False, *,
              interleaved: bool = True):
    """Apply a coordinate transformation to one geometry or a sequence
    (count-preserving per sequence). reference: shapely/coordinates.py:28;
    per-coordseq variant: constructive.transform_coordseq."""
    from .constructive import force_2d, transform_coordseq

    def one(g):
        if g is None:
            return None
        out = transform_coordseq(g, transformation, include_z=include_z,
                                 interleaved=interleaved)
        if include_z is False and g.has_z:
            out = force_2d(out)
        return out

    if geometry is None or isinstance(geometry, Geometry):
        return one(geometry)
    return [one(g) for g in geometry]


# --- predicate module functions mirroring Geometry attributes -------------

def has_z(geometry: Geometry | None) -> bool:
    """reference: shapely/predicates.py has_z (None -> False)."""
    return False if geometry is None else geometry.has_z


def has_m(geometry: Geometry | None) -> bool:
    """reference: shapely/predicates.py has_m (None -> False)."""
    return False if geometry is None else geometry.has_m


def is_empty(geometry: Geometry | None) -> bool:
    """reference: shapely/predicates.py is_empty (None -> False)."""
    return False if geometry is None else geometry.is_empty


def equals_exact(a: Geometry | None, b: Geometry | None,
                 tolerance: float = 0.0) -> bool:
    """reference: shapely/predicates.py:1081 — same structure, coords
    within tolerance (no normalization)."""
    if a is None or b is None:
        return False
    return a.equals_exact(b, tolerance)


def equals_identical(a: Geometry | None, b: Geometry | None) -> bool:
    """reference: shapely/predicates.py:1149 — identical structure,
    coords, and dimensionality."""
    if a is None or b is None:
        return False
    return a.equals_identical(b)
