"""Scalar geometry model for the PySpark-native spatial engine.

Semantics pinned to the reference type system (shapely/_geometry.py:42-53:
eight concrete types with stable integer ids; -1 = missing). Coordinates
are float64; XY / XYZ / XYM / XYZM dimensionality is tracked with explicit
``has_z`` / ``has_m`` flags (reference: shapely/predicates.py:46-109).

This module is pure NumPy — no Spark imports — so the same kernels run
inside Arrow-batched pandas UDFs on executors and in local golden tests.
Empty geometries are distinct from missing/None (reference:
shapely/predicates.py:182 is_empty vs :245 is_missing); None is represented
as SQL NULL on the Spark side and Python ``None`` here.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

# Stable type ids (reference: shapely/_geometry.py:42-53 GeometryType enum)
MISSING = -1
POINT = 0
LINESTRING = 1
LINEARRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

TYPE_NAMES = {
    POINT: "POINT",
    LINESTRING: "LINESTRING",
    LINEARRING: "LINEARRING",
    POLYGON: "POLYGON",
    MULTIPOINT: "MULTIPOINT",
    MULTILINESTRING: "MULTILINESTRING",
    MULTIPOLYGON: "MULTIPOLYGON",
    GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
}
NAME_TO_TYPE = {v: k for k, v in TYPE_NAMES.items()}


def _as_coords(coords, ndim_min=2) -> np.ndarray:
    a = np.asarray(coords, dtype=np.float64)
    if a.size == 0:
        return a.reshape(0, max(2, a.shape[1] if a.ndim == 2 else 2))
    if a.ndim == 1:
        a = a.reshape(1, -1)
    if a.shape[1] < ndim_min:
        raise ValueError(f"coordinates need >= {ndim_min} dims, got {a.shape[1]}")
    return a


@dataclass
class Geometry:
    """One geometry scalar.

    - POINT / LINESTRING / LINEARRING: ``coords`` is (n, ndim) float64
    - POLYGON: ``rings`` is a list of (n, ndim) float64 arrays (shell first)
    - MULTI* / GEOMETRYCOLLECTION: ``parts`` is a list of Geometry
    Empty geometry: zero-length coords/rings/parts for its type.
    """

    type_id: int
    coords: np.ndarray | None = None
    rings: list[np.ndarray] | None = None
    parts: list["Geometry"] | None = None
    has_z: bool = False
    has_m: bool = False
    srid: int = 0
    precision: float = 0.0  # grid size set by set_precision; 0 = full double

    def __post_init__(self):
        if self.coords is not None:
            self.coords = _as_coords(self.coords)

    # ---- inspection (reference: shapely/_geometry.py) -------------------
    @property
    def ndim(self) -> int:
        return 2 + (1 if self.has_z else 0) + (1 if self.has_m else 0)

    @property
    def is_empty(self) -> bool:
        if self.type_id == POINT:
            return self.coords is None or len(self.coords) == 0
        if self.type_id in (LINESTRING, LINEARRING):
            return self.coords is None or len(self.coords) == 0
        if self.type_id == POLYGON:
            return not self.rings
        return not self.parts

    def num_coordinates(self) -> int:
        if self.type_id in (POINT, LINESTRING, LINEARRING):
            return 0 if self.coords is None else len(self.coords)
        if self.type_id == POLYGON:
            return sum(len(r) for r in (self.rings or []))
        return sum(p.num_coordinates() for p in (self.parts or []))

    def num_geometries(self) -> int:
        """reference: shapely/_geometry.py:790 get_num_geometries."""
        if self.type_id in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
            return len(self.parts or [])
        return 0 if self.is_empty else 1

    def get_geometry(self, i: int) -> "Geometry | None":
        """reference: shapely/_geometry.py:595 (negative index supported)."""
        n = self.num_geometries()
        if self.type_id < MULTIPOINT:
            return self if i in (0, -1) and not self.is_empty else None
        if -n <= i < n:
            return (self.parts or [])[i]
        return None

    def coord_seqs(self):
        """Yield every raw coordinate array (rings flattened in)."""
        if self.type_id in (POINT, LINESTRING, LINEARRING):
            if self.coords is not None and len(self.coords):
                yield self.coords
        elif self.type_id == POLYGON:
            for r in self.rings or []:
                yield r
        else:
            for p in self.parts or []:
                yield from p.coord_seqs()

    def all_coords(self) -> np.ndarray:
        seqs = list(self.coord_seqs())
        if not seqs:
            return np.zeros((0, self.ndim))
        return np.concatenate(seqs, axis=0)

    # ---- equality (reference: shapely/predicates.py:1081 equals_exact,
    #      :1149 equals_identical) ---------------------------------------
    def equals_identical(self, other: "Geometry") -> bool:
        if other is None or self.type_id != other.type_id:
            return False
        if (self.has_z, self.has_m) != (other.has_z, other.has_m):
            return False
        return self._coords_equal(other, 0.0)

    def equals_exact(self, other: "Geometry", tolerance: float = 0.0) -> bool:
        if other is None or self.type_id != other.type_id:
            return False
        return self._coords_equal(other, tolerance)

    def _coords_equal(self, other: "Geometry", tol: float) -> bool:
        a, b = list(self.coord_seqs()), list(other.coord_seqs())
        if len(a) != len(b):
            return False
        for x, y in zip(a, b):
            if x.shape != y.shape:
                return False
            if x.size and not np.all(
                (np.abs(x - y) <= tol) | (np.isnan(x) & np.isnan(y))
            ):
                return False
        return True

    def __repr__(self):  # debug only
        from .wkt import to_wkt

        try:
            return f"<Geometry {to_wkt(self, rounding_precision=3)}>"
        except Exception:
            return f"<Geometry type={self.type_id}>"


# ---- constructors (reference: shapely/creation.py) -----------------------

def point(x: float, y: float, z: float | None = None) -> Geometry:
    c = [x, y] if z is None else [x, y, z]
    return Geometry(POINT, coords=np.array([c]), has_z=z is not None)


def linestring(coords) -> Geometry:
    return Geometry(LINESTRING, coords=_as_coords(coords))


def linearring(coords) -> Geometry:
    """Closes the ring if not closed (reference: shapely/creation.py:236)."""
    a = _as_coords(coords)
    if len(a) and not np.array_equal(a[0], a[-1]):
        a = np.vstack([a, a[:1]])
    return Geometry(LINEARRING, coords=a)


def polygon(shell, holes=()) -> Geometry:
    sh = linearring(shell).coords
    hs = [linearring(h).coords for h in holes]
    return Geometry(POLYGON, rings=[sh] + hs)


def multipoint(pts) -> Geometry:
    parts = [p if isinstance(p, Geometry) else point(*p) for p in pts]
    return Geometry(MULTIPOINT, parts=parts)


def multilinestring(lines) -> Geometry:
    parts = [l if isinstance(l, Geometry) else linestring(l) for l in lines]
    return Geometry(MULTILINESTRING, parts=parts)


def multipolygon(polys) -> Geometry:
    parts = [p if isinstance(p, Geometry) else polygon(p) for p in polys]
    return Geometry(MULTIPOLYGON, parts=parts)


def geometrycollection(geoms) -> Geometry:
    return Geometry(GEOMETRYCOLLECTION, parts=list(geoms))


def box(xmin: float, ymin: float, xmax: float, ymax: float, ccw: bool = True) -> Geometry:
    """reference: shapely/creation.py:448 (ccw default True)."""
    if ccw:
        ring = [(xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin), (xmax, ymin)]
    else:
        ring = [(xmin, ymin), (xmin, ymax), (xmax, ymax), (xmax, ymin), (xmin, ymin)]
    return Geometry(POLYGON, rings=[np.array(ring, dtype=np.float64)])


def empty(type_id: int = GEOMETRYCOLLECTION) -> Geometry:
    """reference: shapely/creation.py:805."""
    if type_id in (POINT, LINESTRING, LINEARRING):
        return Geometry(type_id, coords=np.zeros((0, 2)))
    if type_id == POLYGON:
        return Geometry(type_id, rings=[])
    return Geometry(type_id, parts=[])


def regular_ngon(cx: float, cy: float, r: float, n: int, theta0: float = 0.0) -> Geometry:
    """Regular n-gon inscribed in circle radius r — vertices ON the circle,
    matching how GEOS buffer() places vertices (quad_segs arcs). Used for
    closed-form oracle checks: area = n*r^2*sin(2*pi/n)/2."""
    ang = theta0 + 2.0 * math.pi * np.arange(n) / n
    ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
    ring = np.vstack([ring, ring[:1]])
    return Geometry(POLYGON, rings=[ring])


def get_x(geom: Geometry | None) -> float:
    """reference: shapely/_geometry.py:274 (point-only; else nan)."""
    if geom is None or geom.type_id != POINT or geom.is_empty:
        return float("nan")
    return float(geom.coords[0, 0])


def get_y(geom: Geometry | None) -> float:
    """reference: shapely/_geometry.py:302."""
    if geom is None or geom.type_id != POINT or geom.is_empty:
        return float("nan")
    return float(geom.coords[0, 1])


def get_z(geom: Geometry | None) -> float:
    """reference: shapely/_geometry.py:330 (nan for 2-D points)."""
    if geom is None or geom.type_id != POINT or geom.is_empty or not geom.has_z:
        return float("nan")
    return float(geom.coords[0, 2])


def get_m(geom: Geometry | None) -> float:
    """reference: shapely/_geometry.py:362 (nan when no m)."""
    if geom is None or geom.type_id != POINT or geom.is_empty or not geom.has_m:
        return float("nan")
    return float(geom.coords[0, 2 + (1 if geom.has_z else 0)])


def is_geometry(obj) -> bool:
    """reference: shapely/predicates.py:245 is_geometry — True for Geometry
    instances (None and everything else → False)."""
    return isinstance(obj, Geometry)


def is_missing(obj) -> bool:
    """reference: shapely/predicates.py:282 — True only for None."""
    return obj is None


def is_valid_input(obj) -> bool:
    """reference: shapely/predicates.py:319 — geometry or None."""
    return obj is None or isinstance(obj, Geometry)


def linearrings(coords, y=None, z=None, indices=None) -> list:
    """reference: shapely/creation.py:236 (same signature: optional
    separate y/z columns) — build rings (auto-closed) from an array of
    coordinate rows. Without indices: one ring from the whole array.
    With indices: rows are grouped by index (must be non-decreasing,
    like the reference's ufunc contract) and one ring is built per
    group. The DataFrame-scale equivalent is the grouped collect in
    spark/parts.py (creation with indices=)."""
    import numpy as np

    a = np.asarray(coords, dtype=np.float64)
    if y is not None:
        cols = [a, np.asarray(y, dtype=np.float64)]
        if z is not None:
            cols.append(np.asarray(z, dtype=np.float64))
        a = np.column_stack(cols)
    if indices is None:
        return [linearring(a)]
    idx = np.asarray(indices)
    out = []
    for u in np.unique(idx):
        out.append(linearring(a[idx == u]))
    return out
