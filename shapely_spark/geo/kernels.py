"""NumPy geometry kernels — the engine's compute core.

Each kernel reimplements the *semantics* of the corresponding reference
operation (cited file:line) from scratch as vectorized NumPy; these run
inside Arrow-batched pandas UDFs on Spark executors and stand alone as the
single-node oracle in tests. No GEOS, no shapely import.

Hot path design (reference: shapely/predicates.py:1311 contains_xy /
:1367 intersects_xy): the point side stays as bare float64 (x, y) arrays
end-to-end — geometry objects are only materialized for the (small,
broadcast) polygon side, which is "prepared" once per executor
(reference prepared-geometry semantics: shapely/creation.py:735 prepare).
"""

from __future__ import annotations

import math

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
    point,
    polygon as make_polygon,
)

EARTH_RADIUS_KM = 6371.0088

# ---------------------------------------------------------------------------
# Bounds / measurement  (reference: shapely/measurement.py)
# ---------------------------------------------------------------------------

def bounds(geom: Geometry | None) -> np.ndarray:
    """(minx, miny, maxx, maxy); NaN for empty/None.
    reference: shapely/measurement.py:85 (ufunc '()->(4)' src/ufuncs.c:2304)."""
    if geom is None or geom.is_empty:
        return np.array([np.nan] * 4)
    c = geom.all_coords()
    return np.array([c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max()])


def total_bounds(geoms) -> np.ndarray:
    """reference: shapely/measurement.py:114 — reduce of bounds."""
    bs = np.array([bounds(g) for g in geoms if g is not None], dtype=np.float64)
    if bs.size == 0 or np.all(np.isnan(bs)):
        return np.array([np.nan] * 4)
    return np.array([
        np.nanmin(bs[:, 0]), np.nanmin(bs[:, 1]),
        np.nanmax(bs[:, 2]), np.nanmax(bs[:, 3]),
    ])


def signed_ring_area(ring: np.ndarray) -> float:
    """Shoelace; CCW positive. reference: shapely/algorithms/cga.py:8.
    Coordinates are translated to the first vertex before summing —
    mathematically identical, avoids catastrophic cancellation when the
    ring is far from the origin (lon/lat polygons always are)."""
    if len(ring) < 3:
        return 0.0
    x = ring[:, 0] - ring[0, 0]
    y = ring[:, 1] - ring[0, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def area(geom: Geometry | None) -> float:
    """reference: shapely/measurement.py:24 (0.0 for non-areal/empty/None
    matches GEOSArea; NaN for None in reference — we return nan for None)."""
    if geom is None:
        return float("nan")
    tid = geom.type_id
    if tid == POLYGON:
        if not geom.rings:
            return 0.0
        a = abs(signed_ring_area(geom.rings[0]))
        for h in geom.rings[1:]:
            a -= abs(signed_ring_area(h))
        return a
    if tid in (MULTIPOLYGON, GEOMETRYCOLLECTION):
        return sum(area(p) for p in (geom.parts or []))
    return 0.0


def length(geom: Geometry | None) -> float:
    """reference: shapely/measurement.py:167 — sum of segment norms.
    For polygons GEOS returns the ring perimeter sum."""
    if geom is None:
        return float("nan")
    tid = geom.type_id
    if tid in (LINESTRING, LINEARRING):
        c = geom.coords
        if c is None or len(c) < 2:
            return 0.0
        d = np.diff(c[:, :2], axis=0)
        return float(np.sqrt((d**2).sum(axis=1)).sum())
    if tid == POLYGON:
        total = 0.0
        for r in geom.rings or []:
            d = np.diff(np.asarray(r)[:, :2], axis=0)
            total += float(np.sqrt((d**2).sum(axis=1)).sum())
        return total
    if tid in (MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        return sum(length(p) for p in (geom.parts or []))
    return 0.0


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km, vectorized (engine addition for kNN
    refine over web-page coordinates; no reference analog — reference is
    planar, measurement.py:54)."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(v, dtype=np.float64)) for v in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


# ---------------------------------------------------------------------------
# Point-segment distance machinery
# ---------------------------------------------------------------------------

def _seg_point_dist2(px, py, x1, y1, x2, y2):
    """Squared distance from points (px,py) to segments, fully broadcast."""
    dx, dy = x2 - x1, y2 - y1
    seg_len2 = dx * dx + dy * dy
    # parameter of projection clamped to [0,1]; guard zero-length segments
    t = np.where(seg_len2 > 0, ((px - x1) * dx + (py - y1) * dy) / np.where(seg_len2 > 0, seg_len2, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = x1 + t * dx, y1 + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


def _edges(geom: Geometry):
    """All boundary segments of a geometry as (x1,y1,x2,y2) float64 arrays."""
    segs = []
    for seq in geom.coord_seqs():
        c = np.asarray(seq)[:, :2]
        if len(c) >= 2:
            segs.append(np.column_stack([c[:-1], c[1:]]))
    if not segs:
        return np.zeros((0, 4))
    return np.concatenate(segs, axis=0)


def distance(a: Geometry | None, b: Geometry | None) -> float:
    """Cartesian min distance. reference: shapely/measurement.py:54.
    Supported: any combination of point/line/polygon (incl. multis);
    0.0 when interiors overlap; nan for None/empty (GEOS raises on empty —
    the reference returns nan via ufunc; we return nan)."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return float("nan")
    # interiors overlap → 0
    if intersects(a, b):
        return 0.0
    ea, eb = _edges(a), _edges(b)
    ca, cb = a.all_coords()[:, :2], b.all_coords()[:, :2]
    best = np.inf
    if len(eb):
        d2 = _seg_point_dist2(ca[:, 0:1], ca[:, 1:2], eb[None, :, 0], eb[None, :, 1], eb[None, :, 2], eb[None, :, 3])
        best = min(best, float(d2.min()))
    if len(ea):
        d2 = _seg_point_dist2(cb[:, 0:1], cb[:, 1:2], ea[None, :, 0], ea[None, :, 1], ea[None, :, 2], ea[None, :, 3])
        best = min(best, float(d2.min()))
    if not len(ea) and not len(eb):
        dx = ca[:, None, 0] - cb[None, :, 0]
        dy = ca[:, None, 1] - cb[None, :, 1]
        best = float((dx * dx + dy * dy).min())
    return math.sqrt(best)


# ---------------------------------------------------------------------------
# Point-in-ring / point-in-polygon — the join refine workhorse
# ---------------------------------------------------------------------------

EXTERIOR, BOUNDARY, INTERIOR = 0, 1, 2


def points_on_segments(px, py, segs, eps=0.0):
    """Boolean: is each point exactly on any segment (collinear + in range)."""
    if len(segs) == 0:
        return np.zeros(np.shape(px), dtype=bool)
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    within_x = (px >= np.minimum(x1, x2) - eps) & (px <= np.maximum(x1, x2) + eps)
    within_y = (py >= np.minimum(y1, y2) - eps) & (py <= np.maximum(y1, y2) + eps)
    return np.any((np.abs(cross) <= eps) & within_x & within_y, axis=1)


def points_in_rings_class(px, py, rings) -> np.ndarray:
    """Classify points vs a polygon's ring set: 0 exterior / 1 boundary /
    2 interior. Even-odd ray casting (half-open rule) + exact on-boundary
    test; shell/holes handled by parity so holed polygons work directly.
    Semantics: DE-9IM interior/boundary/exterior split used by
    contains (predicates.py:556 'T*****FF*') vs covers (:729).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    out = np.zeros(px.shape, dtype=np.int8)
    if not rings:
        return out
    segs_all = []
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        c = np.asarray(ring)[:, :2]
        if len(c) < 4:
            # degenerate ring: boundary-only
            if len(c) >= 2:
                segs_all.append(np.column_stack([c[:-1], c[1:]]))
            continue
        x1, y1 = c[:-1, 0], c[:-1, 1]
        x2, y2 = c[1:, 0], c[1:, 1]
        segs_all.append(np.column_stack([c[:-1], c[1:]]))
        # half-open crossing rule: count edges where (y1 > py) != (y2 > py)
        PX, PY = px[:, None], py[:, None]
        cond = (y1[None, :] > PY) != (y2[None, :] > PY)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[None, :] + (PY - y1[None, :]) * (x2[None, :] - x1[None, :]) / (y2[None, :] - y1[None, :])
        crossings = np.sum(cond & (PX < xint), axis=1)
        inside ^= (crossings % 2).astype(bool)
    out[inside] = INTERIOR
    if segs_all:
        onb = points_on_segments(px, py, np.concatenate(segs_all, axis=0))
        out[onb] = BOUNDARY
    return out


class PreparedPolygons:
    """Executor-local prepared polygon layer (reference semantics:
    shapely/creation.py:735 prepare — a cached edge structure reused across
    many predicate calls; here also STRtree-style bbox prune,
    shapely/strtree.py:30).

    Holds N polygons (polygon or multipolygon Geometry); classifies large
    point batches against each. Built once per executor from a broadcast
    variable — never per row (SURVEY.md §2.2).
    """

    def __init__(self, geoms: list[Geometry | None]):
        self.geoms = geoms
        self.ring_sets: list[list[np.ndarray]] = []
        self.bboxes = np.full((len(geoms), 4), np.nan)
        for i, g in enumerate(geoms):
            rings: list[np.ndarray] = []
            if g is not None and not g.is_empty:
                if g.type_id == POLYGON:
                    rings = [np.asarray(r)[:, :2] for r in g.rings]
                elif g.type_id in (MULTIPOLYGON, GEOMETRYCOLLECTION):
                    for p in g.parts or []:
                        if p.type_id == POLYGON:
                            rings.extend(np.asarray(r)[:, :2] for r in p.rings)
                self.bboxes[i] = bounds(g)
            self.ring_sets.append(rings)

    def classify(self, idx: int, px, py) -> np.ndarray:
        """0/1/2 classification of points vs polygon idx, bbox-pruned."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        out = np.zeros(px.shape, dtype=np.int8)
        bb = self.bboxes[idx]
        if np.isnan(bb[0]):
            return out
        mask = (px >= bb[0]) & (px <= bb[2]) & (py >= bb[1]) & (py <= bb[3])
        if mask.any():
            out[mask] = points_in_rings_class(px[mask], py[mask], self.ring_sets[idx])
        return out

    def test(self, idx: int, px, py, predicate: str) -> np.ndarray:
        cls = self.classify(idx, px, py)
        if predicate in ("intersects", "covers", "covered_by"):
            return cls >= BOUNDARY
        if predicate in ("contains", "within", "contains_properly"):
            return cls == INTERIOR
        if predicate == "touches":
            return cls == BOUNDARY
        if predicate == "disjoint":
            return cls == EXTERIOR
        raise ValueError(f"unsupported point-vs-polygon predicate {predicate!r}")


class RaggedPolygonLayer:
    """Whole-layer prepared structure for region-heterogeneous point
    batches: all regions' edges concatenated into flat arrays with
    per-region offsets, so classify_many vectorizes the ray-cast across
    EVERY (point, its-region) pair in one shot (the north-star
    'vectorized ray-casting' form; reference per-geometry analog:
    shapely/creation.py:735 prepare).

    Why it exists: PreparedPolygons.classify costs ~20 µs of Python
    dispatch per distinct region per batch. At a 100k-region layer each
    Arrow batch holds ~1 candidate per region, so the per-group path
    degenerates to per-row Python. Here the work per batch is a fixed
    handful of NumPy ops over the expanded (candidate, edge) pairs —
    identical FLOPs, no per-region dispatch.

    Built ONCE (driver side, then broadcast as plain arrays): workers
    pay zero per-region construction. Semantics are bit-identical to
    points_in_rings_class: half-open even-odd crossing parity XOR-ed
    across rings == parity of total crossings over all non-degenerate
    ring edges; exact (eps=0) on-segment boundary test overrides;
    degenerate rings (<4 pts) contribute boundary segments only."""

    __slots__ = ("n", "bbox", "cross_start", "cross_seg",
                 "bnd_start", "bnd_seg")

    def __init__(self, geoms_by_id: dict[int, "Geometry"]):
        n = (max(geoms_by_id) + 1) if geoms_by_id else 0
        self.n = n
        self.bbox = np.full((n, 4), np.nan)
        cross_cnt = np.zeros(n, dtype=np.int64)
        bnd_cnt = np.zeros(n, dtype=np.int64)
        cross_parts: list[np.ndarray] = []
        bnd_parts: list[np.ndarray] = []
        for rid in sorted(geoms_by_id):
            g = geoms_by_id[rid]
            rings: list[np.ndarray] = []
            if g is not None and not g.is_empty:
                if g.type_id == POLYGON:
                    rings = [np.asarray(r)[:, :2] for r in g.rings]
                elif g.type_id in (MULTIPOLYGON, GEOMETRYCOLLECTION):
                    for p in g.parts or []:
                        if p.type_id == POLYGON:
                            rings.extend(np.asarray(r)[:, :2] for r in p.rings)
                self.bbox[rid] = bounds(g)
            ce, be = 0, 0
            for c in rings:
                if len(c) >= 2:
                    seg = np.column_stack([c[:-1], c[1:]])
                    bnd_parts.append(seg)
                    be += len(seg)
                    if len(c) >= 4:
                        cross_parts.append(seg)
                        ce += len(seg)
            cross_cnt[rid] = ce
            bnd_cnt[rid] = be
        self.cross_start = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cross_cnt, out=self.cross_start[1:])
        self.bnd_start = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(bnd_cnt, out=self.bnd_start[1:])
        self.cross_seg = (np.concatenate(cross_parts, axis=0)
                          if cross_parts else np.zeros((0, 4)))
        self.bnd_seg = (np.concatenate(bnd_parts, axis=0)
                        if bnd_parts else np.zeros((0, 4)))

    @staticmethod
    def _expand(start: np.ndarray, rids: np.ndarray):
        """(row_idx, edge_idx) for the ragged ranges of each row's region."""
        cnt = start[rids + 1] - start[rids]
        total = int(cnt.sum())
        if total == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        row_idx = np.repeat(np.arange(len(rids), dtype=np.int64), cnt)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt)
        return row_idx, start[rids][row_idx] + offs

    def classify_many(self, rids, px, py) -> np.ndarray:
        """0 exterior / 1 boundary / 2 interior of point i vs region
        rids[i] — one vectorized pass for the whole heterogeneous batch."""
        rids = np.asarray(rids, dtype=np.int64)
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        out = np.zeros(len(rids), dtype=np.int8)
        ok = (rids >= 0) & (rids < self.n)
        bb = self.bbox[np.where(ok, rids, 0)]
        live = (ok & (px >= bb[:, 0]) & (px <= bb[:, 2])
                & (py >= bb[:, 1]) & (py <= bb[:, 3]))
        if not live.any():
            return out
        li = np.nonzero(live)[0]
        r, x, y = rids[li], px[li], py[li]
        # even-odd crossing parity over the region's own edges
        row, eidx = self._expand(self.cross_start, r)
        if len(row):
            s = self.cross_seg[eidx]
            x1, y1, x2, y2 = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
            PX, PY = x[row], y[row]
            cond = (y1 > PY) != (y2 > PY)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x1 + (PY - y1) * (x2 - x1) / (y2 - y1)
            hits = cond & (PX < xint)
            crossings = np.bincount(row[hits], minlength=len(li))
            inside = (crossings % 2).astype(bool)
            out[li[inside]] = INTERIOR
        # exact on-boundary test overrides (eps = 0, as points_on_segments)
        row, eidx = self._expand(self.bnd_start, r)
        if len(row):
            s = self.bnd_seg[eidx]
            x1, y1, x2, y2 = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
            PX, PY = x[row], y[row]
            cross = (x2 - x1) * (PY - y1) - (y2 - y1) * (PX - x1)
            onb = ((cross == 0.0)
                   & (PX >= np.minimum(x1, x2)) & (PX <= np.maximum(x1, x2))
                   & (PY >= np.minimum(y1, y2)) & (PY <= np.maximum(y1, y2)))
            if onb.any():
                hit = np.unique(row[onb])
                out[li[hit]] = BOUNDARY
        return out


def contains_xy(geom: Geometry, x, y) -> np.ndarray:
    """reference: shapely/predicates.py:1311 — vectorized point fast path,
    auto-prepares (here: rings extracted once per call)."""
    prep = PreparedPolygons([geom])
    return prep.test(0, np.atleast_1d(x), np.atleast_1d(y), "contains")


def intersects_xy(geom: Geometry, x, y) -> np.ndarray:
    """reference: shapely/predicates.py:1367."""
    prep = PreparedPolygons([geom])
    return prep.test(0, np.atleast_1d(x), np.atleast_1d(y), "intersects")


# ---------------------------------------------------------------------------
# Segment-segment intersection (for line/polygon predicates)
# ---------------------------------------------------------------------------

def _segments_intersect_any(sa: np.ndarray, sb: np.ndarray) -> bool:
    """True if any segment of sa properly or improperly intersects any of sb."""
    if len(sa) == 0 or len(sb) == 0:
        return False
    ax1, ay1, ax2, ay2 = (sa[:, i][:, None] for i in range(4))
    bx1, by1, bx2, by2 = (sb[:, i][None, :] for i in range(4))

    d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
    d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
    d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
    d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    if proper.any():
        return True

    # collinear / endpoint-touch cases: any endpoint of one on the other
    def on(d, px, py, x1, y1, x2, y2):
        return (
            (d == 0)
            & (px >= np.minimum(x1, x2)) & (px <= np.maximum(x1, x2))
            & (py >= np.minimum(y1, y2)) & (py <= np.maximum(y1, y2))
        )

    touch = (
        on(d1, bx1, by1, ax1, ay1, ax2, ay2)
        | on(d2, bx2, by2, ax1, ay1, ax2, ay2)
        | on(d3, ax1, ay1, bx1, by1, bx2, by2)
        | on(d4, ax2, ay2, bx1, by1, bx2, by2)
    )
    return bool(touch.any())


# ---------------------------------------------------------------------------
# Binary predicates — general dispatch (reference: shapely/predicates.py)
# ---------------------------------------------------------------------------

def _dim(geom: Geometry) -> int:
    tid = geom.type_id
    if tid in (POINT, MULTIPOINT):
        return 0
    if tid in (LINESTRING, LINEARRING, MULTILINESTRING):
        return 1
    if tid in (POLYGON, MULTIPOLYGON):
        return 2
    return max((_dim(p) for p in (geom.parts or [])), default=-1)


def _points_of(geom: Geometry) -> np.ndarray:
    return geom.all_coords()[:, :2]


def _rings_of(geom: Geometry) -> list[np.ndarray]:
    rings = []
    if geom.type_id == POLYGON:
        rings = [np.asarray(r)[:, :2] for r in geom.rings or []]
    elif geom.type_id in (MULTIPOLYGON, GEOMETRYCOLLECTION):
        for p in geom.parts or []:
            rings.extend(_rings_of(p))
    return rings


def _bbox_disjoint(a: Geometry, b: Geometry) -> bool:
    ba, bb = bounds(a), bounds(b)
    if np.isnan(ba[0]) or np.isnan(bb[0]):
        return True
    return ba[0] > bb[2] or bb[0] > ba[2] or ba[1] > bb[3] or bb[1] > ba[3]


def intersects(a: Geometry | None, b: Geometry | None) -> bool:
    """reference: shapely/predicates.py:865 — share any point.
    Covers all type combinations of point/line/polygon (+multis)."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return False
    if _bbox_disjoint(a, b):
        return False
    da, db = _dim(a), _dim(b)
    if da > db:
        return intersects(b, a)
    pa = _points_of(a)
    if da == 0:
        if db == 0:
            pb = _points_of(b)
            return bool(
                np.any((pa[:, None, 0] == pb[None, :, 0]) & (pa[:, None, 1] == pb[None, :, 1]))
            )
        if db == 1:
            return bool(points_on_segments(pa[:, 0], pa[:, 1], _edges(b)).any())
        return bool((points_in_rings_class(pa[:, 0], pa[:, 1], _rings_of(b)) >= BOUNDARY).any())
    ea, eb = _edges(a), _edges(b)
    if da == 1:
        if db == 1:
            return _segments_intersect_any(ea, eb)
        # line vs polygon: edge crossing or any line vertex inside
        if _segments_intersect_any(ea, eb):
            return True
        return bool((points_in_rings_class(pa[:, 0], pa[:, 1], _rings_of(b)) >= BOUNDARY).any())
    # polygon vs polygon: with no boundary crossing, every CONNECTED
    # component of each side is wholly inside or wholly outside the other —
    # but a multipolygon has several components, so EVERY part must be
    # probed (the r3 fuzz caught a one-vertex probe missing a multipolygon
    # whose first part lies outside while the second sits inside)
    if _segments_intersect_any(ea, eb):
        return True
    pb = _points_of(b)
    if (points_in_rings_class(pb[:, 0], pb[:, 1], _rings_of(a)) >= BOUNDARY).any():
        return True
    return bool((points_in_rings_class(pa[:, 0], pa[:, 1], _rings_of(b)) >= BOUNDARY).any())


def disjoint(a, b) -> bool:
    """reference: shapely/predicates.py:783 (empty is disjoint from all)."""
    if a is None or b is None:
        return False
    return not intersects(a, b)


def _all_class(points: np.ndarray, container: Geometry) -> np.ndarray:
    """Classify each point of `points` against container (any dim)."""
    px, py = points[:, 0], points[:, 1]
    d = _dim(container)
    if d == 2:
        return points_in_rings_class(px, py, _rings_of(container))
    if d == 1:
        onb = points_on_segments(px, py, _edges(container))
        # interior of a line: on segment but not a mod-2 boundary point
        # (endpoints occurring an odd number of times; shared endpoints of
        # a connected multiline are interior — reference boundary-node rule)
        cls = np.where(onb, INTERIOR, EXTERIOR).astype(np.int8)
        ends = _line_boundary_points(container)
        if len(ends):
            isend = np.any(
                (px[:, None] == ends[None, :, 0]) & (py[:, None] == ends[None, :, 1]),
                axis=1,
            )
            cls[onb & isend] = BOUNDARY
        return cls
    cc = _points_of(container)
    eq = np.any((px[:, None] == cc[None, :, 0]) & (py[:, None] == cc[None, :, 1]), axis=1)
    return np.where(eq, INTERIOR, EXTERIOR).astype(np.int8)


def _hole_rings(geom: Geometry) -> list[np.ndarray]:
    holes: list[np.ndarray] = []
    if geom.type_id == POLYGON:
        holes = [np.asarray(r)[:, :2] for r in (geom.rings or [])[1:]]
    elif geom.type_id in (MULTIPOLYGON, GEOMETRYCOLLECTION):
        for p in geom.parts or []:
            holes.extend(_hole_rings(p))
    return holes


def _noded_midpoint_class(b_edges: np.ndarray, a: Geometry) -> np.ndarray:
    """Class (vs areal A) of every midpoint of ∂B's edges NODED at ∂A.
    Raw edge midpoints are not enough: an edge of B bridging the gap
    between two parts of A can have BOTH endpoints and its midpoint on
    A's closure while its interior crosses A's exterior (the r3 fuzz
    counterexample: two abutting boxes vs two boxes with a gap). After
    noding, each fragment lies in a single DE-9IM class, so midpoints
    classify exactly."""
    from .overlay import _fragments, _overlay_tol, _split_params

    ea = _edges(a)
    if not len(b_edges) or not len(ea):
        return np.zeros(0, dtype=np.int8)
    tol = _overlay_tol(ea, b_edges)
    fb = _fragments(b_edges, _split_params(b_edges, ea, tol))
    if not len(fb):
        return np.zeros(0, dtype=np.int8)
    mx, my = (fb[:, 0] + fb[:, 2]) / 2.0, (fb[:, 1] + fb[:, 3]) / 2.0
    cls = points_in_rings_class(mx, my, _rings_of(a))
    onb = points_on_segments(mx, my, ea, eps=tol)
    return np.where(onb, np.int8(BOUNDARY), cls)


def _holes_clear_of(a: Geometry, b: Geometry) -> bool:
    """True iff no hole of A admits closure(B) into A's exterior: a hole
    whose interior meets closure(B) breaks covers(A, B) even when ∂B
    never enters it (B blankets the hole). Each hole is probed at an
    interior representative; a probe that lands INTERIOR to A means an
    island sits inside the hole — settled exactly by the overlay engine
    (area(B \\ A) > 0)."""
    holes = _hole_rings(a)
    if not holes:
        return True
    from .constructive import point_on_surface

    for ring in holes:
        hole_poly = Geometry(POLYGON, rings=[ring])
        rp = point_on_surface(hole_poly)
        if rp is None or rp.is_empty:
            continue
        px, py = float(rp.coords[0, 0]), float(rp.coords[0, 1])
        cls_a = points_in_rings_class(np.array([px]), np.array([py]), _rings_of(a))[0]
        if cls_a == EXTERIOR:
            if points_in_rings_class(np.array([px]), np.array([py]), _rings_of(b))[0] >= BOUNDARY:
                return False
        else:
            # island-inside-hole nesting: exact fallback through overlay
            from .overlay import difference

            d = difference(b, a)
            return d is None or d.is_empty or area(d) <= 1e-12 * max(1.0, area(b))
    return True


def contains(a: Geometry | None, b: Geometry | None) -> bool:
    """B lies in A, interiors intersect: DE-9IM 'T*****FF*'.
    reference: shapely/predicates.py:556. All point/line/polygon
    combinations; closure containment is exact (noded-fragment
    classification + hole probes), interior witness per dimension."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return False
    if _bbox_disjoint(a, b):
        return False
    da, db = _dim(a), _dim(b)
    if db > da:
        return False
    pb = _points_of(b)
    cls = _all_class(pb, a)
    if (cls == EXTERIOR).any():
        return False
    if db == 0:
        return bool((cls == INTERIOR).any())
    if da == 2:
        if not covers(a, b):
            return False
        if db == 2:
            # closure(b) ⊆ closure(a) and b has area; ∂a has none, so
            # interiors must meet — contains(a, a) is True in the
            # reference (DE-9IM 2FFF1FFF2 matches 'T*****FF*')
            return True
        # line in polygon: need a witness of b in int(a)
        if (cls == INTERIOR).any():
            return True
        mcls = _noded_midpoint_class(_edges(b), a)
        return bool((mcls == INTERIOR).any())
    # line-in-line: vertex sampling misses collinear spans (equal lines have
    # all vertices on ∂) — require closure containment plus interior witness
    # ('T*****FF*' == covers ∧ interiors-intersect)
    return covers(a, b) and _interiors_intersect(a, b)


def within(a, b) -> bool:
    """reference: shapely/predicates.py:1013 — within(a,b)==contains(b,a)."""
    return contains(b, a)


def covers(a: Geometry | None, b: Geometry | None) -> bool:
    """B in closure of A ('******FF*'). reference: shapely/predicates.py:729."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return False
    if _bbox_disjoint(a, b):
        return False
    da, db = _dim(a), _dim(b)
    if db > da:
        return False
    pb = _points_of(b)
    cls = _all_class(pb, a)
    if (cls == EXTERIOR).any():
        return False
    if db >= 1 and da == 2:
        # exact: node ∂B at ∂A so every fragment sits in one class — raw
        # midpoints miss an edge of B bridging a gap between parts of A
        # through A's exterior with all samples on A's closure
        if (_noded_midpoint_class(_edges(b), a) == EXTERIOR).any():
            return False
        if db == 2 and not _holes_clear_of(a, b):
            return False
    if da == 1 and db == 1:
        # vertex sampling misses spans of b that leave a between a-vertices:
        # node b's edges at a's, then EVERY fragment midpoint must lie on a
        from .overlay import _fragments, _overlay_tol, _split_params

        ea, eb = _edges(a), _edges(b)
        if not len(ea):
            return False
        if len(eb):
            tol = _overlay_tol(ea, eb)
            fr = _fragments(eb, _split_params(eb, ea, tol))
            if len(fr):
                mx, my = (fr[:, 0] + fr[:, 2]) / 2.0, (fr[:, 1] + fr[:, 3]) / 2.0
                if not points_on_segments(mx, my, ea, eps=tol).all():
                    return False
    return True


def covered_by(a, b) -> bool:
    """reference: shapely/predicates.py:674."""
    return covers(b, a)


def contains_properly(a: Geometry | None, b: Geometry | None) -> bool:
    """B intersects interior of A only ('T**FF*FF*').
    reference: shapely/predicates.py:619."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return False
    pb = _points_of(b)
    cls = _all_class(pb, a)
    if not (cls == INTERIOR).all():
        return False
    if _dim(b) >= 1 and _dim(a) == 2:
        mcls = _noded_midpoint_class(_edges(b), a)
        if not (mcls == INTERIOR).all():
            return False
        if _dim(b) == 2 and not _holes_clear_of(a, b):
            return False
    return True


def touches(a: Geometry | None, b: Geometry | None) -> bool:
    """Boundaries intersect, interiors don't ('FT*******'|'F**T*****'|
    'F***T****'). reference: shapely/predicates.py:968. Supported for
    point-vs-(line|polygon) and polygon-vs-polygon edge-touch cases."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return False
    da, db = _dim(a), _dim(b)
    if da > db:
        return touches(b, a)
    if da == 0:
        pa = _points_of(a)
        cls = _all_class(pa, b)
        return bool((cls == BOUNDARY).any() and not (cls == INTERIOR).any())
    if not intersects(a, b):
        return False
    # line/polygon combos: touching = intersecting but no interior overlap
    return not _interiors_intersect(a, b)


def _proper_crossing(ea: np.ndarray, eb: np.ndarray) -> bool:
    """Any strictly-proper segment crossing between the two edge sets."""
    if not len(ea) or not len(eb):
        return False
    ax1, ay1, ax2, ay2 = (ea[:, i][:, None] for i in range(4))
    bx1, by1, bx2, by2 = (eb[:, i][None, :] for i in range(4))
    d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
    d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
    d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
    d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) \
        & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    return bool(proper.any())


def _axis_rect(g: Geometry):
    """(xmin, ymin, xmax, ymax) if g is a single axis-aligned rectangle
    ring (hole-free), else None."""
    if g.type_id != POLYGON or not g.rings or len(g.rings) != 1:
        return None
    c = np.asarray(g.rings[0])[:, :2]
    if len(c) != 5:
        return None
    d = np.diff(c, axis=0)
    if not np.all((d[:, 0] == 0) | (d[:, 1] == 0)):
        return None
    xmin, ymin = c[:, 0].min(), c[:, 1].min()
    xmax, ymax = c[:, 0].max(), c[:, 1].max()
    if xmax <= xmin or ymax <= ymin:
        return None
    return float(xmin), float(ymin), float(xmax), float(ymax)


def _noded_line_classes(a: Geometry, b: Geometry) -> np.ndarray:
    """Classify line a's boundary-noded fragment midpoints vs polygon b:
    INTERIOR/BOUNDARY/EXTERIOR per fragment. Noding the line at ∂b first is
    what makes corner-to-corner transits classify correctly — the un-noded
    midpoint of such a segment lands back on ∂b."""
    from .overlay import (
        _edges_of, _fragments, _overlay_tol, _poly_rings_oriented,
        _split_params,
    )

    ea = _edges(a)
    if not len(ea):
        return np.zeros(0, dtype=np.int8)
    rb = _poly_rings_oriented(b)
    ebnd = _edges_of(rb)
    if not len(ebnd):
        return np.zeros(0, dtype=np.int8)
    tol = _overlay_tol(ea, ebnd)
    fr = _fragments(ea, _split_params(ea, ebnd, tol))
    if not len(fr):
        return np.zeros(0, dtype=np.int8)
    mx, my = (fr[:, 0] + fr[:, 2]) / 2.0, (fr[:, 1] + fr[:, 3]) / 2.0
    cls = points_in_rings_class(mx, my, rb)
    onb = points_on_segments(mx, my, ebnd, eps=tol)
    return np.where(onb, np.int8(BOUNDARY), cls)


def _interiors_intersect(a: Geometry, b: Geometry) -> bool:
    """int(a) ∩ int(b) ≠ ∅ — the DE-9IM II cell as a boolean. Witnesses are
    found by noding each boundary against the other (same fragment machinery
    as overlay), so collinear-boundary configurations (equal polygons,
    congruent offset boxes, containment sharing an edge, a line through a
    polygon corner-to-corner) classify correctly — vertex/midpoint sampling
    alone misses them."""
    from .overlay import (
        _crossing_touch_points, _edges_of, _fragments, _overlay_tol,
        _poly_rings_oriented, _split_params,
    )

    da, db = _dim(a), _dim(b)
    if da == 0 or db == 0:
        # a point's interior is the point itself: witness = any point of the
        # puntal side classified INTERIOR against the other geometry
        pts, other = (a, b) if da == 0 else (b, a)
        pp = _points_of(pts)
        return bool((_all_class(pp, other) == INTERIOR).any())
    if da == 2 and db == 2:
        # axis-aligned-rectangle fast path (GEOS RectangleIntersects
        # analog): open-interval overlap on both axes
        ra_box = _axis_rect(a)
        rb_box = _axis_rect(b)
        if ra_box is not None and rb_box is not None:
            return (min(ra_box[2], rb_box[2]) > max(ra_box[0], rb_box[0])
                    and min(ra_box[3], rb_box[3]) > max(ra_box[1], rb_box[1]))
        # cheap witnesses first: a vertex strictly inside, or a proper cross
        for g, h in ((a, b), (b, a)):
            pg = _points_of(g)
            if (points_in_rings_class(pg[:, 0], pg[:, 1], _rings_of(h)) == INTERIOR).any():
                return True
        if _proper_crossing(_edges(a), _edges(b)):
            return True
        # collinear-boundary overlaps: node ∂g against ∂h; a fragment of ∂g
        # strictly inside h witnesses the overlap (every neighbourhood of
        # ∂g meets int(g), and int(h) is open); a fragment ON ∂h witnesses
        # it iff g's interior side (left of the oriented fragment) is
        # inside h — that nudge separates equal/contained-sharing-an-edge
        # (overlap) from edge-adjacent (touch).
        ra, rb = _poly_rings_oriented(a), _poly_rings_oriented(b)
        eao, ebo = _edges_of(ra), _edges_of(rb)
        if not len(eao) or not len(ebo):
            return False
        tol = _overlay_tol(eao, ebo)
        for eg, eh, rh in ((eao, ebo, rb), (ebo, eao, ra)):
            fr = _fragments(eg, _split_params(eg, eh, tol))
            if not len(fr):
                continue
            mx, my = (fr[:, 0] + fr[:, 2]) / 2.0, (fr[:, 1] + fr[:, 3]) / 2.0
            cls = points_in_rings_class(mx, my, rh)
            onb = points_on_segments(mx, my, eh, eps=tol)
            if ((cls == INTERIOR) & ~onb).any():
                return True
            idx = np.nonzero(onb)[0]
            if len(idx):
                dx, dy = fr[idx, 2] - fr[idx, 0], fr[idx, 3] - fr[idx, 1]
                ln = np.hypot(dx, dy)
                ok = ln > 0
                if ok.any():
                    # oriented rings carry interior on the LEFT; nudge well
                    # above the noding tol, well below feature sizes
                    delta = tol * 1e3
                    px = mx[idx][ok] - dy[ok] / ln[ok] * delta
                    py = my[idx][ok] + dx[ok] / ln[ok] * delta
                    if (points_in_rings_class(px, py, rh) == INTERIOR).any():
                        return True
        return False
    if db == 2:  # line or point vs polygon
        pa = _points_of(a)
        if (points_in_rings_class(pa[:, 0], pa[:, 1], _rings_of(b)) == INTERIOR).any():
            return True
        cls = _noded_line_classes(a, b)
        return bool((cls == INTERIOR).any())
    # line vs line: collinear overlap, proper crossing, or a crossing pinned
    # at a vertex that is interior (non-endpoint) to both lines. Overlap
    # witnesses come from NODED fragment midpoints: an un-noded midpoint can
    # land exactly on the other line's endpoint (T-junction → int∩∂, not
    # int∩int), and can miss partial collinear spans entirely.
    ea, eb = _edges(a), _edges(b)
    if not len(ea) or not len(eb):
        return False
    tol = _overlay_tol(ea, eb)
    for eg, eh in ((ea, eb), (eb, ea)):
        fr = _fragments(eg, _split_params(eg, eh, tol))
        if not len(fr):
            continue
        mx, my = (fr[:, 0] + fr[:, 2]) / 2.0, (fr[:, 1] + fr[:, 3]) / 2.0
        # post-noding, a fragment midpoint on the other line is strictly
        # between nodes, so it is interior to BOTH lines
        if points_on_segments(mx, my, eh, eps=tol).any():
            return True
    # 0-dim witnesses: every crossing/touch point that is a boundary point
    # of NEITHER line (a proper edge crossing can still land exactly on the
    # other line's mod-2 endpoint — e.g. a self-crossing polyline — so a
    # bare proper-crossing boolean is not a valid witness)
    pts = _crossing_touch_points(ea, eb, tol)
    if len(pts):
        ba, bb_ = _line_boundary_points(a), _line_boundary_points(b)
        for p in pts:
            on_ba = len(ba) and (np.abs(ba - p).max(axis=1) < tol * 10).any()
            on_bb = len(bb_) and (np.abs(bb_ - p).max(axis=1) < tol * 10).any()
            if not on_ba and not on_bb:
                return True
    return False


def crosses(a: Geometry | None, b: Geometry | None) -> bool:
    """Interiors intersect, neither contains the other, dim of intersection
    < max dim. reference: shapely/predicates.py:500. Supported: line-line
    (proper crossing), line-polygon, point(s)-line/polygon."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return False
    da, db = _dim(a), _dim(b)
    if da > db:
        return crosses(b, a)
    if da == 0 and db >= 1:
        pa = _points_of(a)
        cls = _all_class(pa, b)
        return bool((cls == INTERIOR).any() and (cls == EXTERIOR).any())
    if da == 1 and db == 1:
        if not _interiors_intersect(a, b):
            return False
        # crossing (dim 0 intersection): not collinear-overlapping
        return not (contains(a, b) or contains(b, a) or _collinear_overlap(a, b))
    if da == 1 and db == 2:
        # 'T*T******': the line must meet both int(b) and ext(b); classify
        # boundary-noded fragments so corner transits count
        cls = _noded_line_classes(a, b)
        return bool((cls == INTERIOR).any() and (cls == EXTERIOR).any())
    return False


def _collinear_overlap(a: Geometry, b: Geometry) -> bool:
    """True if any segment pair is collinear AND overlaps in >1 point."""
    ea, eb = _edges(a), _edges(b)
    if not len(ea) or not len(eb):
        return False
    ax1, ay1, ax2, ay2 = (ea[:, i][:, None] for i in range(4))
    bx1, by1, bx2, by2 = (eb[:, i][None, :] for i in range(4))
    # both endpoints of b on the infinite line of a → collinear
    c1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
    c2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
    collinear = (c1 == 0) & (c2 == 0)
    if not collinear.any():
        return False
    # overlap length > 0: project onto the dominant axis of a
    ovx = np.minimum(np.maximum(ax1, ax2), np.maximum(bx1, bx2)) - np.maximum(
        np.minimum(ax1, ax2), np.minimum(bx1, bx2)
    )
    ovy = np.minimum(np.maximum(ay1, ay2), np.maximum(by1, by2)) - np.maximum(
        np.minimum(ay1, ay2), np.minimum(by1, by2)
    )
    return bool((collinear & ((ovx > 0) | (ovy > 0))).any())


def overlaps(a: Geometry | None, b: Geometry | None) -> bool:
    """Same-dim, interiors intersect, neither contains the other.
    reference: shapely/predicates.py:905."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return False
    if _dim(a) != _dim(b):
        return False
    if _dim(a) == 1:
        # lineal pattern is '1*T***T**': the interior intersection must be
        # 1-dimensional — segments crossing at a point are crosses, not
        # overlaps. A dim-1 intersection of polylines forces some edge pair
        # collinear with positive overlap.
        if not _collinear_overlap(a, b):
            return False
    elif not _interiors_intersect(a, b):
        return False
    return not (covers(a, b) or covers(b, a))


def equals(a: Geometry | None, b: Geometry | None) -> bool:
    """Topological equality = within ∧ contains-closure.
    reference: shapely/predicates.py:830 (doc: a.within(b) && a.contains(b))."""
    if a is None or b is None:
        return False
    if a.is_empty and b.is_empty:
        return True
    return covers(a, b) and covers(b, a)


_distance_of = distance  # dwithin's reference-named parameter shadows the kernel


def dwithin(a: Geometry | None, b: Geometry | None, distance: float) -> bool:
    """distance(a,b) <= distance without materializing it when the bbox
    prune fails. reference: shapely/predicates.py:1269 (same parameter
    name for keyword compatibility; the kernel is _distance_of here
    because the parameter shadows it)."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return False
    d = distance
    ba, bb = bounds(a), bounds(b)
    if (
        ba[0] - d > bb[2] or bb[0] - d > ba[2]
        or ba[1] - d > bb[3] or bb[1] - d > ba[3]
    ):
        return False
    return _distance_of(a, b) <= d


def _boundary_dim(g: Geometry) -> int:
    """Dimension of ∂g: polygon→1, open line→0, closed line/point→-1."""
    d = _dim(g)
    if d == 2:
        return 1
    if d == 1:
        return 0 if len(_line_boundary_points(g)) else -1
    return -1


def _line_boundary_points(g: Geometry) -> np.ndarray:
    """Mod-2 boundary of lineal g: endpoints occurring an odd number of
    times (closed rings contribute none)."""
    from collections import Counter

    cnt: Counter = Counter()
    stack = [g]
    while stack:
        x = stack.pop()
        if x.type_id in (LINESTRING, LINEARRING) and x.coords is not None and len(x.coords) >= 2:
            cnt[tuple(np.round(x.coords[0, :2], 12))] += 1
            cnt[tuple(np.round(x.coords[-1, :2], 12))] += 1
        for p in x.parts or []:
            stack.append(p)
    pts = [p for p, k in cnt.items() if k % 2 == 1]
    return np.array(pts, dtype=np.float64) if pts else np.zeros((0, 2))


def _transpose9(m: list[int]) -> list[int]:
    return [m[0], m[3], m[6], m[1], m[4], m[7], m[2], m[5], m[8]]


def _relate_matrix(a: Geometry, b: Geometry) -> list[int]:
    """Full DE-9IM as 9 ints (-1=F) in row-major I/B/E(a) × I/B/E(b) order
    (reference: shapely/predicates.py:1194 computes this via GEOS
    RelateOp; here from the engine's noding + classification kernels)."""
    from .overlay import (
        _crossing_touch_points, _edges_of, _fragments, _line_edges,
        _overlay_tol, _poly_rings_oriented, _split_params,
    )

    F = -1
    if a.is_empty or b.is_empty:
        m = [F] * 9
        m[8] = 2
        if not b.is_empty:
            m[6] = _dim(b)
            m[7] = _boundary_dim(b)
        if not a.is_empty:
            m[2] = _dim(a)
            m[5] = _boundary_dim(a)
        return m
    da, db = _dim(a), _dim(b)
    if da > db:
        return _transpose9(_relate_matrix(b, a))

    m = [F] * 9
    m[8] = 2

    def _pt_class_vs_line(pts: np.ndarray, g: Geometry, eg: np.ndarray, tol: float) -> np.ndarray:
        """0=exterior, 1=boundary, 2=interior of a lineal geometry."""
        out = np.zeros(len(pts), dtype=np.int8)
        if len(pts) == 0:
            return out
        on = points_on_segments(pts[:, 0], pts[:, 1], eg, eps=tol)
        bnd = _line_boundary_points(g)
        for i in np.nonzero(on)[0]:
            isb = len(bnd) and (np.abs(bnd - pts[i]).max(axis=1) < tol * 10).any()
            out[i] = BOUNDARY if isb else INTERIOR
        return out

    if da == 0 and db == 0:
        pa, pb = _points_of(a), _points_of(b)
        shared = np.array([(np.abs(pb - p).max(axis=1) < 1e-12).any() for p in pa])
        m[0] = 0 if shared.any() else F
        m[2] = 0 if (~shared).any() else F
        sharedb = np.array([(np.abs(pa - p).max(axis=1) < 1e-12).any() for p in pb])
        m[6] = 0 if (~sharedb).any() else F
        return m

    if da == 0:  # point × line/polygon
        pa = _points_of(a)
        cls = _all_class(pa, b)
        m[0] = 0 if (cls == INTERIOR).any() else F
        m[1] = 0 if (cls == BOUNDARY).any() else F
        m[2] = 0 if (cls == EXTERIOR).any() else F
        m[6] = db  # a point set can never cover a 1-/2-dim interior
        bd = _boundary_dim(b)
        if bd >= 0:
            if db == 2:
                m[7] = 1
            else:  # line boundary: finite points; exterior unless all covered
                bnd = _line_boundary_points(b)
                covered = np.array(
                    [(np.abs(pa - p).max(axis=1) < 1e-12).any() for p in bnd]
                ) if len(bnd) else np.zeros(0, dtype=bool)
                m[7] = 0 if (~covered).any() else F
        return m

    if da == 1 and db == 1:
        ea, eb = _line_edges(a), _line_edges(b)
        tol = _overlay_tol(ea, eb)
        fa = _fragments(ea, _split_params(ea, eb, tol))
        fb = _fragments(eb, _split_params(eb, ea, tol))
        amx, amy = (fa[:, 0] + fa[:, 2]) / 2, (fa[:, 1] + fa[:, 3]) / 2
        bmx, bmy = (fb[:, 0] + fb[:, 2]) / 2, (fb[:, 1] + fb[:, 3]) / 2
        a_on_b = points_on_segments(amx, amy, eb, eps=tol) if len(fa) else np.zeros(0, bool)
        b_on_a = points_on_segments(bmx, bmy, ea, eps=tol) if len(fb) else np.zeros(0, bool)
        ba, bb_ = _line_boundary_points(a), _line_boundary_points(b)
        if a_on_b.any():
            m[0] = 1
        else:
            pts = _crossing_touch_points(ea, eb, tol)
            ca = _pt_class_vs_line(pts, a, ea, tol)
            cb = _pt_class_vs_line(pts, b, eb, tol)
            m[0] = 0 if ((ca == INTERIOR) & (cb == INTERIOR)).any() else F
        cbb = _pt_class_vs_line(bb_, a, ea, tol)
        m[1] = 0 if (cbb == INTERIOR).any() else F
        m[2] = 1 if (~a_on_b).any() else F
        cba = _pt_class_vs_line(ba, b, eb, tol)
        m[3] = 0 if (cba == INTERIOR).any() else F
        m[4] = 0 if (len(ba) and len(bb_) and (cba == BOUNDARY).any()) else F
        m[5] = 0 if (cba == EXTERIOR).any() else F
        m[6] = 1 if (~b_on_a).any() else F
        m[7] = 0 if (cbb == EXTERIOR).any() else F
        return m

    if da == 1 and db == 2:
        ea = _line_edges(a)
        rings = _poly_rings_oriented(b)
        ebnd = _edges_of(rings)
        tol = _overlay_tol(ea, ebnd)
        fa = _fragments(ea, _split_params(ea, ebnd, tol))
        if len(fa):
            mx, my = (fa[:, 0] + fa[:, 2]) / 2, (fa[:, 1] + fa[:, 3]) / 2
            cls = points_in_rings_class(mx, my, rings)
            onb = points_on_segments(mx, my, ebnd, eps=tol)
            cls = np.where(onb, np.int8(BOUNDARY), cls)
        else:
            cls = np.zeros(0, dtype=np.int8)
        m[0] = 1 if (cls == INTERIOR).any() else F
        if (cls == BOUNDARY).any():
            m[1] = 1
        else:
            pts = _crossing_touch_points(ea, ebnd, tol)
            ca = _pt_class_vs_line(pts, a, ea, tol)
            m[1] = 0 if (ca == INTERIOR).any() else F
        m[2] = 1 if (cls == EXTERIOR).any() else F
        ba = _line_boundary_points(a)
        if len(ba):
            cb = points_in_rings_class(ba[:, 0], ba[:, 1], rings)
            onb2 = points_on_segments(ba[:, 0], ba[:, 1], ebnd, eps=tol)
            cb = np.where(onb2, np.int8(BOUNDARY), cb)
            m[3] = 0 if (cb == INTERIOR).any() else F
            m[4] = 0 if (cb == BOUNDARY).any() else F
            m[5] = 0 if (cb == EXTERIOR).any() else F
        m[6] = 2  # a line never covers a polygon interior
        fbnd = _fragments(ebnd, _split_params(ebnd, ea, tol))
        if len(fbnd):
            bx, by = (fbnd[:, 0] + fbnd[:, 2]) / 2, (fbnd[:, 1] + fbnd[:, 3]) / 2
            off = ~points_on_segments(bx, by, ea, eps=tol)
            m[7] = 1 if off.any() else F
        else:
            m[7] = 1
        return m

    # polygon × polygon
    ra, rb = _poly_rings_oriented(a), _poly_rings_oriented(b)
    ea, eb = _edges_of(ra), _edges_of(rb)
    tol = _overlay_tol(ea, eb)
    fa = _fragments(ea, _split_params(ea, eb, tol))
    fb = _fragments(eb, _split_params(eb, ea, tol))

    def classify(frags, rings, edges):
        if not len(frags):
            return np.zeros(0, dtype=np.int8)
        mx, my = (frags[:, 0] + frags[:, 2]) / 2, (frags[:, 1] + frags[:, 3]) / 2
        cls = points_in_rings_class(mx, my, rings)
        onb = points_on_segments(mx, my, edges, eps=tol)
        return np.where(onb, np.int8(BOUNDARY), cls)

    ca = classify(fa, rb, eb)  # ∂A vs B
    cb = classify(fb, ra, ea)  # ∂B vs A
    ii = _interiors_intersect(a, b)
    if not ii:
        # equal/nested-with-shared-boundary cases have no boundary fragment
        # in the other's interior — probe an interior representative point
        from .constructive import point_on_surface

        for g, rings in ((a, rb), (b, ra)):
            rp = point_on_surface(g)
            if rp is not None and not rp.is_empty:
                if points_in_rings_class(
                    np.array([rp.coords[0, 0]]), np.array([rp.coords[0, 1]]), rings
                )[0] == INTERIOR:
                    ii = True
                    break
    m[0] = 2 if ii else F
    m[1] = 1 if (cb == INTERIOR).any() else F
    m[2] = F if covered_by(a, b) else 2
    m[3] = 1 if (ca == INTERIOR).any() else F
    if (ca == BOUNDARY).any():
        m[4] = 1
    else:
        pts = _crossing_touch_points(ea, eb, tol)
        m[4] = 0 if len(pts) else F
    m[5] = 1 if (ca == EXTERIOR).any() else F
    m[6] = F if covers(a, b) else 2
    m[7] = 1 if (cb == EXTERIOR).any() else F
    return m


def relate(a: Geometry | None, b: Geometry | None) -> str | None:
    """DE-9IM matrix string for any point/line/polygon combination.
    reference: shapely/predicates.py:1194."""
    if a is None or b is None:
        return None
    return "".join("F" if v < 0 else str(v) for v in _relate_matrix(a, b))


def relate_pattern(a, b, pattern: str) -> bool:
    """reference: shapely/predicates.py:1226 — T/F/0/1/2/* matching."""
    m = relate(a, b)
    if m is None:
        return False
    for got, want in zip(m, pattern):
        if want == "*":
            continue
        if want == "T":
            if got == "F":
                return False
        elif got != want:
            return False
    return True


# ---------------------------------------------------------------------------
# Unary predicates (reference: shapely/predicates.py)
# ---------------------------------------------------------------------------

def is_ccw(geom: Geometry | None) -> bool:
    """reference: shapely/predicates.py:113 (signed area > 0); False for
    non-rings/None."""
    if geom is None or geom.type_id not in (LINEARRING, LINESTRING):
        return False
    c = geom.coords
    if c is None or len(c) < 4 or not np.array_equal(c[0, :2], c[-1, :2]):
        return False
    return signed_ring_area(c[:, :2]) > 0


def is_closed(geom: Geometry | None) -> bool:
    """reference: shapely/predicates.py:152."""
    if geom is None or geom.type_id not in (LINESTRING, LINEARRING, MULTILINESTRING):
        return False
    if geom.type_id == MULTILINESTRING:
        return all(is_closed(p) for p in (geom.parts or [])) and bool(geom.parts)
    c = geom.coords
    if c is None or len(c) == 0:
        return False
    return bool(np.array_equal(c[0, :2], c[-1, :2]))


def is_ring(geom: Geometry | None) -> bool:
    """closed + simple. reference: shapely/predicates.py:354."""
    return is_closed(geom) and is_simple(geom)


def is_simple(geom: Geometry | None) -> bool:
    """No self-intersection (lines). reference: shapely/predicates.py:392.
    Point/polygon types return True like GEOS (validity is separate)."""
    if geom is None:
        return False
    if geom.type_id not in (LINESTRING, LINEARRING, MULTILINESTRING):
        return geom.type_id != GEOMETRYCOLLECTION
    segs = _edges(geom)
    n = len(segs)
    closed = is_closed(geom)
    for i in range(n):
        for j in range(i + 1, n):
            adjacent = j == i + 1 or (closed and i == 0 and j == n - 1)
            a, b = segs[i : i + 1], segs[j : j + 1]
            if _segments_intersect_any(a, b):
                if adjacent:
                    # sharing one endpoint is fine; overlap is not
                    mx = np.array([(b[0, 0] + b[0, 2]) / 2.0])
                    my = np.array([(b[0, 1] + b[0, 3]) / 2.0])
                    if points_on_segments(mx, my, a).any():
                        return False
                    continue
                return False
    return True


def is_valid(geom: Geometry | None) -> bool:
    """OGC validity (subset): rings closed, >=4 points, no ring
    self-intersection, holes inside shell. reference: shapely/predicates.py:431."""
    return is_valid_reason(geom) == "Valid Geometry"


def is_valid_reason(geom: Geometry | None) -> str | None:
    """reference: shapely/predicates.py:468."""
    if geom is None:
        return None
    if geom.type_id == POLYGON:
        for r in geom.rings or []:
            c = np.asarray(r)
            if len(c) and not np.array_equal(c[0, :2], c[-1, :2]):
                return "Ring Not Closed"
            if 0 < len(c) < 4:
                return "Too Few Points"
            ring_geom = Geometry(LINEARRING, coords=c)
            if not is_simple(ring_geom):
                return "Self-intersection"
        if geom.rings and len(geom.rings) > 1:
            shell = [geom.rings[0]]
            for h in geom.rings[1:]:
                hc = np.asarray(h)[:, :2]
                if (points_in_rings_class(hc[:, 0], hc[:, 1], shell) == EXTERIOR).any():
                    return "Hole Lies Outside Shell"
        return "Valid Geometry"
    if geom.type_id in (MULTIPOLYGON, GEOMETRYCOLLECTION):
        for p in geom.parts or []:
            r = is_valid_reason(p)
            if r != "Valid Geometry":
                return r
        return "Valid Geometry"
    return "Valid Geometry"


# ---------------------------------------------------------------------------
# Discrete Hausdorff / Fréchet (reference: shapely/measurement.py:200,245)
# ---------------------------------------------------------------------------

def _densified_points(geom: Geometry, densify: float | None) -> np.ndarray:
    pts = geom.all_coords()[:, :2]
    if densify is None:
        return pts
    if math.isnan(densify):
        # reference: densify=nan propagates to a nan distance, not an
        # error (tests/test_measurement.py::test_hausdorff_densify_nan)
        return None
    if not 0 < densify <= 1:
        raise ValueError("densify must be in (0, 1]")
    segs = _edges(geom)
    out = [pts]
    for x1, y1, x2, y2 in segs:
        n = max(1, int(math.ceil(1.0 / densify)) - 1)
        t = np.linspace(0, 1, n + 2)[1:-1]
        out.append(np.column_stack([x1 + t * (x2 - x1), y1 + t * (y2 - y1)]))
    return np.concatenate(out, axis=0)


def hausdorff_distance(a: Geometry | None, b: Geometry | None, densify: float | None = None) -> float:
    """Discrete (vertex/densified) Hausdorff distance, max of directed
    point-to-geometry distances. reference: shapely/measurement.py:200
    (GEOSHausdorffDistance uses the same discrete algorithm)."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return float("nan")
    pa = _densified_points(a, densify)
    pb = _densified_points(b, densify)
    if pa is None or pb is None:  # densify=nan
        return float("nan")

    def directed(p, q):
        d2 = (p[:, None, 0] - q[None, :, 0]) ** 2 + (p[:, None, 1] - q[None, :, 1]) ** 2
        return float(np.sqrt(d2.min(axis=1)).max())

    return max(directed(pa, pb), directed(pb, pa))


def frechet_distance(a: Geometry | None, b: Geometry | None, densify: float | None = None) -> float:
    """Discrete Fréchet distance (dynamic program over vertex sequences).
    reference: shapely/measurement.py:245."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return float("nan")
    p = _densified_points(a, densify)
    q = _densified_points(b, densify)
    if p is None or q is None:  # densify=nan
        return float("nan")
    n, m = len(p), len(q)
    d = np.sqrt((p[:, None, 0] - q[None, :, 0]) ** 2 + (p[:, None, 1] - q[None, :, 1]) ** 2)
    ca = np.full((n, m), -1.0)
    ca[0, 0] = d[0, 0]
    for i in range(1, n):
        ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
    for j in range(1, m):
        ca[0, j] = max(ca[0, j - 1], d[0, j])
    for i in range(1, n):
        for j in range(1, m):
            ca[i, j] = max(min(ca[i - 1, j], ca[i - 1, j - 1], ca[i, j - 1]), d[i, j])
    return float(ca[n - 1, m - 1])


def minimum_bounding_radius(geom: Geometry | None) -> float:
    """reference: shapely/measurement.py:326."""
    from .constructive import minimum_bounding_circle

    if geom is None or geom.is_empty:
        return float("nan") if geom is None else 0.0
    c, r = minimum_bounding_circle(geom, return_center=True)
    return r


def explain_validity(geom: Geometry | None) -> str | None:
    """reference: shapely/validation.py explain_validity — alias of
    is_valid_reason (GEOSisValidReason)."""
    return is_valid_reason(geom)


def prepare(geom: Geometry | None) -> None:
    """reference: shapely/prepared.py / _geometry.py prepare. In this
    engine preparation is an executor-side cache keyed by geometry
    (spark/join.py:100) — kernel-level prepare is a documented no-op."""
    return None


def destroy_prepared(geom: Geometry | None) -> None:
    """reference: shapely/_geometry.py destroy_prepared — no-op (see
    prepare)."""
    return None


def is_prepared(geom: Geometry | None) -> bool:
    """reference: shapely/predicates.py is_prepared — kernel-side objects
    carry no prepared state (the executor cache holds it), so False."""
    return False


def validate(geom: Geometry | None) -> str | None:
    """reference: shapely/ops.py:211 ops.validate — returns the validity
    reason string (the reference delegates to is_valid_reason)."""
    return is_valid_reason(geom)


# ---------------------------------------------------------------------------
# Group-vectorized intersects: one right geometry vs a batch of lefts
# (the spatial_join_geom refine hot path — r3 verdict item 2: the non-rect
# remainder ran the scalar kernel per pair)
# ---------------------------------------------------------------------------

_EDGE_CHUNK = 1 << 22  # cap the (left-edge × right-edge) outer product rows


def _ragged_stack(arrays: list[np.ndarray], width: int):
    """Concatenate per-owner arrays; return (stacked, owner_index)."""
    keep = [(i, a) for i, a in enumerate(arrays) if len(a)]
    if not keep:
        return np.zeros((0, width)), np.zeros(0, np.int64)
    stacked = np.concatenate([a for _, a in keep], axis=0)
    owner = np.repeat(np.fromiter((i for i, _ in keep), np.int64,
                                  count=len(keep)),
                      [len(a) for _, a in keep])
    return stacked, owner


def _any_by_owner(hits: np.ndarray, owner: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=bool)
    if hits.any():
        out[np.unique(owner[hits])] = True
    return out


def _points_on_closure(px, py, geom: Geometry) -> np.ndarray:
    """Boolean: each point lies on the CLOSURE of geom (the intersects
    point test — points_in_rings_class >= BOUNDARY for areas,
    points_on_segments for lines, coordinate equality for points)."""
    d = _dim(geom)
    if d == 2:
        return points_in_rings_class(px, py, _rings_of(geom)) >= BOUNDARY
    if d == 1:
        return points_on_segments(px, py, _edges(geom))
    rp = _points_of(geom)
    return np.any((px[:, None] == rp[None, :, 0])
                  & (py[:, None] == rp[None, :, 1]), axis=1)


def _segments_intersect_pairs(sa: np.ndarray, owner: np.ndarray,
                              sb: np.ndarray, n: int) -> np.ndarray:
    """Per-owner any-intersection between owner-tagged segments sa and the
    shared segment set sb — same proper/touch maths as
    _segments_intersect_any, chunked so the outer product stays in cache."""
    out = np.zeros(n, dtype=bool)
    if len(sa) == 0 or len(sb) == 0:
        return out
    rows_per_chunk = max(1, _EDGE_CHUNK // max(len(sb), 1))
    for s in range(0, len(sa), rows_per_chunk):
        a = sa[s:s + rows_per_chunk]
        own = owner[s:s + rows_per_chunk]
        ax1, ay1, ax2, ay2 = (a[:, i][:, None] for i in range(4))
        bx1, by1, bx2, by2 = (sb[:, i][None, :] for i in range(4))
        d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
        d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
        d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
        d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
        hit = (((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
               & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0))

        def on(d, px, py, x1, y1, x2, y2):
            return ((d == 0)
                    & (px >= np.minimum(x1, x2)) & (px <= np.maximum(x1, x2))
                    & (py >= np.minimum(y1, y2)) & (py <= np.maximum(y1, y2)))

        hit |= (on(d1, bx1, by1, ax1, ay1, ax2, ay2)
                | on(d2, bx2, by2, ax1, ay1, ax2, ay2)
                | on(d3, ax1, ay1, bx1, by1, bx2, by2)
                | on(d4, ax2, ay2, bx1, by1, bx2, by2))
        rows = hit.any(axis=1)
        if rows.any():
            out[np.unique(own[rows])] = True
    return out


def group_intersects(lgeoms: list, rgeom: Geometry | None) -> np.ndarray:
    """Vectorized intersects(lgeoms[i], rgeom) over a whole left batch.

    Exactly the scalar dispatch's three-way union (kernels.intersects):
    a pair intersects iff (1) some left vertex lies on the right's
    closure, or (2) some right vertex lies on the left's closure, or
    (3) some left edge meets some right edge (proper or touching).
    Each stage is one NumPy pass over owner-tagged stacked arrays —
    no per-pair Python. Agreement with the scalar kernel is pinned by a
    fuzz test (tests/test_join.py)."""
    n = len(lgeoms)
    out = np.zeros(n, dtype=bool)
    if rgeom is None or rgeom.is_empty:
        return out
    rb = bounds(rgeom)

    alive_idx = []
    for i, g in enumerate(lgeoms):
        if g is None or g.is_empty:
            continue
        lb = bounds(g)
        if np.isnan(lb[0]) or lb[0] > rb[2] or rb[0] > lb[2] \
                or lb[1] > rb[3] or rb[1] > lb[3]:
            continue
        alive_idx.append(i)
    if not alive_idx:
        return out
    alive_idx = np.asarray(alive_idx, dtype=np.int64)
    alive = [lgeoms[i] for i in alive_idx]
    m = len(alive)

    # stage 1: left vertices on closure(right)
    pts, owner = _ragged_stack([_points_of(g) for g in alive], 2)
    dec = _any_by_owner(_points_on_closure(pts[:, 0], pts[:, 1], rgeom),
                        owner, m)

    # stage 2: right vertices on closure(left), undecided lefts only
    und = np.flatnonzero(~dec)
    if len(und):
        rpts = _points_of(rgeom)
        rx, ry = rpts[:, 0], rpts[:, 1]
        for k in und:
            g = alive[k]
            # per-left call, but each is ONE vectorized pass over all
            # right vertices (right vertex counts dwarf left counts in
            # the admin-boundary regime this path serves)
            if _points_on_closure(rx, ry, g).any():
                dec[k] = True

    # stage 3: edge × edge, still-undecided lefts
    und = np.flatnonzero(~dec)
    if len(und):
        redges = _edges(rgeom)
        if len(redges):
            ledges, eowner = _ragged_stack(
                [_edges(alive[k]) for k in und], 4)
            hit = _segments_intersect_pairs(ledges, eowner, redges, len(und))
            dec[und[hit]] = True

    out[alive_idx[dec]] = True
    return out
