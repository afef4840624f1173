"""Packed Sort-Tile-Recursive R-tree over 2-D bounding boxes, pure NumPy.

Semantics pinned to the reference STRtree (shapely/strtree.py:30): query-only,
built once from input geometry bboxes (Z ignored, strtree.py:44-46); None and
empty geometries are skipped at build but keep their positions in the index
space (tests/test_strtree.py:56-66); default node_capacity=10
(strtree.py:75); `query` returns envelope-overlap candidates optionally
refined by a predicate with **inner-join semantics** — array input yields a
(2, n) [input_idx, tree_idx] array sorted by input then tree visit order
(strtree.py:229-266); `query_nearest` returns all equidistant nearest
matches (all_matches=True default), supports max_distance / exclusive
(strtree.py:350-542).

Role in the engine: (a) single-node oracle for the Spark spatial join's
golden tests; (b) executor-local index over the broadcast polygon layer
inside pandas UDFs (built lazily once per executor — the Spark analog of
GEOS prepared geometries).
"""

from __future__ import annotations

import numpy as np

from . import kernels as K
from .geom import Geometry

_PREDICATES = (
    # reference: shapely/strtree.py:16-27 BinaryPredicate enum
    "intersects",
    "within",
    "contains",
    "overlaps",
    "crosses",
    "touches",
    "covers",
    "covered_by",
    "contains_properly",
    "dwithin",
)


class STRtree:
    def __init__(self, geoms, node_capacity: int = 10):
        self.geometries = list(geoms)
        self.node_capacity = int(node_capacity)
        boxes = np.array([K.bounds(g) for g in self.geometries], dtype=np.float64).reshape(-1, 4)
        valid = ~np.isnan(boxes[:, 0])
        self._idx = np.nonzero(valid)[0].astype(np.int64)  # original positions
        self._leaf_boxes = boxes[valid]
        self._build()

    # ---- STR bulk load (reference: STR paper cited strtree.py:66-71) -----
    def _build(self):
        n = len(self._leaf_boxes)
        cap = self.node_capacity
        if n == 0:
            self._levels = []
            return
        cx = (self._leaf_boxes[:, 0] + self._leaf_boxes[:, 2]) / 2.0
        cy = (self._leaf_boxes[:, 1] + self._leaf_boxes[:, 3]) / 2.0
        # Sort-Tile-Recursive: sort by x, slice into vertical strips of
        # ~sqrt(n/cap) tiles, sort each strip by y, pack runs of `cap`.
        order = np.lexsort((cy, cx))
        nleaf_nodes = int(np.ceil(n / cap))
        nstrips = max(1, int(np.ceil(np.sqrt(nleaf_nodes))))
        strip_size = int(np.ceil(n / nstrips)) if nstrips else n
        final_order = []
        for s in range(0, n, strip_size):
            strip = order[s : s + strip_size]
            strip = strip[np.argsort(cy[strip], kind="stable")]
            final_order.append(strip)
        self._order = np.concatenate(final_order)  # leaf permutation
        # level 0 = leaves in packed order
        boxes = self._leaf_boxes[self._order]
        self._levels = [boxes]
        self._children = []  # per level>0: slices into level below
        while len(boxes) > cap:
            m = int(np.ceil(len(boxes) / cap))
            parent = np.empty((m, 4))
            for i in range(m):
                grp = boxes[i * cap : (i + 1) * cap]
                parent[i] = [grp[:, 0].min(), grp[:, 1].min(), grp[:, 2].max(), grp[:, 3].max()]
            self._levels.append(parent)
            boxes = parent

    def __len__(self):
        return len(self._leaf_boxes)

    # ---- envelope query ---------------------------------------------------
    def _query_box(self, qxmin, qymin, qxmax, qymax) -> np.ndarray:
        """Leaf original-indices whose boxes overlap the query box, in tree
        visit (packed) order."""
        if not self._levels:
            return np.empty(0, dtype=np.int64)
        cap = self.node_capacity
        # start from the top level, descend
        top = len(self._levels) - 1
        cand = np.arange(len(self._levels[top]))
        for lvl in range(top, 0, -1):
            b = self._levels[lvl][cand]
            hit = cand[(b[:, 0] <= qxmax) & (b[:, 2] >= qxmin) & (b[:, 1] <= qymax) & (b[:, 3] >= qymin)]
            if len(hit) == 0:
                return np.empty(0, dtype=np.int64)
            # expand to children at lvl-1
            children = (hit[:, None] * cap + np.arange(cap)[None, :]).ravel()
            cand = children[children < len(self._levels[lvl - 1])]
        b = self._levels[0][cand]
        hit = cand[(b[:, 0] <= qxmax) & (b[:, 2] >= qxmin) & (b[:, 1] <= qymax) & (b[:, 3] >= qymin)]
        return self._idx[self._order[np.sort(hit)]]

    def query_bbox(self, bbox) -> np.ndarray:
        return self._query_box(bbox[0], bbox[1], bbox[2], bbox[3])

    # ---- query(geometry, predicate) — reference strtree.py:108-266 --------
    def query(self, geometry, predicate: str | None = None, distance: float | None = None):
        scalar = isinstance(geometry, Geometry) or geometry is None
        geoms = [geometry] if scalar else list(geometry)
        if predicate is not None and predicate not in _PREDICATES:
            raise ValueError(f"invalid predicate {predicate!r}")
        if predicate == "dwithin" and distance is None:
            raise ValueError("distance required for dwithin")
        left: list[int] = []
        right: list[int] = []
        for qi, g in enumerate(geoms):
            if g is None or g.is_empty:
                continue
            bb = K.bounds(g)
            pad = float(distance) if predicate == "dwithin" else 0.0
            cands = self._query_box(bb[0] - pad, bb[1] - pad, bb[2] + pad, bb[3] + pad)
            if predicate is None:
                keep = cands
            else:
                keep = []
                for ti in cands:
                    t = self.geometries[ti]
                    if predicate == "dwithin":
                        ok = K.dwithin(g, t, distance)
                    else:
                        ok = getattr(K, predicate)(g, t)
                    if ok:
                        keep.append(ti)
                keep = np.asarray(keep, dtype=np.int64)
            left.extend([qi] * len(keep))
            right.extend(int(t) for t in keep)
        if scalar:
            return np.asarray(right, dtype=np.int64)
        return np.array([left, right], dtype=np.int64)

    # ---- nearest / query_nearest — reference strtree.py:268-542 -----------
    def nearest(self, geometry):
        scalar = isinstance(geometry, Geometry)
        geoms = [geometry] if scalar else list(geometry)
        out = []
        for g in geoms:
            idx, _ = self._nearest_one(g, max_distance=None, exclusive=False, all_matches=False)
            out.append(idx[0] if len(idx) else -1)
        return out[0] if scalar else np.asarray(out, dtype=np.int64)

    def query_nearest(
        self,
        geometry,
        max_distance: float | None = None,
        return_distance: bool = False,
        exclusive: bool = False,
        all_matches: bool = True,
    ):
        scalar = isinstance(geometry, Geometry)
        geoms = [geometry] if scalar else list(geometry)
        left: list[int] = []
        right: list[int] = []
        dists: list[float] = []
        for qi, g in enumerate(geoms):
            if g is None or g.is_empty:
                continue
            idx, d = self._nearest_one(g, max_distance, exclusive, all_matches)
            left.extend([qi] * len(idx))
            right.extend(idx)
            dists.extend(d)
        if scalar:
            res = np.asarray(right, dtype=np.int64)
            if return_distance:
                return res, np.asarray(dists)
            return res
        pairs = np.array([left, right], dtype=np.int64)
        if return_distance:
            return pairs, np.asarray(dists)
        return pairs

    def _nearest_one(self, g, max_distance, exclusive, all_matches):
        """Expand-then-refine (the reference's own documented fallback plan:
        benchmarks/benchmarks.py:282-319 — buffer by found distance + ε,
        re-query, keep group minima)."""
        if len(self) == 0:
            return [], []
        bb = K.bounds(g)
        # initial radius: nearest bbox distance via growing search
        lo = 0.0
        allb = self._leaf_boxes
        dx = np.maximum(np.maximum(allb[:, 0] - bb[2], bb[0] - allb[:, 2]), 0)
        dy = np.maximum(np.maximum(allb[:, 1] - bb[3], bb[1] - allb[:, 3]), 0)
        bbox_d = np.sqrt(dx * dx + dy * dy)
        order = np.argsort(bbox_d, kind="stable")
        best = np.inf
        results: list[tuple[float, int]] = []
        for k in order:
            if bbox_d[k] > best or (max_distance is not None and bbox_d[k] > max_distance):
                break
            ti = int(self._idx[k])
            t = self.geometries[ti]
            if exclusive and K.equals(g, t):
                continue
            d = K.distance(g, t)
            if np.isnan(d):
                continue
            if max_distance is not None and d > max_distance:
                continue
            if d < best - 1e-15:
                best = d
                results = [(d, ti)]
            elif abs(d - best) <= 1e-15:
                results.append((d, ti))
        if not results:
            return [], []
        if not all_matches:
            results = [min(results, key=lambda x: (x[0], x[1]))]
        results.sort(key=lambda x: (x[0], x[1]))
        return [r[1] for r in results], [r[0] for r in results]
