"""Spatial join: pages (points) ⋈ regions (polygons) — the engine's core plan.

Semantics pinned to STRtree.query(points, predicate=...) inner-join pair
semantics (shapely/strtree.py:229-266): output = every (point, region) pair
satisfying the predicate; points with NULL coordinates drop out (the
reference skips None/empty inputs, strtree.py:376).

The Spark plan (SURVEY.md §3.3):

  regions ──mapInPandas──▶ covers(region_id, cell_id, full)          [fan-out]
  pages ──withColumn(cell_id)──▶ ⋈ covers ON cell_id                 [equi-join,
                                                                 broadcast or shuffle]
  full cells ──▶ emit directly (cell entirely inside the polygon —
                 the broadcast-side analog of prepared-containment)
  partial cells ──▶ pandas-UDF refine: exact point-in-polygon kernel;
                    region geometries ride an sc.broadcast dict and are
                    parsed + prepared ONCE per executor (the Spark analog of
                    GEOS prepared geometries, shapely/creation.py:735) —
                    the join itself moves only (region_id, cell_id, full)
                    ints, never geometry bytes.

At scale: the covers table is tiny relative to pages (|regions| × avg-cover),
so Catalyst picks a broadcast hash join — the pages side is never shuffled.
For region layers too big to broadcast, pass broadcast=False: the covers
table (with WKB inlined for partial cells) shuffles both sides on cell_id
with AQE skew splitting; the refine caches prepared polygons by WKB bytes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.cells import DEFAULT_RES, polygon_cover
from .columns import cell_col

# Map engine predicates (evaluated as predicate(point, region), matching
# STRtree.query(points, predicate)) to the point-classification test:
#   intersects / covered_by: interior or boundary
#   within: interior only (DE-9IM T*F**F***, predicates.py:1013)
#   touches: boundary only (predicates.py:968)
_PREDICATES = {"intersects", "within", "covered_by", "touches"}
_FULL_OK = {"intersects", "within", "covered_by"}  # full cell ⊂ interior

# Join-time cover resolution, finer than the storage grid (DEFAULT_RES=9):
# at res 11 (0.18°×0.09° cells) 54% of cover cells are fully interior for
# the synthetic region mix vs 13% at res 9, so most candidate rows take the
# full-cell fast path and never reach the Python refine. The cover stays
# broadcastable (~60k rows per 1000 regions). Result set is res-invariant —
# res only moves work between prune and refine.
JOIN_RES = DEFAULT_RES + 2


def covers_df(regions: DataFrame, res: int = DEFAULT_RES, with_wkb: bool = False) -> DataFrame:
    """regions(region_id, wkb) → exploded cell cover. Distributed fan-out
    (mapInPandas). with_wkb=True inlines the region WKB on partial cells
    (shuffle-join mode, where no driver broadcast of geometry exists)."""
    schema = "region_id long, cell_id long, full boolean" + (
        ", wkb binary" if with_wkb else ""
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..geo.wkb import from_wkb

        for pdf in batches:
            rids, cids, fulls, wkbs = [], [], [], []
            for rid, wkb in zip(pdf["region_id"], pdf["wkb"]):
                g = from_wkb(bytes(wkb)) if wkb is not None else None
                if g is None or g.is_empty:
                    continue
                cells_, full_ = polygon_cover(g, res)
                for c, f in zip(cells_.tolist(), full_.tolist()):
                    rids.append(rid)
                    cids.append(c)
                    fulls.append(bool(f))
                    if with_wkb:
                        wkbs.append(None if f else bytes(wkb))
            data = {
                "region_id": pd.Series(rids, dtype="int64"),
                "cell_id": pd.Series(cids, dtype="int64"),
                "full": pd.Series(fulls, dtype="bool"),
            }
            if with_wkb:
                data["wkb"] = pd.Series(wkbs, dtype="object")
            yield pd.DataFrame(data)

    return regions.select("region_id", "wkb").mapInPandas(gen, schema)


# executor-local prepared-polygon cache (reference: prepared geometries,
# shapely/creation.py:735 — build once, reuse across batches/tasks). Used by
# the shuffle-join path, whose covers rows inline WKB; the broadcast path
# ships a prebuilt RaggedPolygonLayer instead and needs no executor cache.
_PREP_BY_WKB: dict[bytes, object] = {}


def _prepared_from_wkb(wkb: bytes):
    prep = _PREP_BY_WKB.get(wkb)
    if prep is None:
        from ..geo.kernels import PreparedPolygons
        from ..geo.wkb import from_wkb

        if len(_PREP_BY_WKB) > 4096:
            _PREP_BY_WKB.clear()
        prep = PreparedPolygons([from_wkb(wkb)])
        _PREP_BY_WKB[wkb] = prep
    return prep


def _group_ranges(codes: np.ndarray):
    """Yield (code, index_array) per distinct code via ONE stable argsort.
    A per-distinct-code boolean mask (`codes == u` in a loop) is
    O(batch × n_distinct) — with hundreds of regions touched per Arrow
    batch that scan dominated the refine kernel, not the geometry math."""
    if len(codes) == 0:
        return
    order = np.argsort(codes, kind="stable")
    sc = codes[order]
    cuts = np.flatnonzero(sc[1:] != sc[:-1]) + 1
    starts = np.concatenate(([0], cuts))
    ends = np.concatenate((cuts, [len(sc)]))
    for s, e in zip(starts, ends):
        yield sc[s], order[s:e]


def _classify_to_bool(cls: np.ndarray, predicate: str) -> np.ndarray:
    if predicate in ("intersects", "covered_by"):
        return cls >= 1
    if predicate == "within":
        return cls == 2
    return cls == 1  # touches


def spatial_join(
    points: DataFrame,
    regions: DataFrame,
    predicate: str = "intersects",
    res: int = JOIN_RES,
    broadcast: bool = True,
    point_cols: tuple[str, str] = ("lat", "lon"),
    cell_col_name: str = "__jcell",
) -> DataFrame:
    """points(…, lat, lon) ⋈ regions(region_id, wkb) → all point columns +
    region_id, one row per qualifying pair. The join key cell is always
    derived fresh from (lat, lon) at `res` (pure Catalyst arithmetic) so it
    never depends on — or clashes with — a storage-resolution cell column."""
    if predicate not in _PREDICATES:
        raise ValueError(
            f"predicate {predicate!r} is not a valid option for point-in-region "
            f"spatial_join; valid: {sorted(_PREDICATES)}"
        )
    lat_c, lon_c = point_cols
    drop_cell = cell_col_name not in points.columns
    if drop_cell:
        points = points.withColumn(cell_col_name, cell_col(F.col(lat_c), F.col(lon_c), res))

    if broadcast:
        # the whole region layer rides ONE torrent broadcast as a prebuilt
        # ragged edge structure (flat arrays + per-region offsets), built
        # driver-side from the rows we must collect anyway: workers pay zero
        # per-region construction, and the refine is one vectorized ray-cast
        # over every (candidate, edge) pair — no per-region Python dispatch.
        # (The old per-(bc,rid) prepared cache cost ~20 µs of dispatch per
        # distinct region per Arrow batch: fine at 1k regions where groups
        # are large, 100× the kernel cost at a 100k-region layer where each
        # batch holds ~1 candidate per region.)
        from ..geo.kernels import RaggedPolygonLayer
        from ..geo.wkb import from_wkb as _from_wkb

        geo_rows = regions.select("region_id", "wkb").collect()
        layer = RaggedPolygonLayer({
            int(r.region_id): _from_wkb(bytes(r.wkb))
            for r in geo_rows if r.wkb is not None and r.region_id >= 0
        })
        bc = points.sparkSession.sparkContext.broadcast(layer)
        covers = F.broadcast(
            covers_df(regions, res).select(
                F.col("region_id"),
                F.col("cell_id").alias("__cover_cell"),
                F.col("full").alias("__full"),
            )
        )

        @F.pandas_udf("boolean")
        def refine(rid: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
            # full-cell rows arrive with rid NULL-masked JVM-side (see the
            # single-plan filter below): first move is one vectorized null
            # mask, so bypass rows cost no kernel work and no dispatch.
            mask = rid.notna().to_numpy()
            out = np.zeros(len(rid), dtype=bool)
            if mask.any():
                cls = bc.value.classify_many(
                    rid[mask].to_numpy(dtype=np.int64),
                    lon[mask].to_numpy(dtype=np.float64),
                    lat[mask].to_numpy(dtype=np.float64),
                )
                out[mask] = _classify_to_bool(cls, predicate)
            return pd.Series(out)

        j = points.join(covers, points[cell_col_name] == covers["__cover_cell"], "inner")
        refine_call = refine(
            F.when(~F.col("__full"), F.col("region_id")), F.col(lon_c), F.col(lat_c))
    else:
        covers = covers_df(regions, res, with_wkb=True).select(
            F.col("region_id"),
            F.col("cell_id").alias("__cover_cell"),
            F.col("full").alias("__full"),
            F.col("wkb").alias("__wkb"),
        )

        @F.pandas_udf("boolean")
        def refine_wkb(wkb: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
            x = lon.to_numpy(dtype=np.float64)
            y = lat.to_numpy(dtype=np.float64)
            out = np.zeros(len(wkb), dtype=bool)
            codes, uniques = pd.factorize(wkb)
            for u_idx, idx in _group_ranges(codes):
                if u_idx < 0:  # factorize maps None/NaN to code -1
                    continue
                u_wkb = uniques[u_idx]
                if u_wkb is None:
                    continue
                prep = _prepared_from_wkb(bytes(u_wkb))
                out[idx] = _classify_to_bool(prep.classify(0, x[idx], y[idx]), predicate)
            return pd.Series(out)

        j = points.join(covers, points[cell_col_name] == covers["__cover_cell"], "inner")
        # covers_df inlines wkb=None on full cells, so __wkb is already the
        # NULL-mask: refine_wkb's factorize maps it to code -1 → False.
        refine_call = refine_wkb(F.col("__wkb"), F.col(lon_c), F.col(lat_c))

    # ONE plan, ONE pages scan. An earlier two-branch full/partial Union
    # re-ran the pages scan + geotag extraction once PER BRANCH (the
    # "union branches re-execute their whole upstream" trap — at 100 TB
    # that doubles the dominant scan cost). Instead full-cell rows bypass
    # via `__full | refine(NULL-fed args)`: the refine UDF's first move is
    # a vectorized null mask, so the bypass rows cost one Arrow transfer of
    # nulls, and the upstream runs once.
    #
    # Tradeoff, named: Spark evaluates a Python UDF for every row of the
    # filter's input (ExtractPythonUDFs hoists it out of the when-chain),
    # so full-cell candidates now ride the Arrow transfer (~24 B/row of
    # dense buffers even when null) where the old union emitted them pure
    # JVM. That is the right trade at scale — the duplicated scan+extract
    # the union paid grows with page SIZE (decode + regex over html),
    # while the bypass traffic is a fixed few bytes per candidate pair —
    # and it is why the benchmark leg got faster at every level while its
    # parallel fraction (and thus the naive speedup ratio) compressed.
    keep_cols = [c for c in points.columns if not (drop_cell and c == cell_col_name)]
    out_cols = [points[c] for c in keep_cols] + [covers["region_id"]]
    if predicate in _FULL_OK:
        cond = F.col("__full") | refine_call
    else:  # touches: full-interior cells can never touch the boundary
        cond = ~F.col("__full") & refine_call
    return j.where(cond).select(*out_cols)


_GEOM_BY_WKB: dict[bytes, object] = {}


def _geom_from_wkb_cached(wkb: bytes):
    """Executor-local parsed-geometry cache: a geometry that appears in
    many candidate pairs (or across batches/tasks) is decoded once."""
    g = _GEOM_BY_WKB.get(wkb)
    if g is None:
        from ..geo.wkb import from_wkb

        if len(_GEOM_BY_WKB) > 65536:
            _GEOM_BY_WKB.clear()
        g = from_wkb(wkb, on_invalid="ignore")
        _GEOM_BY_WKB[wkb] = g
    return g


# rect×rect predicates evaluable in closed form (exact — rectangle DE-9IM
# reduces to interval arithmetic; covers collinear-edge and corner touches
# that vertex/crossing heuristics miss). A/B are (n,4) [x0,y0,x1,y1] arrays.
def _rect_pair_eval(predicate: str, A: np.ndarray, B: np.ndarray) -> np.ndarray | None:
    closed = (
        (A[:, 0] <= B[:, 2]) & (B[:, 0] <= A[:, 2])
        & (A[:, 1] <= B[:, 3]) & (B[:, 1] <= A[:, 3])
    )
    interiors = (
        (A[:, 0] < B[:, 2]) & (B[:, 0] < A[:, 2])
        & (A[:, 1] < B[:, 3]) & (B[:, 1] < A[:, 3])
    )
    a_in_b = (
        (A[:, 0] >= B[:, 0]) & (A[:, 2] <= B[:, 2])
        & (A[:, 1] >= B[:, 1]) & (A[:, 3] <= B[:, 3])
    )
    b_in_a = (
        (B[:, 0] >= A[:, 0]) & (B[:, 2] <= A[:, 2])
        & (B[:, 1] >= A[:, 1]) & (B[:, 3] <= A[:, 3])
    )
    if predicate == "intersects":
        return closed
    if predicate == "disjoint":
        return ~closed
    if predicate in ("within", "covered_by"):
        return a_in_b  # positive-extent rects: containment ⇒ interior overlap
    if predicate in ("contains", "covers"):
        return b_in_a
    if predicate == "contains_properly":
        return (
            (B[:, 0] > A[:, 0]) & (B[:, 2] < A[:, 2])
            & (B[:, 1] > A[:, 1]) & (B[:, 3] < A[:, 3])
        )
    if predicate == "touches":
        return closed & ~interiors
    if predicate == "equals":
        return (A == B).all(axis=1)
    if predicate == "overlaps":
        return interiors & ~a_in_b & ~b_in_a
    return None


def _pair_refine_batch(
    predicate: str, lwkb: pd.Series, rcodes: np.ndarray, runiq_geoms: list
) -> np.ndarray:
    """Batch refine for candidate (left_geom, right_geom) pairs. Both sides
    factorized; each unique geometry is parsed ONCE per batch (and cached
    per executor across batches). Stages, in decreasing vectorization:

    1. one-shot NumPy bbox mask over the whole batch (bbox-disjoint ⇒ every
       supported predicate is False — no per-pair Python);
    2. point-left × polygon-right: prepared point-in-polygon classify per
       right group (one vectorized call per right geometry);
    3. rect×rect pairs: closed-form interval arithmetic for the whole
       sub-batch at once (exact, incl. collinear-edge/corner touches);
    4. remainder: exact scalar kernel per pair, iterated grouped by right
       code so each right geometry's derived state stays cache-hot.

    runiq_geoms: parsed Geometry (or None) per unique right code;
    rcodes: per-row right code (-1 = null)."""
    from ..geo import kernels as K
    from ..geo.geom import MULTIPOLYGON, POINT, POLYGON

    fn = getattr(K, predicate)
    n = len(lwkb)
    out = np.zeros(n, dtype=bool)
    lcodes, luniq = pd.factorize(lwkb)
    lgeoms = [None if w is None else _geom_from_wkb_cached(bytes(w)) for w in luniq]

    def _bounds_arr(geoms) -> np.ndarray:
        arr = np.full((max(len(geoms), 1), 4), np.nan)
        for i, g in enumerate(geoms):
            if g is not None and not g.is_empty:
                arr[i] = K.bounds(g)
        return arr

    LB, RB = _bounds_arr(lgeoms), _bounds_arr(runiq_geoms)
    lc = np.asarray(lcodes, dtype=np.int64)
    rc = np.asarray(rcodes, dtype=np.int64)
    valid = (lc >= 0) & (rc >= 0)
    lci, rci = np.where(valid, lc, 0), np.where(valid, rc, 0)
    lb, rb = LB[lci], RB[rci]
    alive = (
        valid
        & ~np.isnan(lb[:, 0]) & ~np.isnan(rb[:, 0])
        & ~((lb[:, 0] > rb[:, 2]) | (lb[:, 2] < rb[:, 0])
            | (lb[:, 1] > rb[:, 3]) | (lb[:, 3] < rb[:, 1]))
    )
    if not alive.any():
        return out

    all_points = bool(len(lgeoms)) and all(
        g is not None and g.type_id == POINT and not g.is_empty for g in lgeoms
    )
    all_rpoly = all(
        g is None or g.type_id in (POLYGON, MULTIPOLYGON) for g in runiq_geoms
    )
    if all_points and all_rpoly and predicate in _PREDICATES:
        px = np.array([g.coords[0][0] for g in lgeoms])[lc]
        py = np.array([g.coords[0][1] for g in lgeoms])[lc]
        alive_idx = np.flatnonzero(alive)
        for u, gi in _group_ranges(rc[alive_idx]):
            if runiq_geoms[u] is None:
                continue
            sel = alive_idx[gi]
            prep = K.PreparedPolygons([runiq_geoms[u]])
            out[sel] = _classify_to_bool(prep.classify(0, px[sel], py[sel]), predicate)
        return out

    # rect×rect sub-batch, closed form
    lrect = np.full((len(lgeoms), 4), np.nan)
    for i, g in enumerate(lgeoms):
        r = K._axis_rect(g) if g is not None and g.type_id == POLYGON else None
        if r is not None:
            lrect[i] = r
    rrect = np.full((max(len(runiq_geoms), 1), 4), np.nan)
    for i, g in enumerate(runiq_geoms):
        r = K._axis_rect(g) if g is not None and g.type_id == POLYGON else None
        if r is not None:
            rrect[i] = r
    A, B = lrect[lci], rrect[rci]
    rect_rows = alive & ~np.isnan(A[:, 0]) & ~np.isnan(B[:, 0])
    remainder = alive & ~rect_rows
    if rect_rows.any():
        res = _rect_pair_eval(predicate, A[rect_rows], B[rect_rows])
        if res is not None:
            out[rect_rows] = res
        else:
            remainder = alive  # predicate has no closed form; scalar everything

    # group-vectorized kernel for the rest, grouped by right code — ONE
    # stacked NumPy cascade per right geometry for every supported
    # predicate (geo/group_predicates.py, r5; intersects was the first,
    # kernels.group_intersects r4). Per-pair scalar dispatch remains only
    # for batch shapes the group kernel declines (non-areal right,
    # GeometryCollection lefts handled inside it).
    from ..geo.group_predicates import group_predicate

    idx = np.nonzero(remainder)[0]
    if len(idx):
        for u, gi in _group_ranges(rc[idx]):
            rg = runiq_geoms[u]
            if rg is None:
                continue
            sel = idx[gi]
            batch = [lgeoms[lc[i]] for i in sel]
            res = group_predicate(predicate, batch, rg)
            if res is None:
                res = np.fromiter(
                    (g is not None and bool(fn(g, rg)) for g in batch),
                    dtype=bool, count=len(batch))
            out[sel] = res
    return out


def _rect_pred_col(predicate: str):
    """Closed-form rect×rect predicate as a pure Catalyst expression over
    the two bbox column sets — the JVM twin of _rect_pair_eval (an
    axis-aligned rectangle IS its bbox). Returns None when the predicate
    has no closed form (those rows route to the Python refine)."""
    lx, ly, lx2, ly2 = (F.col(c) for c in ("__lx", "__ly", "__lx2", "__ly2"))
    rx, ry, rx2, ry2 = (F.col(c) for c in ("__rx", "__ry", "__rx2", "__ry2"))
    closed = (lx <= rx2) & (rx <= lx2) & (ly <= ry2) & (ry <= ly2)
    interiors = (lx < rx2) & (rx < lx2) & (ly < ry2) & (ry < ly2)
    a_in_b = (lx >= rx) & (lx2 <= rx2) & (ly >= ry) & (ly2 <= ry2)
    b_in_a = (rx >= lx) & (rx2 <= lx2) & (ry >= ly) & (ry2 <= ly2)
    if predicate == "intersects":
        return closed
    if predicate in ("within", "covered_by"):
        return a_in_b
    if predicate in ("contains", "covers"):
        return b_in_a
    if predicate == "contains_properly":
        return (rx > lx) & (rx2 < lx2) & (ry > ly) & (ry2 < ly2)
    if predicate == "touches":
        return closed & ~interiors
    if predicate == "equals":
        return (lx == rx) & (ly == ry) & (lx2 == rx2) & (ly2 == ry2)
    if predicate == "overlaps":
        return interiors & ~a_in_b & ~b_in_a
    return None  # e.g. crosses (always False rect×rect but dim-dependent)


# predicates spatial_join_geom supports: every one implies the pair shares
# a point (or, for touches/equals/overlaps, overlapping bboxes), so the
# JVM bbox-overlap prefilter below is semantics-preserving. `disjoint` is
# rejected: a cell-cover join only ever SEES bbox-nearby candidates, so a
# disjoint join would silently return near-misses only.
_GEOM_JOIN_PREDICATES = {
    "intersects", "within", "covered_by", "contains", "covers",
    "contains_properly", "touches", "equals", "overlaps", "crosses",
}


def spatial_join_geom(
    left: DataFrame,
    right: DataFrame,
    predicate: str = "intersects",
    res: int = JOIN_RES - 2,
    left_id: str = "left_id",
    right_id: str = "region_id",
    broadcast: bool = True,
) -> DataFrame:
    """Geometry×geometry spatial join: left(left_id, wkb) ⋈ right(right_id,
    wkb) → (left_id, right_id) pairs satisfying the predicate.

    Semantics: STRtree.query(geoms, predicate) pair semantics generalized
    to arbitrary geometry on BOTH sides (shapely/strtree.py:229-266) —
    point-side joins should use spatial_join (cheaper: no left geometry).

    Plan: both sides explode to their bbox cell covers at `res`; equi-join
    on cell. A pair that shares k cells would appear k times, so each
    candidate is emitted only in ONE deterministic cell — the cell of the
    lower-left corner of the bbox intersection (computable from the two
    bbox columns JVM-side, no dedup shuffle). Refine runs the exact
    DE-9IM kernel per pair with the right-side geometries broadcast.
    """
    from ..index.cells import cover_bbox_batch, grid_n

    if predicate not in _GEOM_JOIN_PREDICATES:
        raise ValueError(
            f"predicate {predicate!r} is not supported by spatial_join_geom; "
            f"valid: {sorted(_GEOM_JOIN_PREDICATES)}")
    n = grid_n(res)

    def covers(df: DataFrame, id_col: str, with_wkb: bool) -> DataFrame:
        schema = (f"{id_col} long, cell_id long, bxmin double, bymin double,"
                  " bxmax double, bymax double, is_rect boolean")
        if with_wkb:
            schema += ", wkb binary"

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from ..geo import kernels as K
            from ..geo.wkb import from_wkb

            for pdf in batches:
                # per-geometry work: parse + bounds + axis-rect flag only;
                # the cell cover and the fan-out are one vectorized pass
                m = len(pdf)
                bnds = np.full((m, 4), np.nan)
                rect = np.zeros(m, dtype=bool)
                wkbs = pdf["wkb"]
                for i, b in enumerate(wkbs):
                    if b is None:
                        continue
                    g = from_wkb(bytes(b), on_invalid="ignore")
                    if g is not None and not g.is_empty:
                        bnds[i] = K.bounds(g)
                        # an axis-aligned rectangle IS its bbox, so the
                        # bbox columns drive the closed-form JVM predicate
                        rect[i] = (g.type_id == 3
                                   and K._axis_rect(g) is not None)
                ok = ~np.isnan(bnds[:, 0])
                cells, row = cover_bbox_batch(bnds[ok], res)
                src = np.nonzero(ok)[0][row]
                data = {
                    id_col: pd.Series(
                        pdf[id_col].to_numpy(dtype=np.int64)[src], dtype="int64"),
                    "cell_id": pd.Series(cells, dtype="int64"),
                    "bxmin": pd.Series(bnds[src, 0], dtype="float64"),
                    "bymin": pd.Series(bnds[src, 1], dtype="float64"),
                    "bxmax": pd.Series(bnds[src, 2], dtype="float64"),
                    "bymax": pd.Series(bnds[src, 3], dtype="float64"),
                    "is_rect": pd.Series(rect[src], dtype="bool"),
                }
                if with_wkb:
                    data["wkb"] = pd.Series(
                        [bytes(wkbs.iloc[k]) for k in src], dtype="object")
                yield pd.DataFrame(data)

        return df.select(id_col, "wkb").mapInPandas(gen, schema)

    lcov = covers(left, left_id, with_wkb=True).select(
        F.col(left_id), F.col("cell_id").alias("__lc"),
        F.col("bxmin").alias("__lx"), F.col("bymin").alias("__ly"),
        F.col("bxmax").alias("__lx2"), F.col("bymax").alias("__ly2"),
        F.col("is_rect").alias("__lrect"),
        F.col("wkb").alias("__lwkb"),
    )
    rcov = covers(right, right_id, with_wkb=not broadcast)
    rcols = [
        F.col(right_id), F.col("cell_id").alias("__rc"),
        F.col("bxmin").alias("__rx"), F.col("bymin").alias("__ry"),
        F.col("bxmax").alias("__rx2"), F.col("bymax").alias("__ry2"),
        F.col("is_rect").alias("__rrect"),
    ]
    if not broadcast:
        rcols.append(F.col("wkb").alias("__rwkb"))
    rcov = rcov.select(*rcols)
    if broadcast:
        rcov = F.broadcast(rcov)
        # geometry dict rides a torrent broadcast; the join moves only ints
        geo_rows = right.select(right_id, "wkb").collect()
        bc = left.sparkSession.sparkContext.broadcast(
            {int(r[0]): bytes(r[1]) for r in geo_rows if r[1] is not None}
        )

    j = lcov.join(rcov, F.col("__lc") == F.col("__rc"), "inner")
    # emit each candidate pair exactly once: in the cell holding the
    # lower-left corner of the bbox intersection (cell arithmetic mirrors
    # columns.cell_col)
    ix = F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor(
        (F.greatest("__lx", "__rx") + 180.0) / 360.0 * n)))
    iy = F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor(
        (F.greatest("__ly", "__ry") + 90.0) / 180.0 * n)))
    j = j.where(F.col("__lc") == (iy * n + ix).cast("bigint"))
    # JVM bbox-overlap prefilter: bbox-disjoint candidates are False under
    # every supported predicate — they never reach the Python refine
    j = j.where(
        (F.col("__lx") <= F.col("__rx2")) & (F.col("__rx") <= F.col("__lx2"))
        & (F.col("__ly") <= F.col("__ry2")) & (F.col("__ry") <= F.col("__ly2"))
    )

    if broadcast:

        @F.pandas_udf("boolean")
        def refine(rid: pd.Series, lwkb: pd.Series) -> pd.Series:
            rcodes, runiq = pd.factorize(rid)
            runiq_geoms = []
            for u in runiq:
                w = bc.value.get(int(u))
                runiq_geoms.append(None if w is None else _geom_from_wkb_cached(w))
            return pd.Series(_pair_refine_batch(predicate, lwkb, rcodes, runiq_geoms))

        refine_call = refine(F.col(right_id), F.col("__lwkb"))
    else:

        @F.pandas_udf("boolean")
        def refine_wkb(rwkb: pd.Series, lwkb: pd.Series) -> pd.Series:
            rcodes, runiq = pd.factorize(rwkb)
            runiq_geoms = [
                None if w is None else _geom_from_wkb_cached(bytes(w)) for w in runiq
            ]
            return pd.Series(_pair_refine_batch(predicate, lwkb, rcodes, runiq_geoms))

        refine_call = refine_wkb(F.col("__rwkb"), F.col("__lwkb"))

    # rect×rect rows are decided by pure-JVM interval arithmetic and ship
    # NULL into the refine UDF (no geometry bytes over Arrow, no kernel
    # work — _pair_refine_batch returns False for null rows in one
    # vectorized mask). ONE scan: an earlier two-branch union re-executed
    # the whole cover fan-out per branch, which at 100 TB doubles the
    # dominant cost (measured 6.6 s → 3.7 s on the all-non-rect n-gon
    # battery query, and strictly less work for mixed layers).
    rect_expr = _rect_pred_col(predicate)
    if rect_expr is not None:
        both_rect = F.col("__lrect") & F.col("__rrect")
        if broadcast:
            py_call = refine(
                F.when(~both_rect, F.col(right_id)),
                F.when(~both_rect, F.col("__lwkb")))
        else:
            py_call = refine_wkb(
                F.when(~both_rect, F.col("__rwkb")),
                F.when(~both_rect, F.col("__lwkb")))
        return j.where(
            (both_rect & rect_expr) | (~both_rect & py_call)
        ).select(left_id, right_id)
    return j.where(refine_call).select(left_id, right_id)
