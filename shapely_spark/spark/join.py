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


# executor-local prepared-polygon caches (reference: prepared geometries,
# shapely/creation.py:735 — build once, reuse across batches/tasks)
_PREP_BY_WKB: dict[bytes, object] = {}
_PREP_BY_RID: dict[tuple[int, int], object] = {}


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


def _prepared_from_bc(bc, bc_id: int, rid: int):
    key = (bc_id, rid)
    prep = _PREP_BY_RID.get(key)
    if prep is None:
        from ..geo.kernels import PreparedPolygons
        from ..geo.wkb import from_wkb

        if len(_PREP_BY_RID) > 1_000_000:
            _PREP_BY_RID.clear()
        prep = PreparedPolygons([from_wkb(bc.value[rid])])
        _PREP_BY_RID[key] = prep
    return prep


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
        # geometry dict rides a torrent broadcast once; covers stay integer
        geo_rows = regions.select("region_id", "wkb").collect()
        bc = points.sparkSession.sparkContext.broadcast(
            {int(r.region_id): bytes(r.wkb) for r in geo_rows if r.wkb is not None}
        )
        import uuid

        bc_id = uuid.uuid4().int & 0xFFFFFFFF  # executor cache namespace
        covers = F.broadcast(
            covers_df(regions, res).select(
                F.col("region_id"),
                F.col("cell_id").alias("__cover_cell"),
                F.col("full").alias("__full"),
            )
        )

        @F.pandas_udf("boolean")
        def refine(rid: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
            x = lon.to_numpy(dtype=np.float64)
            y = lat.to_numpy(dtype=np.float64)
            out = np.zeros(len(rid), dtype=bool)
            rids = rid.to_numpy(dtype=np.int64)
            for u in np.unique(rids):
                sel = rids == u
                prep = _prepared_from_bc(bc, bc_id, int(u))
                out[sel] = _classify_to_bool(prep.classify(0, x[sel], y[sel]), predicate)
            return pd.Series(out)

        j = points.join(covers, points[cell_col_name] == covers["__cover_cell"], "inner")
        refine_call = refine(F.col("region_id"), F.col(lon_c), F.col(lat_c))
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
            for u_idx, u_wkb in enumerate(uniques):
                if u_wkb is None:
                    continue
                sel = codes == u_idx
                prep = _prepared_from_wkb(bytes(u_wkb))
                out[sel] = _classify_to_bool(prep.classify(0, x[sel], y[sel]), predicate)
            return pd.Series(out)

        j = points.join(covers, points[cell_col_name] == covers["__cover_cell"], "inner")
        refine_call = refine_wkb(F.col("__wkb"), F.col(lon_c), F.col(lat_c))

    # split so the refine UDF only ever sees partial-cell rows (no reliance
    # on boolean short-circuiting, which Catalyst does not guarantee for UDFs)
    keep_cols = [c for c in points.columns if not (drop_cell and c == cell_col_name)]
    out_cols = [points[c] for c in keep_cols] + [covers["region_id"]]
    partial = j.where(~F.col("__full")).where(refine_call).select(*out_cols)
    if predicate in _FULL_OK:
        full = j.where(F.col("__full")).select(*out_cols)
        return full.unionByName(partial)
    return partial  # touches: full-interior cells can never touch the boundary


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


def _pair_refine_batch(
    predicate: str, lwkb: pd.Series, rcodes: np.ndarray, runiq_geoms: list
) -> np.ndarray:
    """Batch refine for candidate (left_geom, right_geom) pairs: both sides
    factorized, each unique geometry parsed ONCE per batch (and cached per
    executor across batches), bbox short-circuit before any kernel call,
    vectorized prepared point-in-polygon when the left side is all points,
    per-pair kernel call otherwise. runiq_geoms: parsed Geometry (or None)
    per unique right code; rcodes: per-row right code (-1 = null)."""
    from ..geo import kernels as K
    from ..geo.geom import POINT

    fn = getattr(K, predicate)
    n = len(lwkb)
    out = np.zeros(n, dtype=bool)
    lcodes, luniq = pd.factorize(lwkb)
    lgeoms = [None if w is None else _geom_from_wkb_cached(bytes(w)) for w in luniq]
    lbounds = [None if g is None or g.is_empty else K.bounds(g) for g in lgeoms]
    rbounds = [None if g is None or g.is_empty else K.bounds(g) for g in runiq_geoms]
    from ..geo.geom import MULTIPOLYGON, POLYGON

    all_points = bool(len(lgeoms)) and all(
        g is not None and g.type_id == POINT and not g.is_empty for g in lgeoms
    )
    all_rpoly = all(
        g is None or g.type_id in (POLYGON, MULTIPOLYGON) for g in runiq_geoms
    )
    if all_points and all_rpoly and predicate in _PREDICATES:
        px = np.array([g.coords[0][0] for g in lgeoms])[lcodes]
        py = np.array([g.coords[0][1] for g in lgeoms])[lcodes]
        for u in np.unique(rcodes):
            if u < 0 or runiq_geoms[u] is None:
                continue
            sel = np.nonzero(rcodes == u)[0]
            prep = K.PreparedPolygons([runiq_geoms[u]])
            out[sel] = _classify_to_bool(prep.classify(0, px[sel], py[sel]), predicate)
        return out
    for i in range(n):
        lc, rc = lcodes[i], rcodes[i]
        if lc < 0 or rc < 0:
            continue
        lg, rg = lgeoms[lc], runiq_geoms[rc]
        lb, rb = lbounds[lc], rbounds[rc]
        if lg is None or rg is None or lb is None or rb is None:
            continue
        if lb[0] > rb[2] or lb[2] < rb[0] or lb[1] > rb[3] or lb[3] < rb[1]:
            continue  # bbox-disjoint ⇒ every supported predicate is False
        out[i] = bool(fn(lg, rg))
    return out


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
    from ..index.cells import cover_bbox, grid_n

    n = grid_n(res)

    def covers(df: DataFrame, id_col: str, with_wkb: bool) -> DataFrame:
        schema = f"{id_col} long, cell_id long, bxmin double, bymin double"
        if with_wkb:
            schema += ", wkb binary"

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from ..geo import kernels as K
            from ..geo.wkb import from_wkb

            for pdf in batches:
                ids, cells, bx, by, wk = [], [], [], [], []
                for i, b in zip(pdf[id_col], pdf["wkb"]):
                    g = from_wkb(bytes(b), on_invalid="ignore") if b is not None else None
                    if g is None or g.is_empty:
                        continue
                    bb = K.bounds(g)
                    cc = cover_bbox(bb[0], bb[1], bb[2], bb[3], res)
                    for c in cc.tolist():
                        ids.append(i)
                        cells.append(c)
                        bx.append(bb[0])
                        by.append(bb[1])
                        if with_wkb:
                            wk.append(bytes(b))
                data = {
                    id_col: pd.Series(ids, dtype="int64"),
                    "cell_id": pd.Series(cells, dtype="int64"),
                    "bxmin": pd.Series(bx, dtype="float64"),
                    "bymin": pd.Series(by, dtype="float64"),
                }
                if with_wkb:
                    data["wkb"] = pd.Series(wk, dtype="object")
                yield pd.DataFrame(data)

        return df.select(id_col, "wkb").mapInPandas(gen, schema)

    lcov = covers(left, left_id, with_wkb=True).select(
        F.col(left_id), F.col("cell_id").alias("__lc"),
        F.col("bxmin").alias("__lx"), F.col("bymin").alias("__ly"),
        F.col("wkb").alias("__lwkb"),
    )
    rcov = covers(right, right_id, with_wkb=not broadcast)
    rcols = [
        F.col(right_id), F.col("cell_id").alias("__rc"),
        F.col("bxmin").alias("__rx"), F.col("bymin").alias("__ry"),
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

    return j.where(refine_call).select(left_id, right_id)
