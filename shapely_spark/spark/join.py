"""Spatial join: pages (points) ⋈ regions (polygons) — the engine's core plan.

Semantics pinned to STRtree.query(points, predicate=...) inner-join pair
semantics (shapely/strtree.py:229-266): output = every (point, region) pair
satisfying the predicate; points with NULL coordinates drop out (the
reference skips None/empty inputs, strtree.py:376).

The Spark plan (SURVEY.md §3.3):

  regions ──mapInPandas──▶ covers(region_id, cell_id, full, wkb?)   [fan-out]
  pages ──withColumn(cell_id)──▶ ⋈ covers ON cell_id                [equi-join,
                                                                broadcast or shuffle]
  full cells ──▶ emit directly (cell entirely inside the polygon —
                 the broadcast-side analog of prepared-containment)
  partial cells ──▶ pandas-UDF refine: exact point-in-polygon kernel,
                    polygon parsed once per executor per region (WKB-keyed
                    cache = prepared geometry, shapely/creation.py:735)

At scale: the covers table is tiny relative to pages (|regions| × avg-cover),
so Catalyst picks a broadcast hash join — no shuffle of the pages side at
all. For huge region layers pass broadcast=False → sort-merge join on
cell_id with AQE skew splitting; hot cells can additionally be salted.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.cells import DEFAULT_RES, polygon_cover
from .columns import cell_col

_COVERS_SCHEMA = "region_id long, cell_id long, full boolean, wkb binary"

# Map engine predicates (evaluated as predicate(point, region), matching
# STRtree.query(points, predicate)) to the point-classification test.
#   intersects / covered_by: interior or boundary
#   within: interior only (DE-9IM T*F**F***, predicates.py:1013)
#   touches: boundary only (predicates.py:968)
_PREDICATES = {"intersects", "within", "covered_by", "touches"}
# predicates where a fully-interior cell short-circuits to True
_FULL_OK = {"intersects", "within", "covered_by"}


def covers_df(regions: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """regions(region_id, wkb) → exploded cell cover. Distributed fan-out
    (mapInPandas) — each region row yields its cover cells; partial cells
    carry the region WKB so the refine stage needs no second join."""

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
                    wkbs.append(None if f else bytes(wkb))
            yield pd.DataFrame(
                {"region_id": pd.Series(rids, dtype="int64"),
                 "cell_id": pd.Series(cids, dtype="int64"),
                 "full": pd.Series(fulls, dtype="bool"),
                 "wkb": pd.Series(wkbs, dtype="object")}
            )

    return regions.select("region_id", "wkb").mapInPandas(gen, _COVERS_SCHEMA)


# executor-local prepared-polygon cache (reference: prepared geometries,
# shapely/creation.py:735 — build once, reuse across batches)
_PREP_CACHE: dict[bytes, object] = {}


def _prepared(wkb: bytes):
    prep = _PREP_CACHE.get(wkb)
    if prep is None:
        from ..geo.kernels import PreparedPolygons
        from ..geo.wkb import from_wkb

        if len(_PREP_CACHE) > 4096:  # bound executor memory
            _PREP_CACHE.clear()
        prep = PreparedPolygons([from_wkb(wkb)])
        _PREP_CACHE[wkb] = prep
    return prep


def _make_refine_udf(predicate: str):
    @F.pandas_udf("boolean")
    def refine(wkb: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        x = lon.to_numpy(dtype=np.float64)
        y = lat.to_numpy(dtype=np.float64)
        out = np.zeros(len(wkb), dtype=bool)
        # vectorize per distinct region within the Arrow batch
        codes, uniques = pd.factorize(wkb)
        for u_idx, u_wkb in enumerate(uniques):
            sel = codes == u_idx
            if u_wkb is None:
                continue
            prep = _prepared(bytes(u_wkb))
            cls = prep.classify(0, x[sel], y[sel])
            if predicate in ("intersects", "covered_by"):
                out[sel] = cls >= 1
            elif predicate == "within":
                out[sel] = cls == 2
            else:  # touches
                out[sel] = cls == 1
        return pd.Series(out)

    return refine


def spatial_join(
    points: DataFrame,
    regions: DataFrame,
    predicate: str = "intersects",
    res: int = DEFAULT_RES,
    broadcast: bool = True,
    point_cols: tuple[str, str] = ("lat", "lon"),
    cell_col_name: str = "cell_id",
) -> DataFrame:
    """points(…, lat, lon[, cell_id]) ⋈ regions(region_id, wkb) → all point
    columns + region_id, one row per qualifying pair."""
    if predicate not in _PREDICATES:
        raise ValueError(
            f"predicate {predicate!r} is not a valid option for point-in-region "
            f"spatial_join; valid: {sorted(_PREDICATES)}"
        )
    lat_c, lon_c = point_cols
    if cell_col_name not in points.columns:
        points = points.withColumn(cell_col_name, cell_col(F.col(lat_c), F.col(lon_c), res))
    covers = covers_df(regions, res).select(
        F.col("region_id"),
        F.col("cell_id").alias("__cover_cell"),
        F.col("full").alias("__full"),
        F.col("wkb").alias("__wkb"),
    )
    if broadcast:
        covers = F.broadcast(covers)
    j = points.join(covers, points[cell_col_name] == covers["__cover_cell"], "inner")
    refine = _make_refine_udf(predicate)
    if predicate in _FULL_OK:
        cond = F.col("__full") | refine(F.col("__wkb"), F.col(lon_c), F.col(lat_c))
    else:  # touches: full-interior cells can never touch the boundary
        cond = (~F.col("__full")) & refine(F.col("__wkb"), F.col(lon_c), F.col(lat_c))
    out_cols = [points[c] for c in points.columns] + [covers["region_id"]]
    return j.where(cond).select(*out_cols)
