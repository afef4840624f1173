"""GeoParquet 1.1 sink/source — the standard interop format for geometry
columns in parquet (OGC GeoParquet spec; the geopandas
``to_parquet``/``read_parquet`` counterpart for this engine's WKB columns).

The reference library itself stops at WKB/WKT codecs; GeoParquet is the
file-format layer a user switching from the geopandas+shapely stack
expects on top of them (geopandas.io.arrow writes the same ``geo``
footer metadata around shapely-encoded WKB — semantics per the public
spec, implementation is this engine's own).

Design for 10^12 rows:

- The WRITE is ``mapInPandas``: each Spark partition becomes exactly one
  parquet file written by that executor with pyarrow (no driver
  collect). The ``geo`` footer metadata is computed per file from the
  rows it holds (per-file bbox + geometry_types), so every file is a
  self-describing GeoParquet 1.1 file.
- A ``bbox`` covering column (struct<xmin,ymin,xmax,ymax>, GeoParquet
  1.1 §covering) is added by default. Parquet keeps row-group min/max
  statistics on its leaves, and Spark's nested-field predicate pushdown
  (enabled for parquet by default) turns a window filter on the bbox
  fields into row-group pruning at scan time — the scan skips row
  groups whose bbox stats cannot intersect the query window, the same
  pruning geopandas/GDAL get from the covering. ``bbox_filter_col``
  builds that pushdown-able predicate.
- The returned manifest is one row per written file (file, rows, bbox)
  — at cluster scale this is one small row per task, the natural input
  for a table-format commit (e.g. an Iceberg append of data files with
  per-file stats).
- The READ is a plain ``spark.read.parquet`` (vectorized scan, pruning
  via the covering) plus a footer-metadata parse of ONE file with
  pyarrow driver-side.

No part of this module shuffles; write cost is the parquet encode
itself, read cost is the pruned scan.
"""

from __future__ import annotations

import json
import os
import struct

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

GEOPARQUET_VERSION = "1.1.0"

# WKB geometry type code (mod 1000 strips the ISO Z/M blocks) -> name
_WKB_TYPE_NAMES = {
    1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
    5: "MultiLineString", 6: "MultiPolygon", 7: "GeometryCollection",
}

_BBOX_DT = "xmin double, ymin double, xmax double, ymax double"
_MANIFEST_DT = ("file string, rows long, xmin double, ymin double, "
                "xmax double, ymax double")


def _wkb_type_name(b: bytes) -> str | None:
    """Geometry type name from the first 5 WKB bytes (no full parse)."""
    if b is None or len(b) < 5:
        return None
    code = struct.unpack("<I" if b[0] == 1 else ">I", b[1:5])[0]
    # ISO type blocks: +1000 Z, +2000 M, +3000 ZM; EWKB uses flag bits
    flags = code & 0xE0000000
    base = code & 0x1FFFFFFF
    name = _WKB_TYPE_NAMES.get(base % 1000 if base < 4000 else 0)
    if name is None:
        return None
    if base >= 3000 or flags == 0xC0000000:
        return name + " ZM"
    if 1000 <= base < 2000 or flags & 0x80000000:
        return name + " Z"
    if 2000 <= base < 3000 or flags & 0x40000000:
        return name + " M"
    return name


def bbox_struct_col(geom_col: Column) -> Column:
    """WKB -> struct<xmin,ymin,xmax,ymax> (the GeoParquet 1.1 covering
    column). Arrow-batched; NULL/empty geometries produce all-NULL
    fields, which parquet min/max stats ignore so pruning stays tight."""

    @F.pandas_udf(_BBOX_DT)
    def _bb(wkb: pd.Series) -> pd.DataFrame:
        import numpy as np

        from ..geo import kernels as K
        from ..geo.wkb import from_wkb_batch

        geoms = from_wkb_batch(wkb)
        out = np.full((len(geoms), 4), np.nan)
        for i, g in enumerate(geoms):
            if g is not None:
                b = K.bounds(g)
                if b[0] == b[0]:  # skip all-NaN empty bounds
                    out[i] = b
        return pd.DataFrame(
            {"xmin": out[:, 0], "ymin": out[:, 1],
             "xmax": out[:, 2], "ymax": out[:, 3]})

    return _bb(geom_col)


def bbox_filter_col(xmin: float, ymin: float, xmax: float, ymax: float,
                    bbox_col: str = "bbox") -> Column:
    """Window-intersects predicate over the covering column. Plain
    nested-field comparisons, so Spark pushes them into the parquet scan
    (PushedFilters on bbox.xmin/…) and row groups outside the window are
    pruned by their min/max stats. Exact per the covering: a geometry
    intersects the window only if its bbox does; refine with an exact
    predicate kernel afterwards when box-overlap is not the final
    answer."""
    c = F.col(bbox_col)
    return ((c["xmin"] <= F.lit(xmax)) & (c["xmax"] >= F.lit(xmin))
            & (c["ymin"] <= F.lit(ymax)) & (c["ymax"] >= F.lit(ymin)))


def _geo_meta(geometry_col: str, types: list[str], bbox, crs) -> dict:
    col = {"encoding": "WKB", "geometry_types": sorted(types)}
    if bbox is not None:
        col["bbox"] = [float(v) for v in bbox]
    col["covering"] = {"bbox": {k: ["bbox", k]
                                for k in ("xmin", "ymin", "xmax", "ymax")}}
    if crs is not None:
        col["crs"] = crs
    return {"version": GEOPARQUET_VERSION,
            "primary_column": geometry_col,
            "columns": {geometry_col: col}}


def write_geoparquet(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
    crs: dict | None = None,
    add_bbox: bool = True,
) -> list:
    """Write ``df`` as a directory of GeoParquet 1.1 files, one file per
    Spark partition, each with its own ``geo`` footer metadata (per-file
    bbox + geometry_types) and — with ``add_bbox`` — the bbox covering
    column for scan-time row-group pruning.

    Returns the manifest: one Row per written file (file, rows, xmin,
    ymin, xmax, ymax). The write is executor-side pyarrow; the only
    driver traffic is the manifest (one row per task)."""
    if geometry_col not in df.columns:
        raise ValueError(f"no column {geometry_col!r} in {df.columns}")
    os.makedirs(path, exist_ok=True)
    if add_bbox and "bbox" not in df.columns:
        df = df.withColumn("bbox", bbox_struct_col(F.col(geometry_col)))

    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(df.schema)
    gcol = geometry_col

    def _write(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        t = pa.concat_tables(
            [pa.Table.from_pandas(p, schema=arrow_schema,
                                  preserve_index=False) for p in pdfs])
        types = set()
        for b in t.column(gcol).to_pylist():
            n = _wkb_type_name(b)
            if n:
                types.add(n)
        bbox = None
        if "bbox" in t.column_names:
            import pyarrow.compute as pc

            bb = t.column("bbox")
            mins = [pc.min(bb.combine_chunks().field(k)).as_py()
                    for k in ("xmin", "ymin")]
            maxs = [pc.max(bb.combine_chunks().field(k)).as_py()
                    for k in ("xmax", "ymax")]
            if mins[0] is not None:
                bbox = [mins[0], mins[1], maxs[0], maxs[1]]
        meta = dict(t.schema.metadata or {})
        meta[b"geo"] = json.dumps(
            _geo_meta(gcol, list(types), bbox, crs)).encode()
        t = t.replace_schema_metadata(meta)
        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}.parquet"
        pq.write_table(t, os.path.join(path, fname))
        yield pd.DataFrame(
            {"file": [fname], "rows": [t.num_rows],
             "xmin": [None if bbox is None else bbox[0]],
             "ymin": [None if bbox is None else bbox[1]],
             "xmax": [None if bbox is None else bbox[2]],
             "ymax": [None if bbox is None else bbox[3]]})

    return df.mapInPandas(_write, _MANIFEST_DT).collect()


def geoparquet_metadata(path: str) -> dict:
    """Parse the ``geo`` footer metadata of one file in ``path``."""
    import pyarrow.parquet as pq

    files = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    md = pq.ParquetFile(os.path.join(path, files[0])).schema_arrow.metadata
    if not md or b"geo" not in md:
        raise ValueError(f"{files[0]} has no 'geo' footer metadata")
    return json.loads(md[b"geo"])


def read_geoparquet(
    spark: SparkSession, path: str, geometry_col: str | None = None,
) -> tuple[DataFrame, dict]:
    """(DataFrame, geo metadata). The scan is Spark's vectorized parquet
    reader — filters on the bbox covering column push down and prune row
    groups; the geometry column stays WKB binary, feeding every other
    operator in the engine directly."""
    meta = geoparquet_metadata(path)
    if geometry_col is None:
        geometry_col = meta["primary_column"]
    if meta["columns"][geometry_col]["encoding"] != "WKB":
        raise ValueError("only WKB encoding is supported")
    return spark.read.parquet(path), meta
