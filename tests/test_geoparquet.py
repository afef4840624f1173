"""GeoParquet 1.1 sink/source (spark/geoparquet.py): roundtrip fidelity,
per-file footer metadata, covering-column pushdown, and edge contracts."""

import json
import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from shapely_spark.geo.geom import box, point
from shapely_spark.geo.wkb import to_wkb
from shapely_spark.geo.wkt import from_wkt
from shapely_spark.spark.geoparquet import (
    bbox_filter_col, geoparquet_metadata, read_geoparquet, write_geoparquet,
)


def _boxes_df(spark, n=20, parts=3):
    rows = [(i, to_wkb(box(float(i), float(i), i + 2.0, i + 1.0)))
            for i in range(n)]
    return (spark.createDataFrame(rows, "id long, geometry binary")
            .repartition(parts))


def test_roundtrip_bytes_identical_and_manifest(spark, tmp_path):
    p = str(tmp_path / "gpq")
    df = _boxes_df(spark)
    man = write_geoparquet(df, p)
    assert sum(m.rows for m in man) == 20
    assert sorted(m.file for m in man) == sorted(
        f for f in os.listdir(p) if f.endswith(".parquet"))
    back, meta = read_geoparquet(spark, p)
    got = {r.id: bytes(r.geometry) for r in back.collect()}
    want = {r.id: bytes(r.geometry) for r in df.collect()}
    assert got == want
    assert meta["version"] == "1.1.0"
    assert meta["primary_column"] == "geometry"


def test_footer_metadata_per_file_bbox_and_types(spark, tmp_path):
    p = str(tmp_path / "gpq")
    write_geoparquet(_boxes_df(spark), p)
    for f in os.listdir(p):
        md = pq.ParquetFile(os.path.join(p, f)).schema_arrow.metadata
        geo = json.loads(md[b"geo"])
        col = geo["columns"]["geometry"]
        assert col["encoding"] == "WKB"
        assert col["geometry_types"] == ["Polygon"]
        assert col["covering"]["bbox"]["xmin"] == ["bbox", "xmin"]
        # the file's own bbox equals the min/max over its rows
        t = pq.read_table(os.path.join(p, f))
        bb = t.column("bbox").combine_chunks()
        assert col["bbox"] == [
            min(bb.field("xmin").to_pylist()),
            min(bb.field("ymin").to_pylist()),
            max(bb.field("xmax").to_pylist()),
            max(bb.field("ymax").to_pylist()),
        ]


def test_covering_filter_pushdown_and_exactness(spark, tmp_path):
    p = str(tmp_path / "gpq")
    write_geoparquet(_boxes_df(spark, n=50, parts=4), p)
    back, _ = read_geoparquet(spark, p)
    filt = back.where(bbox_filter_col(0.0, 0.0, 5.0, 5.0))
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "bbox.xmin" in plan  # nested-field filters reached the scan
    got = sorted(r.id for r in filt.collect())
    # box i = (i, i, i+2, i+1): intersects [0,5]^2 iff i <= 5
    assert got == [0, 1, 2, 3, 4, 5]


def test_null_geometry_and_mixed_types(spark, tmp_path):
    p = str(tmp_path / "gpq")
    rows = [
        (0, to_wkb(point(1.0, 2.0))),
        (1, to_wkb(from_wkt("LINESTRING (0 0, 3 4)"))),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "id long, geometry binary").coalesce(1)
    write_geoparquet(df, p)
    meta = geoparquet_metadata(p)
    assert meta["columns"]["geometry"]["geometry_types"] == [
        "LineString", "Point"]
    back, _ = read_geoparquet(spark, p)
    rows = {r.id: r for r in back.collect()}
    assert rows[2].geometry is None
    assert all(v is None for v in rows[2].bbox)  # stats ignore null fields
    assert rows[0].bbox.xmin == 1.0 and rows[0].bbox.ymax == 2.0
    assert rows[1].bbox.xmax == 3.0 and rows[1].bbox.ymax == 4.0
    # file bbox ignores the NULL row
    assert meta["columns"]["geometry"]["bbox"] == [0.0, 0.0, 3.0, 4.0]


def test_empty_partitions_write_no_files(spark, tmp_path):
    p = str(tmp_path / "gpq")
    df = _boxes_df(spark, n=2, parts=1).repartition(8)
    man = write_geoparquet(df, p)
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files) == len(man) <= 2  # only non-empty partitions wrote
    back, _ = read_geoparquet(spark, p)
    assert back.count() == 2


def test_error_contracts(spark, tmp_path):
    df = _boxes_df(spark, n=2)
    with pytest.raises(ValueError, match="no column"):
        write_geoparquet(df, str(tmp_path / "x"), geometry_col="nope")
    # a plain parquet dir (no geo footer) is rejected by the reader
    plain = str(tmp_path / "plain")
    df.drop("geometry").write.parquet(plain)
    with pytest.raises(ValueError, match="geo"):
        read_geoparquet(spark, plain)
    with pytest.raises(FileNotFoundError):
        geoparquet_metadata(str(tmp_path / "missing_dir_mk"))


def test_crs_and_existing_bbox_passthrough(spark, tmp_path):
    p = str(tmp_path / "gpq")
    crs = {"id": {"authority": "OGC", "code": "CRS84"}}
    df = _boxes_df(spark, n=4, parts=1)
    write_geoparquet(df, p, crs=crs)
    meta = geoparquet_metadata(p)
    assert meta["columns"]["geometry"]["crs"] == crs
    # a df that already carries bbox is not re-derived
    back, _ = read_geoparquet(spark, p)
    p2 = str(tmp_path / "gpq2")
    write_geoparquet(back, p2)
    b2, _ = read_geoparquet(spark, p2)
    assert b2.count() == 4
