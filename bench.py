"""Benchmark harness. Prints ONE JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Headline workloads (the north-star engine paths, at $SPARK_GRAFT_SF_DIR):
- pages_pipeline: synthesize sf-scaled pages table (1M rows at sf0.1) →
  extract text+geotags → cell assignment (all JVM) → count
- spatial_join_pages: pages ⋈ 1000-region synthetic layer (cell cover
  broadcast join + prepared refine) — reports pairs/sec
- tile_agg_pages: per-cell rollup of the pages table — tile-assignments/sec
- knn_pages: k=1 nearest of 1000 region centroids for every page
- plus the oracle-checked battery on the driver tables (tpch, spatial,
  geo kernels, dedup/text) for end-to-end coverage.

Usage: python bench.py [--cpus N] [--sf-dir DIR] [--skip-battery]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--skip-battery", action="store_true")
    ap.add_argument("--pages", type=int, default=None, help="override pages row count")
    args = ap.parse_args()

    sf = float(args.sf_dir.rstrip("/").split("sf")[-1])
    n_pages = args.pages if args.pages is not None else int(10_000_000 * sf)
    n_regions = 1000

    from shapely_spark.spark.extract import with_geo
    from shapely_spark.spark.join import spatial_join
    from shapely_spark.spark.knn import knn_join_broadcast
    from shapely_spark.spark.pages import regions_df, synth_pages, synth_regions
    from shapely_spark.spark.session import get_spark
    from shapely_spark.spark.tiles import tile_counts

    spark = get_spark(app="bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(16, args.cpus))

    times: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        times[name] = round(time.time() - t0, 3)
        return out

    # ---- headline: pages pipeline ----------------------------------------
    # extraction (html->text/geotag) runs in full; downstream joins cache
    # only the slim projection they need (html/text pruned by Catalyst)
    pages_full = with_geo(synth_pages(spark, n_pages))
    pages = pages_full.select("url", "lat", "lon", "cell_id").cache()
    n = timed("pages_pipeline", lambda: pages.count())
    extras["pages_rows"] = n
    extras["pages_rows_per_sec"] = round(n / times["pages_pipeline"], 1)

    # text extraction byte-path (html -> <p>...</p>), not cached
    timed("text_extract", lambda: pages_full.where(
        F.length("extracted_text") > 0).count())
    extras["text_extract_rows_per_sec"] = round(n / times["text_extract"], 1)

    regions = synth_regions(n_regions, seed=42)
    rdf = regions_df(spark, regions)

    pairs = timed("spatial_join_pages",
                  lambda: spatial_join(pages, rdf, predicate="intersects").count())
    extras["spatial_join_pairs"] = pairs
    extras["spatial_join_rows_per_sec"] = round(n / times["spatial_join_pages"], 1)
    extras["spatial_join_pairs_per_sec"] = round(pairs / times["spatial_join_pages"], 1)

    tiles = timed("tile_agg_pages", lambda: tile_counts(pages).count())
    extras["tile_assignments_per_sec"] = round(n / times["tile_agg_pages"], 1)
    extras["tiles"] = tiles

    centers = rdf.limit(1000)
    import pandas as pd  # noqa: F401
    from shapely_spark.geo.wkb import from_wkb
    from shapely_spark.geo.constructive import centroid
    crows = []
    for r in centers.collect():
        g = from_wkb(bytes(r.wkb))
        if g is None or g.is_empty:
            continue
        c = centroid(g)
        crows.append((int(r.region_id), float(c.coords[0, 1]), float(c.coords[0, 0])))
    targets = spark.createDataFrame(crows, "target_id long, t_lat double, t_lon double")
    knn = timed("knn_pages",
                lambda: knn_join_broadcast(pages, targets, k=1, point_id="url").count())
    extras["knn_rows_per_sec"] = round(knn / times["knn_pages"], 1)

    pages.unpersist()

    # ---- oracle-checked battery on driver tables --------------------------
    if not args.skip_battery:
        from shapely_spark.queries import QUERIES

        for name, fn in QUERIES.items():
            try:
                timed(name, lambda fn=fn: fn(spark, args.sf_dir).count())
            except Exception as ex:  # keep the bench alive
                times[name] = -1.0
                extras[f"{name}_error"] = str(ex)[:100]

    total = round(sum(v for v in times.values() if v > 0), 3)
    print(json.dumps({
        "metric": "spatial-join+tiling engine wall time (headline paths + battery)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": args.cpus,
        "extras": extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
