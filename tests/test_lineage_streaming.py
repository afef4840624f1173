"""Resumability (checkpoint lineage) and Structured Streaming tests."""

import os

import pytest
from pyspark.sql import functions as F

from shapely_spark.spark.extract import with_geo
from shapely_spark.spark.lineage import LineageRun
from shapely_spark.spark.pages import regions_df, synth_pages, synth_regions


@pytest.fixture(scope="module")
def pages(spark):
    return with_geo(synth_pages(spark, 2000)).cache()


def _transform(regions_frame):
    from shapely_spark.spark.join import spatial_join

    def fn(df):
        return spatial_join(df, regions_frame, predicate="intersects").select("url", "region_id")

    return fn


def test_lineage_resume_identical_output(spark, pages, tmp_path):
    """Kill after 3 of 8 buckets → resume → output equals a single-shot run
    (the north-rule resumability contract)."""
    rdf = regions_df(spark, synth_regions(40, seed=42))
    fn = _transform(rdf)

    out1 = str(tmp_path / "run_resumable")
    run = LineageRun(out1, n_buckets=8, bucket_key="url")
    with pytest.raises(RuntimeError, match="simulated crash"):
        run.run(pages, fn, fail_after=3)
    assert len(run.completed()) == 3

    # resume: only the remaining 5 buckets run
    resumed = LineageRun(out1, n_buckets=8, bucket_key="url")
    ran = resumed.run(pages, fn)
    assert ran == 5
    assert len(resumed.completed()) == 8

    got = {(r.url, r.region_id) for r in resumed.result(spark).collect()}
    want = {(r.url, r.region_id) for r in fn(pages).collect()}
    assert got == want
    assert len(got) > 0


def test_lineage_metrics(spark, pages, tmp_path):
    rdf = regions_df(spark, synth_regions(10, seed=1))
    run = LineageRun(str(tmp_path / "m"), n_buckets=4, bucket_key="url")
    run.run(pages, _transform(rdf))
    m = run.metrics()
    assert len(m) == 4
    assert sum(r["rows_in"] for r in m) == pages.count()
    assert all(r["wall_sec"] > 0 for r in m)


def test_lineage_rerun_is_noop(spark, pages, tmp_path):
    rdf = regions_df(spark, synth_regions(10, seed=1))
    run = LineageRun(str(tmp_path / "n"), n_buckets=4, bucket_key="url")
    assert run.run(pages, _transform(rdf)) == 4
    assert run.run(pages, _transform(rdf)) == 0  # everything committed


def test_streaming_matches_batch(spark, tmp_path):
    """availableNow stream over the same files == batch result (windowed
    per-cell counts)."""
    from shapely_spark.streaming.pipeline import (
        read_pages_stream,
        run_stream_to_memory,
        stream_with_geo,
        windowed_tile_counts,
    )

    src = str(tmp_path / "landing")
    batch_pages = synth_pages(spark, 3000)
    batch_pages.write.mode("overwrite").parquet(src)

    stream = read_pages_stream(spark, src, max_files=2)
    assert stream.isStreaming
    counts_stream = windowed_tile_counts(stream_with_geo(stream), window="1 hour")
    # complete mode: append only emits windows the watermark has closed,
    # which never happens within a single availableNow drain
    run_stream_to_memory(counts_stream, "tile_counts_test", output_mode="complete")
    got = {
        (r.window_start, r.cell_id): r.n_pages
        for r in spark.sql("SELECT * FROM tile_counts_test").collect()
    }

    batch_geo = with_geo(spark.read.parquet(src)).where(F.col("cell_id") >= 0)
    want = {
        (r.win["start"], r.cell_id): r.n_pages
        for r in batch_geo.groupBy(F.window("warc_ts", "1 hour").alias("win"), "cell_id")
        .agg(F.count("*").alias("n_pages"))
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_foreach_batch_spatial_join(spark, tmp_path):
    from shapely_spark.streaming.pipeline import (
        foreach_batch_spatial_join,
        read_pages_stream,
        stream_with_geo,
    )

    src = str(tmp_path / "landing2")
    synth_pages(spark, 1000).write.mode("overwrite").parquet(src)
    rdf = regions_df(spark, synth_regions(20, seed=5))
    fn = foreach_batch_spatial_join(rdf)

    results = []

    def sink(batch_df, batch_id):
        out = fn(batch_df, batch_id)
        results.extend((r.url, r.region_id) for r in out.select("url", "region_id").collect())

    stream = stream_with_geo(read_pages_stream(spark, src, max_files=10))
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()

    from shapely_spark.spark.join import spatial_join

    want = {
        (r.url, r.region_id)
        for r in spatial_join(with_geo(spark.read.parquet(src)), rdf)
        .select("url", "region_id")
        .collect()
    }
    assert set(results) == want
