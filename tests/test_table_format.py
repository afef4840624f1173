"""Snapshot-committed table format (spark/table_format.py): commits,
time travel, manifest file pruning, and the compare-and-swap contract."""

import os

import pytest

from shapely_spark.geo.geom import box
from shapely_spark.geo.wkb import to_wkb
from shapely_spark.spark.table_format import (
    commit_append, current_snapshot_id, pruned_file_count, read_snapshot,
    snapshot, snapshot_log,
)


def _boxes(spark, lo, n, parts=2):
    rows = [(lo + i, to_wkb(box(float(lo + i), 0.0, lo + i + 1.0, 1.0)))
            for i in range(n)]
    return (spark.createDataFrame(rows, "id long, geometry binary")
            .repartition(parts))


def test_commit_read_and_cumulative_snapshots(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert current_snapshot_id(t) is None
    s0 = commit_append(_boxes(spark, 0, 10), t)
    s1 = commit_append(_boxes(spark, 100, 6), t)
    assert (s0["id"], s0["parent"]) == (0, None)
    assert (s1["id"], s1["parent"]) == (1, 0)
    assert current_snapshot_id(t) == 1
    assert read_snapshot(spark, t).count() == 16
    ids = {r.id for r in read_snapshot(spark, t).collect()}
    assert ids == set(range(10)) | set(range(100, 106))
    log = snapshot_log(t)
    assert [x["id"] for x in log] == [0, 1]
    assert [x["n_rows"] for x in log] == [10, 16]


def test_time_travel_is_immutable(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_append(_boxes(spark, 0, 10), t)
    commit_append(_boxes(spark, 100, 6), t)
    old = read_snapshot(spark, t, snapshot_id=0)
    assert old.count() == 10
    assert {r.id for r in old.collect()} == set(range(10))


def test_manifest_file_pruning(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # two spatially disjoint commits, 2 files each
    commit_append(_boxes(spark, 0, 10), t)
    commit_append(_boxes(spark, 100, 10), t)
    surv, tot = pruned_file_count(t, (0, 0, 20, 1))
    assert tot == 4 and surv == 2
    df = read_snapshot(spark, t, bbox=(0, 0, 20, 1))
    # the scan only received the surviving files
    assert df.count() == 10
    assert {r.id for r in df.collect()} == set(range(10))
    with pytest.raises(ValueError, match="no files"):
        read_snapshot(spark, t, bbox=(500, 500, 501, 501))


def test_null_bbox_files_always_survive(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(0, None)], "id long, geometry binary")
    commit_append(df.coalesce(1), t)
    surv, tot = pruned_file_count(t, (500, 500, 501, 501))
    assert (surv, tot) == (1, 1)  # stats prune, never filter
    assert read_snapshot(spark, t, bbox=(500, 500, 501, 501)).count() == 1


def test_concurrent_commit_raises_and_preserves_head(spark, tmp_path,
                                                     monkeypatch):
    import shapely_spark.spark.table_format as tf

    t = str(tmp_path / "tbl")
    commit_append(_boxes(spark, 0, 4), t)
    commit_append(_boxes(spark, 10, 4), t)
    # simulate the race window: the loser read parent=0 before
    # snapshot 1 landed, then tries to exclusive-create snap-1
    monkeypatch.setattr(tf, "current_snapshot_id", lambda table: 0)
    with pytest.raises(RuntimeError, match="concurrent"):
        tf.commit_append(_boxes(spark, 20, 2), t)
    monkeypatch.undo()
    # the committed snapshot 1 is untouched
    assert {r.id for r in read_snapshot(spark, t, snapshot_id=1).collect()
            } == set(range(4)) | set(range(10, 14))


def test_crashed_commit_recovers_without_pointer(spark, tmp_path):
    # a writer that crashed AFTER exclusive-creating its snapshot file
    # but BEFORE refreshing the VERSION cache has still committed: the
    # head derives from the snapshot files, so the next commit builds on
    # it instead of colliding forever
    t = str(tmp_path / "tbl")
    commit_append(_boxes(spark, 0, 4), t)  # snap 0
    commit_append(_boxes(spark, 10, 2), t)  # snap 1
    with open(os.path.join(t, "meta", "VERSION"), "w") as fh:
        fh.write("0")  # stale cache — as if the snap-1 writer crashed
    assert current_snapshot_id(t) == 1
    s2 = commit_append(_boxes(spark, 20, 2), t)
    assert (s2["id"], s2["parent"]) == (2, 1)
    assert read_snapshot(spark, t).count() == 8


def test_snapshot_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        snapshot(str(tmp_path / "empty_tbl"))


def test_read_incremental_exact_file_diff(spark, tmp_path):
    from shapely_spark.spark.table_format import read_incremental

    t = str(tmp_path / "tbl")
    commit_append(_boxes(spark, 0, 6), t)
    commit_append(_boxes(spark, 100, 4), t)
    commit_append(_boxes(spark, 200, 2), t)
    inc = read_incremental(spark, t, from_snapshot=0)
    assert {r.id for r in inc.collect()} == set(range(100, 104)) | {200, 201}
    inc2 = read_incremental(spark, t, from_snapshot=0, to_snapshot=1)
    assert {r.id for r in inc2.collect()} == set(range(100, 104))
    full = read_incremental(spark, t, from_snapshot=None)
    assert full.count() == 12
    # bbox pruning composes with the range
    west = read_incremental(spark, t, from_snapshot=0, bbox=(100, 0, 110, 1))
    assert {r.id for r in west.collect()} == set(range(100, 104))
    with pytest.raises(ValueError, match="incremental"):
        read_incremental(spark, t, from_snapshot=2)


def test_streaming_ingest_commits_match_batch(spark, tmp_path):
    from shapely_spark.spark.table_format import read_incremental
    from shapely_spark.streaming.pipeline import foreach_batch_commit_append

    # landing zone with several small files so availableNow produces
    # multiple micro-batches
    src = str(tmp_path / "landing")
    rows = [(i, to_wkb(box(float(i), 0.0, i + 1.0, 1.0))) for i in range(40)]
    (spark.createDataFrame(rows, "id long, geometry binary")
     .repartition(4).write.parquet(src))

    table = str(tmp_path / "stream_tbl")
    fn = foreach_batch_commit_append(table)
    stream = (spark.readStream.format("parquet")
              .schema("id long, geometry binary")
              .option("maxFilesPerTrigger", 1).load(src))
    q = (stream.writeStream.foreachBatch(fn)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    log = snapshot_log(table)
    assert len(log) >= 2  # one snapshot per micro-batch
    assert log[-1]["n_rows"] == 40
    got = {r.id: bytes(r.geometry)
           for r in read_snapshot(spark, table).collect()}
    want = {r.id: bytes(r.geometry)
            for r in spark.read.parquet(src).collect()}
    assert got == want  # streaming ingest == batch content, bytes equal
    # a consumer that processed through snapshot 0 resumes with exactly
    # the rest
    first = snapshot_log(table)[0]["n_rows"]
    rest = read_incremental(spark, table, from_snapshot=0).count()
    assert first + rest == 40
