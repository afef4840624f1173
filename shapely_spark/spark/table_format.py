"""Snapshot-committed table format over the GeoParquet sink — the
engine's Iceberg-shaped storage layer (append-only snapshots, optimistic
commits, time travel, and manifest-driven FILE pruning before the scan).

Semantics follow the public Apache Iceberg model (spec concepts:
snapshot log, manifest with per-file stats, compare-and-swap commit);
the implementation is this engine's own, sized to what the pipeline
needs:

- ``<table>/data/``  immutable parquet data files (written by
  spark/geoparquet.py: executor-side pyarrow, per-file ``geo`` footer,
  bbox covering column).
- ``<table>/meta/snap-N.json``  snapshot N = its parent id plus the
  FULL file list, each entry carrying the per-file stats the writer's
  manifest already produced (rows + bbox).
- ``<table>/meta/VERSION``  the current-snapshot pointer, advanced by
  atomic rename (os.rename of a staged pointer) — the compare-and-swap:
  a concurrent committer that lost the race sees a parent mismatch and
  raises instead of clobbering.

Scale shape: a commit moves ONE small JSON (a row per data file — the
same cardinality Iceberg manifests carry); readers plan from the
manifest driver-side. ``read_snapshot(bbox=...)`` intersects the query
window with each file's manifest bbox and hands Spark ONLY the
surviving files — file-level pruning before any footer is opened, the
Iceberg partition-pruning analog — then the bbox covering column prunes
row groups inside them. Time travel = reading an older snapshot's file
list; nothing is ever rewritten, so resumable pipelines can re-read the
exact input set of any past run (the lineage contract of
spark/lineage.py at the storage layer).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .geoparquet import write_geoparquet


def _meta_dir(table: str) -> str:
    return os.path.join(table, "meta")


def _snap_path(table: str, sid: int) -> str:
    return os.path.join(_meta_dir(table), f"snap-{sid}.json")


def current_snapshot_id(table: str) -> int | None:
    """The committed snapshot id, or None for an empty/new table.

    Derived from the snapshot FILES (max snap-N.json), not the VERSION
    pointer: the exclusive create of the snapshot file is the commit
    itself, so a writer that crashed between creating it and refreshing
    the pointer has still committed — deriving the head from the files
    makes recovery automatic, where trusting a stale pointer would make
    every later commit collide with the "orphan" forever. VERSION is
    maintained as a fast-path cache only."""
    meta = _meta_dir(table)
    if not os.path.isdir(meta):
        return None
    ids = [int(f[5:-5]) for f in os.listdir(meta)
           if f.startswith("snap-") and f.endswith(".json")]
    return max(ids) if ids else None


def snapshot(table: str, snapshot_id: int | None = None) -> dict:
    """Load a snapshot's metadata (defaults to the current one)."""
    sid = current_snapshot_id(table) if snapshot_id is None else snapshot_id
    if sid is None:
        raise FileNotFoundError(f"{table} has no committed snapshot")
    with open(_snap_path(table, sid)) as fh:
        return json.load(fh)


def snapshot_log(table: str) -> list[dict]:
    """All snapshots, oldest first (id, parent, file/row counts)."""
    sid = current_snapshot_id(table)
    out = []
    while sid is not None:
        s = snapshot(table, sid)
        out.append({"id": s["id"], "parent": s["parent"],
                    "n_files": len(s["files"]),
                    "n_rows": sum(f["rows"] for f in s["files"])})
        sid = s["parent"]
    return list(reversed(out))


def commit_append(
    df: DataFrame,
    table: str,
    geometry_col: str = "geometry",
    crs: dict | None = None,
) -> dict:
    """Append ``df`` as a new snapshot: write the data files (GeoParquet,
    one per partition), then commit parent+files via compare-and-swap on
    the VERSION pointer. Returns the new snapshot dict. Raises
    RuntimeError if another commit won the race (retry by re-running —
    the data files of the losing attempt are unreferenced, an Iceberg
    orphan-file analog)."""
    data = os.path.join(table, "data")
    meta = _meta_dir(table)
    os.makedirs(meta, exist_ok=True)
    parent = current_snapshot_id(table)
    sid = 0 if parent is None else parent + 1
    # stage data files under a unique ATTEMPT prefix — two racers both
    # computing sid = parent+1 must never write into the same directory
    # (the loser's attempt dir stays orphaned; the winner's is the one
    # its snapshot file references)
    import uuid

    attempt = f"snap-{sid}-{uuid.uuid4().hex[:8]}"
    subdir = os.path.join(data, attempt)
    manifest = write_geoparquet(df, subdir, geometry_col=geometry_col,
                                crs=crs)
    files = [] if parent is None else snapshot(table, parent)["files"]
    new = [{"path": os.path.join("data", attempt, m.file),
            "rows": m.rows,
            "bbox": None if m.xmin is None
            else [m.xmin, m.ymin, m.xmax, m.ymax]}
           for m in manifest]
    snap = {"id": sid, "parent": parent, "files": files + new,
            "geometry_col": geometry_col}
    # compare-and-swap: both racers compute sid = parent+1, and
    # exclusive-create ('x') of snap-<sid>.json lets exactly ONE win —
    # the loser raises and its staged data files stay unreferenced (the
    # Iceberg orphan-file analog). The VERSION pointer is then advanced
    # by atomic rename; only the snap-file winner ever writes it.
    try:
        with open(_snap_path(table, sid), "x") as fh:
            json.dump(snap, fh)
    except FileExistsError:
        raise RuntimeError(
            f"concurrent commit: snapshot {sid} already committed "
            f"on top of parent {parent}") from None
    staged = os.path.join(meta, f"VERSION.stage-{sid}")
    with open(staged, "w") as fh:
        fh.write(str(sid))
    os.replace(staged, os.path.join(meta, "VERSION"))
    return snap


def read_snapshot(
    spark: SparkSession,
    table: str,
    snapshot_id: int | None = None,
    bbox: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """Scan a snapshot. With ``bbox``, files whose manifest bbox cannot
    intersect the window are dropped DRIVER-SIDE before the scan (file
    pruning from manifest stats); the covering column then prunes row
    groups within the survivors. Files with no bbox stats (all-NULL
    geometry) are always kept — stats prune, never filter."""
    s = snapshot(table, snapshot_id)
    files = s["files"]
    if bbox is not None:
        xmin, ymin, xmax, ymax = bbox
        files = [f for f in files
                 if f["bbox"] is None
                 or (f["bbox"][0] <= xmax and f["bbox"][2] >= xmin
                     and f["bbox"][1] <= ymax and f["bbox"][3] >= ymin)]
    if not files:
        raise ValueError("no files survive pruning; empty scan")
    paths = [os.path.join(table, f["path"]) for f in files]
    return spark.read.parquet(*paths)


def read_incremental(
    spark: SparkSession,
    table: str,
    from_snapshot: int | None,
    to_snapshot: int | None = None,
    bbox: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """Scan only the files ADDED after ``from_snapshot`` up to
    ``to_snapshot`` (default: current head) — the Iceberg
    incremental-read analog, and the resume primitive: a pipeline that
    recorded the snapshot id it last processed re-enters with exactly
    the unseen data, no anti-join against the processed set needed
    (file lists are append-only, so set difference is exact).
    ``from_snapshot=None`` means "from before the first commit" (reads
    everything). ``bbox`` applies the same manifest file pruning as
    ``read_snapshot``."""
    to = snapshot(table, to_snapshot)
    seen = set() if from_snapshot is None else {
        f["path"] for f in snapshot(table, from_snapshot)["files"]}
    files = [f for f in to["files"] if f["path"] not in seen]
    if bbox is not None:
        xmin, ymin, xmax, ymax = bbox
        files = [f for f in files
                 if f["bbox"] is None
                 or (f["bbox"][0] <= xmax and f["bbox"][2] >= xmin
                     and f["bbox"][1] <= ymax and f["bbox"][3] >= ymin)]
    if not files:
        raise ValueError("no files in the incremental range")
    paths = [os.path.join(table, f["path"]) for f in files]
    return spark.read.parquet(*paths)


def pruned_file_count(
    table: str,
    bbox: tuple[float, float, float, float],
    snapshot_id: int | None = None,
) -> tuple[int, int]:
    """(surviving, total) file counts for a window — the audit hook the
    bench uses to prove manifest pruning actually drops files."""
    s = snapshot(table, snapshot_id)
    xmin, ymin, xmax, ymax = bbox
    surv = sum(
        1 for f in s["files"]
        if f["bbox"] is None
        or (f["bbox"][0] <= xmax and f["bbox"][2] >= xmin
            and f["bbox"][1] <= ymax and f["bbox"][3] >= ymin))
    return surv, len(s["files"])
