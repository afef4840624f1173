"""Temporal joins the reference ecosystem expects of a web-scale table
keyed by (url, warc_ts): AS-OF join (latest right row at-or-before each
left row) and bucketed RANGE join (point-in-interval), both expressed as
single-shuffle Catalyst plans — no inequality-join blowup, no UDFs.

The reference (Shapely) is purely spatial; these mirror its join
surface's temporal siblings (SURVEY.md §2.9 engine additions: the
Common-Crawl pages table carries warc_ts, and "latest snapshot per url
as of T" / "events within a crawl window" are the two queries every
user of that table runs).

Scale shapes
------------
asof_join: the textbook distributed as-of — union both sides with a
side marker, ONE shuffle keyed by `on`, and a running
`last(payload, ignorenulls=True)` window ordered by (ts, side). No
per-row search, no range join: cost is one sort shuffle of |L|+|R|.
Skewed keys (one url with 10^6 snapshots) serialize within their key —
the standard mitigation is time-slicing the key with boundary carry
(split each key's timeline into S slices, replicate each slice's last
right row into the next slice), which composes with this operator by
pre-splitting `on`; not built in because the pages layout already
bounds per-url history.

range_join: intervals explode to the fixed-width buckets they cover;
points live in exactly ONE bucket, so the bucket equi-join emits each
qualifying (point, interval) pair at most once — no dedup pass. The
exact predicate runs JVM-side after the join. Bucket width trades
replication (long intervals touch many buckets) against candidate
fan-in (wide buckets match more non-qualifying pairs); pick it near the
median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def _as_list(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the single right row with the largest
    right_ts <= left_ts (direction='backward'; 'forward' takes the
    smallest right_ts >= left_ts) sharing the `on` key — pandas
    merge_asof / DuckDB ASOF JOIN semantics, left-outer (unmatched left
    rows keep NULL right columns). Ties at equal ts MATCH (<=, not <).

    `tolerance` (a Column interval or numeric, same type algebra as the
    ts columns) drops matches farther than that from the left ts.

    Right payload columns are every right column except `on` and
    `right_ts`; they come back suffixed with `suffix` when the name
    collides with a left column, plus `__asof_ts` = the matched right
    ts. Right side must be unique per (on, right_ts) for a
    deterministic result — pre-aggregate if it is not.
    """
    on = _as_list(on)
    if right_ts is None:
        right_ts = left_ts
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    reserved = {"__ts", "__p", "__side", "__m", "__asof_ts"}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(f"left columns collide with asof internals: {sorted(clash)}")

    payload_cols = [c for c in right.columns if c not in (*on, right_ts)]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload_cols
    }
    payload = F.struct(
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c).alias(out_names[c]) for c in payload_cols],
    )

    rt = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        payload.alias("__p"),
        F.lit(0).alias("__side"),
    )
    lt = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(rt.schema["__p"].dataType).alias("__p"),
        F.lit(1).alias("__side"),
    )
    # At equal __ts the right row sorts first, so last() sees it: <=.
    order = [F.col("__ts"), F.col("__side")]
    if direction == "forward":
        order = [F.col("__ts").desc(), F.col("__side")]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lt.unionByName(rt, allowMissingColumns=True)
        .withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    m = F.col("__m")
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        gap = (
            (F.col(left_ts) - m["__asof_ts"])
            if direction == "backward"
            else (m["__asof_ts"] - F.col(left_ts))
        )
        matched = matched.withColumn("__m", F.when(gap <= tol, m))
    return matched.select(
        *[F.col(c) for c in left.columns],
        m["__asof_ts"].alias("__asof_ts"),
        *[m[out_names[c]].alias(out_names[c]) for c in payload_cols],
    )


def _bucket(c: Column, width: int) -> Column:
    """Exact integer bucketing: the (c - c % w) numerator is an exact
    double and its division by w is a correctly-rounded integer, so no
    fp-floor boundary slips. Spark's truncation-style % makes this
    ceil-division for negatives — still MONOTONE, and both sides share
    the map, so the interval's sequence(bucket(s), bucket(e-1)) covers
    every bucket its points can land in regardless of sign."""
    return ((c - (c % F.lit(width))) / F.lit(width)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    on: str | list[str] | None = None,
    bucket: int = 600_000_000,
) -> DataFrame:
    """Inner-join each point row to every interval row whose half-open
    window [start, end) contains point_ts (and whose `on` key matches,
    when given). ts/start/end are numerics (either sign) in the same
    unit (e.g. unix_micros); `bucket` is the bucketing width in that
    unit (default 10 min of microseconds).

    Plan: intervals explode to sequence(bucket(start), bucket(end-1));
    points compute ONE bucket; equi-join on ([on...,] bucket) then the
    exact JVM predicate. Each qualifying pair is emitted exactly once.
    Empty intervals (end <= start) match nothing. Column collisions are
    suffixed '_i' on the interval side.
    """
    on = [] if on is None else _as_list(on)
    clash = {"__b"} & (set(points.columns) | set(intervals.columns))
    if clash:
        raise ValueError(
            f"input columns collide with range_join internals: {sorted(clash)}")
    icols = [c for c in intervals.columns if c not in on]
    iout = {c: (c + "_i" if c in points.columns else c) for c in icols}

    iv = intervals.select(
        *on, *[F.col(c).alias(iout[c]) for c in icols]
    ).where(F.col(iout[end]) > F.col(iout[start]))
    iv = iv.withColumn(
        "__b",
        F.explode(
            F.sequence(
                _bucket(F.col(iout[start]), bucket),
                _bucket(F.col(iout[end]) - F.lit(1), bucket),
            )
        ),
    )
    pt = points.withColumn("__b", _bucket(F.col(point_ts), bucket))
    joined = pt.join(iv, on=[*on, "__b"], how="inner").where(
        (F.col(point_ts) >= F.col(iout[start]))
        & (F.col(point_ts) < F.col(iout[end]))
    )
    return joined.drop("__b")
