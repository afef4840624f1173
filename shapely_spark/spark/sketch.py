"""KMV (k-minimum-values) distinct-count sketch — a deterministic,
mergeable cardinality estimator built from Catalyst primitives only.

Spark ships HLL (approx_count_distinct), but its register layout is
engine-private: two engines cannot cross-check it value-for-value. KMV
("Distinct-Value Synopses", Beyer et al., SIGMOD 2007; the theta-sketch
core) is reproducible from ANY engine that can md5: hash every key to a
uniform 60-bit integer, keep the k smallest per group, and estimate
|distinct| = (k-1) * H / h_(k) with H = 16^15. That determinism is the
point — the DuckDB oracle recomputes the identical sketch bit-for-bit
(queries.py kmv_distinct_users), something no HLL gate can do.

Scale shape: one distinct shuffle on (group, hash), then a two-level
k-selection — row_number within (group, hash % fan) salt buckets bounds
every sort, then row_number over the k*fan survivors per group. No
collect_set (whose per-group state is unbounded), no driver collect;
the sketch rows themselves (k per group) are trivially mergeable by
re-running the same selection over unioned sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmv_distinct"]

#: size of the 60-bit hash space (16^15): md5's first 15 hex chars.
HASH_SPACE = float(16 ** 15)


def _h60(col) -> F.Column:
    """Uniform 60-bit integer hash: first 15 hex chars of md5 of the
    key's string form. Positive, fits bigint; identical in DuckDB as
    CAST(concat('0x', substr(md5(CAST(key AS VARCHAR)),1,15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    key: str,
    group_by: str | list[str] | None = None,
    k: int = 64,
    fan: int = 32,
) -> DataFrame:
    """Per-group distinct-count estimate of `key` via a k-minimum-values
    sketch. Returns (group_cols..., n_kept, kth_min, est_distinct):
    when fewer than k distinct hashes exist the sketch is exhaustive
    and est_distinct is the exact count; otherwise the unbiased KMV
    estimator (k-1)/h_(k) scaled to the hash space, rounded to 4 dp
    (the rounding makes the double reproducible across engines: the
    numerator (k-1)*2^60 is an exact double, the division correctly
    rounded IEEE-754 on both sides).

    `fan` salt-buckets the first selection level so no single sort sees
    a whole group; k*fan rows per group reach the second level.
    """
    groups = (
        [] if group_by is None
        else ([group_by] if isinstance(group_by, str) else list(group_by))
    )
    hashed = (
        df.where(F.col(key).isNotNull())
        .select(*groups, _h60(key).alias("__h"))
        .distinct()
    )
    w1 = Window.partitionBy(*groups, F.col("__h") % F.lit(fan)).orderBy("__h")
    w2 = Window.partitionBy(*groups).orderBy("__h")
    topk = (
        hashed.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .withColumn("__r2", F.row_number().over(w2))
        .where(F.col("__r2") <= k)
    )
    est = F.when(
        F.count("*") < k, F.count("*").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.max("__h"), 4)
    )
    agg = topk.groupBy(*groups).agg(
        F.count("*").alias("n_kept"),
        F.max("__h").alias("kth_min"),
        est.alias("est_distinct"),
    )
    return agg
