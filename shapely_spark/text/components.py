"""Connected components + duplicate-cluster resolution, pure DataFrame ops.

Near-dup PAIRS (minhash/simhash/embedding suites) don't dedupe a corpus by
themselves: pairs chain (A~B, B~C) into clusters, and the pipeline must
pick ONE keeper per cluster. That grouping is connected components over
the pair graph — at web scale the canonical algorithm is alternating
large-star / small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14): O(log n) rounds of pure shuffle-on-key
aggregation, no driver-side graph state, no O(diameter) propagation.

Reference scope note: shapely has no graph ops (this is a training-data
pipeline addition, like text/dedup.py); the cluster-resolution CONTRACT
(keeper = min id of the near-dup cluster) mirrors dedup.exact_dedup's
keeper rule so exact and near dedup compose.

Scale design:
- each half-round is ONE hash shuffle on the node key (window min over
  `partitionBy(u)`, no join-back of a mins table);
- per-round `localCheckpoint(eager=True)` truncates lineage — iterative
  plans otherwise double in depth per round and kill the driver long
  before the data hurts (on a real cluster with reliable storage, swap
  for `checkpoint()` against a checkpoint dir);
- convergence is a 2-scalar fingerprint action (count + bit_xor of
  xxhash64(u, v)) per round, never a full edge-set comparison;
- high-degree hubs are what large-star exists for: it hangs a hub's big
  neighbors directly off the component min, so star centers shed degree
  instead of funnelling the whole component through one task. The
  windowed min itself partial-aggregates map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _fingerprint(edges: DataFrame) -> tuple:
    """Order-insensitive fingerprint of a distinct edge set: one action."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("u", "v")).alias("x"),
    ).collect()[0]
    return (row["n"], row["x"])


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node that appears in `edges`; component
    is the minimum node id of its connected component. Nodes with no edges
    are absent (callers union singletons back — see resolve_duplicates).

    Alternating star rounds, each ending in a distinct edge set of
    (node → smaller candidate root); converged when the set stops
    changing, at which point edges form stars child→root.
    """
    cur = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    if not cur.take(1):
        spark = edges.sparkSession
        return spark.createDataFrame([], "node long, component long")

    w = Window.partitionBy("u")
    fp = None
    for _ in range(max_iter):
        # large-star: for each node u, attach every LARGER neighbor to
        # m = min(neighbors(u) ∪ {u}). Symmetrize first so both endpoints
        # act as the center once.
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        ls = sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        cur = (
            ls.where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: orient edges larger→smaller, then for each center u
        # attach every smaller neighbor AND u itself to m = min neighbor.
        t = cur.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        ss = t.withColumn("m", F.min("v").over(w)).localCheckpoint(eager=True)
        cur = (
            ss.where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(ss.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        nxt = _fingerprint(cur)
        if nxt == fp:
            break
        fp = nxt
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    # converged: every edge is child→root (u > v, v = component min);
    # roots appear only on the v side.
    return (
        cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(cur.select(F.col("v").alias("node"), F.col("v").alias("component")))
        .distinct()
    )


def resolve_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """(id_col, keeper_id) for EVERY doc: keeper is the min doc id of the
    doc's near-dup cluster (the doc itself when it has no near-dups).
    Compose after any pair generator (minhash_dedup_pairs,
    simhash_dedup_pairs, cosine_neardup_pairs_*): keep rows where
    keeper_id == id_col, drop the rest."""
    cc = connected_components(pairs, src=src, dst=dst)
    return docs.join(cc, docs[id_col] == cc["node"], "left").select(
        docs[id_col],
        F.coalesce(cc["component"], docs[id_col]).alias("keeper_id"),
    )
