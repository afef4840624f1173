"""Link-graph analytics: distributed PageRank (Page et al. 1999 / the
Brin-Page random surfer) — the canonical web-scale iterative operator a
Common-Crawl-shaped corpus pipeline needs (domain/page authority for
quality weighting and crawl prioritization).

Scale shape (10^12 pages): per iteration exactly ONE shuffle — the
edge⋈rank contribution join and its per-target partial-aggregated sum —
plus one scalar to the driver (the dangling mass, the k-means-centroid
pattern). The edge and out-degree relations are computed once and
persisted; rank lineage is truncated by localCheckpoint every few
rounds (the connected-components pattern, text/components.py:46).
Hot targets (a page everyone links) are exactly the skewed-key case the
partial agg absorbs: contributions combine map-side before the shuffle.

Arithmetic discipline: every iteration computes
``(1 - d)/n + d * (contrib + dangling/n)`` with the same operation
order on every engine, so the DuckDB oracle (the same k iterations
unrolled as chained CTEs) lands on bit-identical doubles up to
summation order, and round-6 outputs hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    num_iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    tgt: str = "tgt",
    nodes: DataFrame | None = None,
    checkpoint_every: int = 1,
    teleport: DataFrame | None = None,
) -> DataFrame:
    """(node, rank) after ``num_iters`` synchronous power iterations with
    uniform init 1/n and dangling-mass redistribution (rank of
    out-degree-0 nodes is spread uniformly, the standard stochastic
    fix-up). ``nodes`` defaults to distinct(src ∪ tgt); pass it
    explicitly to include isolated nodes (no edges at all).

    ``teleport`` personalizes the walk (PPR — crawl seeding, topic
    authority): a (node, weight) relation, normalized here; the random
    surfer restarts — and dangling mass lands — proportionally to it
    instead of uniformly. Nodes absent from it get weight 0 and can
    only earn rank through in-links. The uniform path keeps its own
    arithmetic ((1-d)/n, dm/n) so existing results are bit-stable."""
    e = edges.select(F.col(src).alias("src"), F.col(tgt).alias("tgt"))
    if nodes is None:
        nodes = (e.select(F.col("src").alias("node"))
                 .union(e.select(F.col("tgt").alias("node"))).distinct())
    else:
        cols = nodes.columns
        nodes = nodes.select(F.col(cols[0]).alias("node"))
    # hash-partition the node relation on the join key ONCE: the
    # per-iteration update join (nodes ⋈ contribs-on-tgt) then reuses
    # both sides' partitioning instead of re-shuffling nodes every round
    nodes = nodes.repartition("node").persist()
    n = nodes.count()
    if n == 0:
        raise ValueError("empty graph")
    if teleport is not None:
        tcols = teleport.columns
        tw = teleport.select(F.col(tcols[0]).alias("node"),
                             F.col(tcols[1]).cast("double").alias("w"))
        tot = tw.agg(F.sum("w").alias("tot"))
        nodes = (nodes.join(tw, "node", "left")
                 .crossJoin(F.broadcast(tot))
                 .select("node",
                         (F.coalesce(F.col("w"), F.lit(0.0))
                          / F.col("tot")).alias("tele"))
                 .repartition("node").persist())
    outdeg = (e.groupBy("src").agg(F.count("*").cast("double")
                                   .alias("deg")).persist())
    e = e.persist()
    base = (1.0 - damping) / float(n)
    init = (F.col("tele") if teleport is not None
            else F.lit(1.0 / float(n)))
    ranks = nodes.withColumn("rank", init)
    for it in range(num_iters):
        rd = ranks.join(outdeg, ranks.node == outdeg.src, "left")
        # the dangling mass stays a 1-row DataFrame broadcast into the
        # update — NO per-iteration driver action, so the k iterations
        # build one lazy plan that only materializes at the
        # localCheckpoint boundaries (a collect here would re-execute
        # the growing prefix every round: O(k²) total work)
        dang = (rd.where(F.col("deg").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")))
        contribs = (e.join(rd.where(F.col("deg").isNotNull())
                           .select("node", "rank", "deg"),
                           e.src == F.col("node"))
                    .groupBy("tgt")
                    .agg(F.sum(F.col("rank") / F.col("deg"))
                         .alias("contrib")))
        if teleport is not None:
            upd = (F.lit(1.0 - damping) * F.col("tele")
                   + F.lit(damping)
                   * (F.coalesce(F.col("contrib"), F.lit(0.0))
                      + F.col("dm") * F.col("tele")))
        else:
            upd = (F.lit(base) + F.lit(damping)
                   * (F.coalesce(F.col("contrib"), F.lit(0.0))
                      + F.col("dm") / F.lit(float(n))))
        keep = ["node"] + (["tele"] if teleport is not None else [])
        ranks = (nodes.join(contribs, nodes.node == contribs.tgt, "left")
                 .crossJoin(F.broadcast(dang))
                 .select(*keep, upd.alias("rank")))
        if (it + 1) % checkpoint_every == 0 and it + 1 < num_iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")
