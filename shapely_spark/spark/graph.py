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

from pyspark.sql import DataFrame, Window
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


def triangles(
    edges: DataFrame,
    src: str = "src",
    tgt: str = "tgt",
) -> DataFrame:
    """Exact triangle listing over the UNDIRECTED simple graph (self
    loops dropped, parallel/reverse edges collapsed): one row per
    triangle, vertices sorted ascending (a < b < c).

    Scale shape: the standard degree-ordered orientation (each edge
    points lower-(degree, id) → higher-(degree, id)) makes every
    triangle countable at exactly one vertex AND bounds the wedge
    fan-out per center by the graph's degeneracy (~sqrt(m) on web/social
    graphs) — the skew fix that keeps a celebrity node from exploding
    the self-join. Two shuffles total: the wedge build (self-join on the
    center) and the closing-edge semi-join; counts are integers, so the
    result is engine-exact (no float summation concerns)."""
    e = edges.select(F.col(src).alias("x"), F.col(tgt).alias("y"))
    und = (e.where(F.col("x") != F.col("y"))
           .select(F.least("x", "y").alias("u"),
                   F.greatest("x", "y").alias("v"))
           .distinct().persist())  # reused: degrees, orientation, closing
    deg = (und.select(F.col("u").alias("n"))
           .union(und.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count("*").alias("d")))
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    # orient lower (degree, id) -> higher (degree, id)
    j = und.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    o = j.select(F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
                 F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"))
    # wedges centered at the vertex with two out-edges (every triangle
    # has exactly one such vertex under an acyclic orientation); the
    # closing edge is looked up in the canonical undirected set
    w1 = o.select(F.col("a").alias("ctr"), F.col("b").alias("u"))
    w2 = o.select(F.col("a").alias("ctr"), F.col("b").alias("v"))
    wedges = (w1.join(w2, "ctr")
              .where(F.col("u") < F.col("v")))  # unordered pair, once
    tri = wedges.join(und, ["u", "v"])
    return tri.select(
        F.least("ctr", "u", "v").alias("a"),
        (F.col("ctr") + F.col("u") + F.col("v")
         - F.least("ctr", "u", "v")
         - F.greatest("ctr", "u", "v")).alias("b"),
        F.greatest("ctr", "u", "v").alias("c"))


def node_triangle_counts(edges: DataFrame, src: str = "src",
                         tgt: str = "tgt") -> DataFrame:
    """(node, n_triangles) for every node in ≥1 triangle — the local
    clustering numerator. One explode + partial-agg shuffle over the
    triangle list."""
    t = triangles(edges, src, tgt)
    return (t.select(F.explode(F.array("a", "b", "c")).alias("node"))
            .groupBy("node")
            .agg(F.count("*").cast("long").alias("n_triangles")))


def clustering_coefficients(edges: DataFrame, src: str = "src",
                            tgt: str = "tgt") -> DataFrame:
    """(node, degree, n_triangles, coeff) — the local clustering
    coefficient 2·T(v) / (d(v)·(d(v)−1)) over the undirected simple
    graph; nodes of degree < 2 get coeff 0. Degree is one partial-agg
    shuffle over the canonical undirected edge set, the triangle
    numerator rides ``node_triangle_counts`` (degree-oriented, skew
    bounded by degeneracy), and the division is a map-side expression —
    only the integer (degree, triangle) relations ever shuffle."""
    e = edges.select(F.col(src).alias("x"), F.col(tgt).alias("y"))
    und = (e.where(F.col("x") != F.col("y"))
           .select(F.least("x", "y").alias("u"),
                   F.greatest("x", "y").alias("v"))
           .distinct())
    deg = (und.select(F.col("u").alias("node"))
           .union(und.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").cast("long").alias("degree")))
    tri = node_triangle_counts(edges, src, tgt)
    d = F.col("degree").cast("double")
    return (deg.join(tri, "node", "left")
            .select("node", "degree",
                    F.coalesce(F.col("n_triangles"), F.lit(0).cast("long"))
                    .alias("n_triangles"))
            .withColumn(
                "coeff",
                F.when(F.col("degree") >= 2,
                       2.0 * F.col("n_triangles").cast("double")
                       / (d * (d - 1.0))).otherwise(F.lit(0.0))))


def hits(
    edges: DataFrame,
    num_iters: int = 8,
    src: str = "src",
    tgt: str = "tgt",
    nodes: DataFrame | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(node, auth, hub) after ``num_iters`` HITS iterations (Kleinberg
    1999, the hubs-and-authorities companion to PageRank): each
    iteration pulls authority from in-edge hubs then hub from out-edge
    authorities, L1-normalizing after each half-step (sum-to-1 — keeps
    every quantity a plain double sum both engines reproduce, unlike
    the L2 norm's sqrt).

    Scale shape mirrors ``pagerank``: per half-step ONE edge⋈score
    contribution join with per-target partial aggregation, the norm
    stays a broadcast 1-row relation (no per-iteration driver action),
    and lineage is truncated by localCheckpoint. The directed edge set
    is deduplicated — a parallel edge is one endorsement."""
    e = (edges.select(F.col(src).alias("src"), F.col(tgt).alias("tgt"))
         .where(F.col("src") != F.col("tgt")).distinct().persist())
    if nodes is None:
        nodes = (e.select(F.col("src").alias("node"))
                 .union(e.select(F.col("tgt").alias("node"))).distinct())
    else:
        cols = nodes.columns
        nodes = nodes.select(F.col(cols[0]).alias("node"))
    nodes = nodes.repartition("node").persist()
    n = nodes.count()
    if n == 0:
        raise ValueError("empty graph")
    scores = nodes.select("node", F.lit(1.0 / float(n)).alias("hub"))

    def _pull(sc, score_col, edge_from, edge_to, out_col):
        contribs = (e.join(sc.select(F.col("node"), F.col(score_col)),
                           F.col(edge_from) == F.col("node"))
                    .groupBy(edge_to)
                    .agg(F.sum(score_col).alias("contrib")))
        # persist: raw feeds BOTH the norm aggregate and the divide —
        # un-persisted, the whole contribution join re-executes per
        # reference, and the duplication compounds across half-steps
        # (measured 2× wall on the 5-iteration gate)
        raw = (nodes.join(contribs, nodes.node == F.col(edge_to), "left")
               .select("node", F.coalesce(F.col("contrib"), F.lit(0.0))
                       .alias("raw"))
               .persist())
        tot = raw.agg(F.sum("raw").alias("tot"))
        return (raw.crossJoin(F.broadcast(tot))
                .select("node", (F.col("raw") / F.col("tot"))
                        .alias(out_col)))

    for it in range(num_iters):
        # auth is referenced twice (the hub pull + the scores join) —
        # persist so the half-step executes once
        auth = _pull(scores, "hub", "src", "tgt", "auth").persist()
        hub = _pull(auth, "auth", "tgt", "src", "hub")
        scores = auth.join(hub, "node")
        if (it + 1) % checkpoint_every == 0 and it + 1 < num_iters:
            scores = scores.localCheckpoint(eager=True)
    return scores.select("node", "auth", "hub")


def bfs_depths(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 6,
    src: str = "src",
    tgt: str = "tgt",
) -> DataFrame:
    """(node, depth): fewest hops from the seed set along directed
    edges, for every node reachable within ``max_depth`` — the crawl
    depth a frontier starting at the seeds assigns each page/host (the
    selection signal shallow-crawl corpora cut on).

    Level-synchronous BFS: round d joins the CURRENT frontier (nodes
    first reached at depth d) against the edge relation, anti-joins the
    visited set, and min-aggregates to the new frontier — so each edge
    is traversed at most once per endpoint discovery, state is
    (node, depth) only, and the rounds (≤ max_depth of them, web graphs
    are shallow) each cost one join + one anti-join shuffle. Frontier
    and visited are checkpointed per round: iterative lineage stays
    O(1) and a dead executor replays one round, not the whole walk.
    Seeds themselves are depth 0; unreachable nodes are absent."""
    e = edges.select(F.col(src).alias("a"), F.col(tgt).alias("b"))
    scol = seeds.columns[0]
    frontier = (seeds.select(F.col(scol).alias("node")).distinct()
                .withColumn("depth", F.lit(0))
                .localCheckpoint(eager=True))
    visited = frontier
    for d in range(1, max_depth + 1):
        nxt = (e.join(frontier.select(F.col("node").alias("a")), "a")
               .select(F.col("b").alias("node")).distinct()
               .join(visited.select("node"), "node", "left_anti")
               .withColumn("depth", F.lit(d))
               .localCheckpoint(eager=True))
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def label_propagation(
    edges: DataFrame,
    num_iters: int = 5,
    src: str = "src",
    tgt: str = "tgt",
    nodes: DataFrame | None = None,
) -> DataFrame:
    """(node, label) after ``num_iters`` SYNCHRONOUS label-propagation
    rounds (Raghavan et al. 2007) over the undirected view of the edge
    set: every node adopts the most frequent label among its neighbors,
    ties broken by the SMALLEST label — fully deterministic, no random
    visit order, so two engines (and two cluster runs) agree exactly.
    Labels start as node ids; isolated nodes keep their own label.

    The community structure of a host graph is the standard
    mirror/site-family signal (template farms, country mirrors) used to
    diversify a crawl corpus. Per round: one neighbor-label join + one
    (node, label) partial-agg count + one per-node top-1 window — the
    count relation is (node, distinct neighbor label) grain, so a hub's
    million same-label neighbors combine map-side before the shuffle.
    Synchronous + deterministic tie-break can oscillate on bipartite
    structures instead of converging; run a fixed round budget and cut
    (the web-graph convention), labels checkpointed per round."""
    e = edges.select(F.col(src).alias("a"), F.col(tgt).alias("b"))
    sym = (e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
           .where(F.col("a") != F.col("b")).distinct()
           .localCheckpoint(eager=True))
    if nodes is None:
        nodes = (sym.select(F.col("a").alias("node")).distinct())
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node"))
    nodes = nodes.repartition("node").persist()
    labels = nodes.withColumn("lab", F.col("node"))
    w = Window.partitionBy("ctr").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(num_iters):
        cnt = (sym.join(labels.withColumnRenamed("node", "b"), "b")
               .groupBy(F.col("a").alias("ctr"), "lab")
               .agg(F.count("*").alias("c")))
        top = (cnt.withColumn("__r", F.row_number().over(w))
               .where(F.col("__r") == 1)
               .select(F.col("ctr").alias("node"), F.col("lab").alias("new")))
        labels = (labels.join(top, "node", "left")
                  .select("node", F.coalesce("new", "lab").alias("lab"))
                  .localCheckpoint(eager=True))
    return labels.select("node", F.col("lab").alias("label"))
