"""Distributed PageRank (spark/graph.py) vs a numpy power-iteration
reference, plus the dangling/isolated-node and determinism contracts."""

import numpy as np
import pytest

from shapely_spark.spark.graph import pagerank


def _np_pagerank(n, edges, iters=10, d=0.85):
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[deg == 0].sum()
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[t] += r[s] / deg[s]
        r = (1 - d) / n + d * (contrib + dang / n)
    return r


def test_matches_numpy_reference(spark):
    n = 60
    edges = [(i, (i * 7 + j * 13) % n) for i in range(n)
             for j in range(1 + i % 3)]
    edges = sorted(set(edges))
    edf = spark.createDataFrame(edges, "src long, tgt long")
    nodes = spark.range(n).withColumnRenamed("id", "node")
    got = {r.node: r.rank
           for r in pagerank(edf, num_iters=10, nodes=nodes).collect()}
    want = _np_pagerank(n, edges, 10)
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-12), i


def test_rank_mass_conserved_with_dangling(spark):
    # node 2 dangles; total rank stays 1 every iteration by construction
    edf = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2)], "src long, tgt long")
    out = pagerank(edf, num_iters=7).collect()
    assert sum(r.rank for r in out) == pytest.approx(1.0, abs=1e-12)


def test_hand_computed_two_node_cycle(spark):
    # 0<->1: symmetric, every iteration keeps rank = 0.5 each
    edf = spark.createDataFrame([(0, 1), (1, 0)], "src long, tgt long")
    out = {r.node: r.rank for r in pagerank(edf, num_iters=5).collect()}
    assert out[0] == pytest.approx(0.5) and out[1] == pytest.approx(0.5)


def test_isolated_nodes_via_nodes_param(spark):
    edf = spark.createDataFrame([(0, 1)], "src long, tgt long")
    nodes = spark.range(4).withColumnRenamed("id", "node")
    out = {r.node: r.rank
           for r in pagerank(edf, num_iters=3, nodes=nodes).collect()}
    assert set(out) == {0, 1, 2, 3}
    # isolated nodes are dangling: they keep the base + redistribution
    assert out[2] == pytest.approx(out[3])
    assert out[1] > out[0]  # 1 receives 0's full contribution


def test_partition_invariance(spark):
    n = 40
    edges = [(i, (i * 11 + 3) % n) for i in range(n)]
    a = {r.node: round(r.rank, 12) for r in pagerank(
        spark.createDataFrame(edges, "src long, tgt long"),
        num_iters=6).collect()}
    b = {r.node: round(r.rank, 12) for r in pagerank(
        spark.createDataFrame(edges, "src long, tgt long").repartition(13),
        num_iters=6).collect()}
    assert a == b


def test_empty_graph_raises(spark):
    edf = spark.createDataFrame([], "src long, tgt long")
    with pytest.raises(ValueError, match="empty"):
        pagerank(edf, num_iters=2)
