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


def _np_ppr(n, edges, tele, iters=6, d=0.85):
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    t = np.asarray(tele, dtype=float)
    t = t / t.sum()
    r = t.copy()
    for _ in range(iters):
        dang = r[deg == 0].sum()
        contrib = np.zeros(n)
        for s, tt in edges:
            contrib[tt] += r[s] / deg[s]
        r = (1 - d) * t + d * (contrib + dang * t)
    return r


def test_personalized_matches_numpy_reference(spark):
    n = 40
    edges = sorted({(i, (i * 7 + j * 13) % n) for i in range(n)
                    for j in range(1 + i % 3)})
    tele = [1.0 if i % 5 == 0 else 0.0 for i in range(n)]
    edf = spark.createDataFrame(edges, "src long, tgt long")
    nodes = spark.range(n).withColumnRenamed("id", "node")
    seeds = spark.createDataFrame(
        [(i, 1.0) for i in range(n) if i % 5 == 0], "node long, w double")
    got = {r.node: r.rank for r in pagerank(
        edf, num_iters=6, nodes=nodes, teleport=seeds).collect()}
    want = _np_ppr(n, edges, tele, 6)
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-12), i


def test_personalized_unreachable_nonseed_decays_to_zero(spark):
    # 0 -> 1 (seed 0 only); node 2 has no in-links and is not a seed
    edf = spark.createDataFrame([(0, 1)], "src long, tgt long")
    nodes = spark.range(3).withColumnRenamed("id", "node")
    seeds = spark.createDataFrame([(0, 1.0)], "node long, w double")
    out = {r.node: r.rank for r in pagerank(
        edf, num_iters=8, nodes=nodes, teleport=seeds).collect()}
    assert out[2] == 0.0
    assert out[0] > out[1] > 0.0
    # mass still conserved (dangling node 1's rank returns to the seed)
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-12)


def test_personalized_weights_normalize(spark):
    # weights 2.0/6.0 normalize to 0.25/0.75
    edf = spark.createDataFrame([(0, 1), (1, 0)], "src long, tgt long")
    seeds = spark.createDataFrame(
        [(0, 2.0), (1, 6.0)], "node long, w double")
    a = {r.node: r.rank for r in pagerank(
        edf, num_iters=4, teleport=seeds).collect()}
    seeds2 = spark.createDataFrame(
        [(0, 0.25), (1, 0.75)], "node long, w double")
    b = {r.node: r.rank for r in pagerank(
        edf, num_iters=4, teleport=seeds2).collect()}
    assert a == pytest.approx(b)
    assert a[1] > a[0]


def _brute_triangles(edges):
    adj = {}
    for x, y in edges:
        if x == y:
            continue
        a, b = min(x, y), max(x, y)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    tris = set()
    for a in nodes:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    tris.add((a, b, c))
    return tris


def test_triangles_match_bruteforce(spark):
    from shapely_spark.spark.graph import triangles

    n = 30
    edges = [(i, (i + 1) % n) for i in range(n)]
    edges += [(i, (i + 2) % n) for i in range(n)]
    edges += [(i, (i * 7 + 3) % n) for i in range(0, n, 3)]
    got = {(r.a, r.b, r.c) for r in triangles(
        spark.createDataFrame(edges, "src long, tgt long")).collect()}
    assert got == _brute_triangles(edges)
    assert len(got) >= n  # the two rings alone close n triangles


def test_triangles_dedupe_direction_and_self_loops(spark):
    from shapely_spark.spark.graph import triangles

    # duplicate, reversed, and self-loop edges must not multiply counts
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (1, 2)]
    got = [(r.a, r.b, r.c) for r in triangles(
        spark.createDataFrame(edges, "src long, tgt long")).collect()]
    assert got == [(0, 1, 2)]


def test_node_triangle_counts_star_plus_ring(spark):
    from shapely_spark.spark.graph import node_triangle_counts

    # hub 0 connected to 1..4, ring 1-2-3-4-1: triangles (0,1,2),
    # (0,2,3), (0,3,4), (0,1,4)
    edges = [(0, i) for i in range(1, 5)]
    edges += [(1, 2), (2, 3), (3, 4), (4, 1)]
    out = {r.node: r.n_triangles for r in node_triangle_counts(
        spark.createDataFrame(edges, "src long, tgt long")).collect()}
    assert out == {0: 4, 1: 2, 2: 2, 3: 2, 4: 2}
