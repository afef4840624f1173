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


# ---------------------------------------------------------------------------
# clustering coefficients + HITS
# ---------------------------------------------------------------------------

def _np_hits(n, edges, iters):
    import numpy as np

    e = sorted({(s, t) for s, t in edges if s != t})
    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    for _ in range(iters):
        auth = np.zeros(n)
        for s, t in e:
            auth[t] += hub[s]
        auth /= auth.sum()
        hub = np.zeros(n)
        for s, t in e:
            hub[s] += auth[t]
        hub /= hub.sum()
    return auth, hub


def test_hits_matches_numpy_reference(spark):
    from shapely_spark.spark.graph import hits

    n = 40
    edges = [(i, (i * 11 + j * 17) % n) for i in range(n)
             for j in range(1 + i % 3)]
    edf = spark.createDataFrame(edges, "src long, tgt long")
    nodes = spark.range(n).withColumnRenamed("id", "node")
    got = {r.node: (r.auth, r.hub)
           for r in hits(edf, num_iters=6, nodes=nodes).collect()}
    a, h = _np_hits(n, edges, 6)
    for i in range(n):
        assert got[i][0] == pytest.approx(a[i], abs=1e-12), i
        assert got[i][1] == pytest.approx(h[i], abs=1e-12), i


def test_hits_l1_normalized_and_star_shape(spark):
    from shapely_spark.spark.graph import hits

    # star: 1..4 all point at 0 — node 0 is the pure authority, the
    # leaves are equal pure hubs, at every iteration count
    edf = spark.createDataFrame([(i, 0) for i in range(1, 5)],
                                "src long, tgt long")
    out = {r.node: (r.auth, r.hub) for r in hits(edf, num_iters=3).collect()}
    assert sum(v[0] for v in out.values()) == pytest.approx(1.0, abs=1e-12)
    assert sum(v[1] for v in out.values()) == pytest.approx(1.0, abs=1e-12)
    assert out[0][0] == pytest.approx(1.0)
    assert out[0][1] == pytest.approx(0.0)
    for i in range(1, 5):
        assert out[i][1] == pytest.approx(0.25)


def test_hits_parallel_and_reverse_edges_dedupe(spark):
    from shapely_spark.spark.graph import hits

    a = spark.createDataFrame([(0, 1), (0, 1), (1, 0), (2, 1), (2, 2)],
                              "src long, tgt long")
    b = spark.createDataFrame([(0, 1), (1, 0), (2, 1)],
                              "src long, tgt long")
    ga = {r.node: (r.auth, r.hub) for r in hits(a, num_iters=4).collect()}
    gb = {r.node: (r.auth, r.hub) for r in hits(b, num_iters=4).collect()}
    assert set(ga) == set(gb) | {2} or set(ga) == set(gb)
    for k in gb:
        assert ga[k][0] == pytest.approx(gb[k][0], abs=1e-12)
        assert ga[k][1] == pytest.approx(gb[k][1], abs=1e-12)


def test_clustering_coefficients_hand_graph(spark):
    from shapely_spark.spark.graph import clustering_coefficients

    # triangle 0-1-2 plus pendant 3 attached to 2
    edf = spark.createDataFrame([(0, 1), (1, 2), (2, 0), (2, 3)],
                                "src long, tgt long")
    out = {r.node: r for r in clustering_coefficients(edf).collect()}
    assert out[0].coeff == pytest.approx(1.0)   # deg 2, 1 triangle
    assert out[1].coeff == pytest.approx(1.0)
    assert out[2].coeff == pytest.approx(1.0 / 3.0)  # deg 3, 1 of 3 pairs
    assert out[3].coeff == 0.0 and out[3].degree == 1
    assert out[2].n_triangles == 1 and out[3].n_triangles == 0


def test_clustering_coefficients_complete_graph(spark):
    from shapely_spark.spark.graph import clustering_coefficients

    k = 6
    edf = spark.createDataFrame(
        [(i, j) for i in range(k) for j in range(k) if i < j],
        "src long, tgt long")
    out = clustering_coefficients(edf).collect()
    assert len(out) == k
    for r in out:
        assert r.coeff == pytest.approx(1.0)
        assert r.degree == k - 1
        assert r.n_triangles == (k - 1) * (k - 2) // 2


class TestBfsDepths:
    def _run(self, spark, edges, seeds, **kw):
        from shapely_spark.spark.graph import bfs_depths
        e = spark.createDataFrame(edges, "src long, tgt long")
        s = spark.createDataFrame([(x,) for x in seeds], "node long")
        return {r.node: r.depth for r in bfs_depths(e, s, **kw).collect()}

    def test_hand_graph_min_depths(self, spark):
        # 0→1→2→3, 0→3 shortcut: depth(3) must be 1, not 3
        got = self._run(spark, [(0, 1), (1, 2), (2, 3), (0, 3)], [0])
        assert got == {0: 0, 1: 1, 2: 2, 3: 1}

    def test_two_seeds_and_unreachable(self, spark):
        got = self._run(spark, [(0, 1), (5, 6), (8, 9)], [0, 5])
        assert got == {0: 0, 5: 0, 1: 1, 6: 1}  # 8,9 unreachable: absent

    def test_max_depth_cutoff(self, spark):
        chain = [(i, i + 1) for i in range(10)]
        got = self._run(spark, chain, [0], max_depth=3)
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_cycle_terminates(self, spark):
        got = self._run(spark, [(0, 1), (1, 2), (2, 0)], [0], max_depth=10)
        assert got == {0: 0, 1: 1, 2: 2}

    def test_seed_rediscovery_keeps_depth_zero(self, spark):
        got = self._run(spark, [(0, 1), (1, 0)], [0])
        assert got[0] == 0


class TestLabelPropagation:
    def _run(self, spark, edges, iters=5, nodes=None):
        from shapely_spark.spark.graph import label_propagation
        e = spark.createDataFrame(edges, "src long, tgt long")
        nd = (spark.createDataFrame([(x,) for x in nodes], "node long")
              if nodes is not None else None)
        return {r.node: r.label
                for r in label_propagation(e, num_iters=iters,
                                           nodes=nd).collect()}

    @staticmethod
    def _reference(edges, iters, nodes=None):
        """Tiny python twin of the deterministic synchronous update:
        most-frequent neighbor label, ties to the smallest label."""
        from collections import Counter, defaultdict

        nbrs = defaultdict(set)
        for a, b in edges:
            if a != b:
                nbrs[a].add(b)
                nbrs[b].add(a)
        labels = {v: v for v in (nodes if nodes is not None else nbrs)}
        for _ in range(iters):
            new = {}
            for v, lab in labels.items():
                if not nbrs[v]:
                    new[v] = lab
                    continue
                cnt = Counter(labels[u] for u in nbrs[v])
                best = max(cnt.values())
                new[v] = min(l for l, c in cnt.items() if c == best)
            labels = new
        return labels

    def test_two_cliques_with_bridge_matches_reference(self, spark):
        # cliques {0,1,2} and {10,11,12} joined by one bridge 2-10.
        # NB: with distinct init labels every first-round vote is a tie,
        # so the min tie-break can flood a bridge label into the other
        # clique — the gate semantics are "exact deterministic rounds",
        # pinned here against an independent python twin.
        clique = lambda ids: [(a, b) for a in ids for b in ids if a < b]
        edges = clique([0, 1, 2]) + clique([10, 11, 12]) + [(2, 10)]
        got = self._run(spark, edges, iters=6)
        assert got == self._reference(edges, 6)
        assert got[0] == got[1] == got[2] == 0  # left clique settles on 0

    def test_random_graph_matches_reference(self, spark):
        edges = [(i, (i * 13 + 5) % 30) for i in range(30)] + \
                [(i, (i * 7 + 1) % 30) for i in range(0, 30, 2)]
        got = self._run(spark, edges, iters=5)
        assert got == self._reference(edges, 5)

    def test_tie_breaks_to_min_label(self, spark):
        # node 5 has neighbors 1 and 9 (one vote each) → adopts 1
        got = self._run(spark, [(1, 5), (9, 5)], iters=1)
        assert got[5] == 1

    def test_isolated_node_keeps_label(self, spark):
        got = self._run(spark, [(0, 1)], iters=3, nodes=[0, 1, 7])
        assert got[7] == 7

    def test_deterministic_across_runs(self, spark):
        edges = [(i, (i * 7 + 3) % 20) for i in range(20)]
        a = self._run(spark, edges, iters=4)
        b = self._run(spark, edges, iters=4)
        assert a == b
