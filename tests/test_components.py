"""Connected components / duplicate resolution vs a union-find golden.

The operator under test is pure DataFrame ops (alternating large-star /
small-star); the golden is a driver-side union-find over the same edge
list, so every case checks the full (node → component-min) labeling."""

import random

import pytest

from shapely_spark.text.components import connected_components, resolve_duplicates


def _golden(edges, nodes=None):
    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = nodes if nodes is not None else {n for e in edges for n in e}
    return {n: find(n) for n in touched}


def _run(spark, edges):
    df = spark.createDataFrame(edges or [(0, 0)], "a long, b long")
    if not edges:
        df = df.where("a < 0")
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


CASES = {
    "single_edge": [(5, 3)],
    "path": [(i, i + 1) for i in range(64)],
    "reversed_path": [(i + 1, i) for i in range(64)],
    "clique": [(i, j) for i in range(12) for j in range(i + 1, 12)],
    "star_high_center": [(100, i) for i in range(20)],
    "two_components": [(1, 2), (2, 3), (10, 11), (12, 11)],
    "self_loops_ignored": [(1, 1), (2, 2), (1, 2), (7, 7)],
    "duplicate_edges": [(1, 2), (2, 1), (1, 2), (2, 3)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_components_vs_union_find(spark, name):
    edges = CASES[name]
    got = _run(spark, edges)
    want = _golden([e for e in edges if e[0] != e[1]])
    assert got == want


def test_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(300)]
    edges = [e for e in edges if e[0] != e[1]]
    assert _run(spark, edges) == _golden(edges)


def test_long_path_converges_in_log_rounds(spark):
    # 512-node path: O(diameter) propagation would need ~512 rounds; the
    # star alternation must land well inside the default max_iter=50.
    edges = [(i, i + 1) for i in range(511)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(512)}


def test_empty_edges(spark):
    assert _run(spark, []) == {}


def test_resolve_duplicates_keeper_contract(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (3, 2), (7, 8)], "a long, b long")
    got = {r["doc_id"]: r["keeper_id"] for r in resolve_duplicates(docs, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6, 7: 7, 8: 7, 9: 9}
    # dedup contract: keep rows where keeper_id == doc_id
    kept = sorted(k for k, v in got.items() if k == v)
    assert kept == [0, 1, 4, 5, 6, 7, 9]


def test_resolve_composes_with_minhash_pairs(spark):
    # planted near-dup chain: A~B and B~C pairwise-similar, D distinct;
    # resolution must merge the chain into ONE cluster keyed by min id.
    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    rows = [
        (0, base),
        (1, base + "extra tail words here"),
        (2, base + "extra tail words here plus more"),
        (3, "completely different content " + "zebra yak xylophone " * 10),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from shapely_spark.text.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    got = {
        r["doc_id"]: r["keeper_id"]
        for r in resolve_duplicates(docs, pairs, src="doc_a", dst="doc_b").collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3}
