"""Distributed k-means + SemDeDup (shapely_spark/ann/cluster.py).

The oracle queries (kmeans_cluster_stats, semantic_dedup_keep) pin the
cross-engine determinism contract; these tests pin the algorithm itself
against an in-process numpy replay and planted fixtures.
"""

import numpy as np
import pandas as pd
import pytest

from shapely_spark.ann.cluster import (
    CENT_DECIMALS,
    DIST_DECIMALS,
    _assign_np,
    _normalize_rows,
    kmeans_assign,
    kmeans_fit,
    semantic_dedup,
)


def _vec_df(spark, V, ids=None):
    ids = range(len(V)) if ids is None else ids
    pdf = pd.DataFrame({
        "vec_id": np.asarray(list(ids), dtype=np.int64),
        "embedding": [np.asarray(v, dtype=np.float64) for v in V],
    })
    return spark.createDataFrame(pdf)


def _numpy_lloyds(V, k, iters, normalize=True):
    """Single-process replay of the exact quantized recurrence."""
    W = _normalize_rows(V.astype(np.float64)) if normalize else V.astype(np.float64)
    C = np.round(W[:k], CENT_DECIMALS)
    for _ in range(iters):
        a = _assign_np(W, C)
        newC = C.copy()
        for c in range(k):
            m = a == c
            if m.any():
                newC[c] = W[m].sum(axis=0) / m.sum()
        C = np.round(newC, CENT_DECIMALS)
    return C


def test_kmeans_matches_numpy_replay(spark):
    rng = np.random.default_rng(11)
    V = rng.normal(size=(60, 6))
    df = _vec_df(spark, V)
    C = kmeans_fit(df, k=4, iters=3)
    ref = _numpy_lloyds(V, k=4, iters=3)
    np.testing.assert_array_equal(C, ref)
    # assignment DF matches the numpy assignment under the final model
    a = {r["vec_id"]: r["cluster"]
         for r in kmeans_assign(df, C).collect()}
    ref_a = _assign_np(_normalize_rows(V), ref)
    assert [a[i] for i in range(len(V))] == list(ref_a)


def test_kmeans_recovers_planted_blobs(spark):
    rng = np.random.default_rng(5)
    centers = np.array([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 10.0]])
    V = np.concatenate([c + 0.05 * rng.normal(size=(20, 3)) for c in centers])
    # interleave so the k init seeds span blobs
    order = np.argsort(np.tile(np.arange(20), 3), kind="stable")
    V = V[order]
    df = _vec_df(spark, V)
    C = kmeans_fit(df, k=3, iters=4)
    a = np.array([r["cluster"] for r in
                  kmeans_assign(df, C).orderBy("vec_id").collect()])
    blob = np.argmax(V, axis=1)
    # each blob maps to exactly one cluster and the mapping is a bijection
    mapping = {}
    for b in range(3):
        cs = set(a[blob == b])
        assert len(cs) == 1
        mapping[b] = cs.pop()
    assert len(set(mapping.values())) == 3


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # 4 identical points, k=2: init seeds are the same (normalized)
    # vector twice; every row ties to cluster 0 (lowest index), so
    # cluster 1 never receives members and must keep its init centroid.
    V = np.tile(np.array([[3.0, 4.0]]), (4, 1))
    df = _vec_df(spark, V)
    C = kmeans_fit(df, k=2, iters=2)
    expect = np.round(np.array([[0.6, 0.8]]), CENT_DECIMALS)
    np.testing.assert_array_equal(C[0], expect[0])
    np.testing.assert_array_equal(C[1], expect[0])  # kept init, == seed
    a = [r["cluster"] for r in kmeans_assign(df, C).collect()]
    assert a == [0, 0, 0, 0]  # rounded-distance tie -> lowest index


def test_assign_rounds_distances(spark):
    # distances differing below the 9-dp guard tie to the lower index
    C = np.array([[1.0, 0.0], [1.0 + 10 ** -(DIST_DECIMALS + 3), 0.0]])
    V = np.array([[1.0, 0.0]])
    assert _assign_np(V, C, block=4)[0] == 0


def test_semantic_dedup_drops_planted_copies(spark):
    rng = np.random.default_rng(7)
    V = rng.normal(size=(30, 8))
    ids = list(range(30))
    # scaled copies of ids 0..4 under later ids: cosine exactly 1
    V2 = np.concatenate([V, 2.5 * V[:5]])
    ids2 = ids + [100 + i for i in range(5)]
    df = _vec_df(spark, V2, ids2)
    out = semantic_dedup(df, k=3, iters=2, tau=0.95).collect()
    keep = {r["vec_id"]: r["keep"] for r in out}
    clus = {r["vec_id"]: r["cluster"] for r in out}
    assert len(keep) == 35
    for i in range(5):
        assert clus[100 + i] == clus[i]  # norm-invariant co-clustering
        assert keep[i] is True           # earliest id survives
        assert keep[100 + i] is False    # the copy drops
    # nothing else drops at tau=0.95 on random gaussians
    assert sum(not v for v in keep.values()) == 5


def test_semantic_dedup_keeps_earliest_of_chain(spark):
    # three mutual near-dups: only the smallest id survives
    v = np.array([1.0, 2.0, 3.0, 4.0])
    V = np.stack([v, 2 * v, 3 * v, np.array([-4.0, 3.0, -2.0, 1.0])])
    df = _vec_df(spark, V, [10, 20, 30, 40])
    out = {r["vec_id"]: r["keep"]
           for r in semantic_dedup(df, k=2, iters=1, tau=0.99).collect()}
    assert out == {10: True, 20: False, 30: False, 40: True}


def test_kmeans_k_exceeds_rows_raises(spark):
    df = _vec_df(spark, np.eye(3))
    with pytest.raises(ValueError):
        kmeans_fit(df, k=5, iters=1)
