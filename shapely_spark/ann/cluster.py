"""Distributed k-means over an embedding column + SemDeDup semantic dedup.

Two operators a training-data pipeline needs at the 10^9-embedding scale:

- `kmeans_fit` — Lloyd's k-means expressed as DataFrame passes. The
  existing IVF trainer (ann/search.py `_kmeans_centroids`) collects the
  target vectors to the driver: right for the documented <~100k-target
  broadcast tier, wrong for clustering a full corpus. Here every
  iteration is ONE `mapInPandas` pass that fuses assignment with
  per-batch partial centroid sums (k*d rows per batch), followed by one
  partial-aggregated shuffle of (cluster, dim) cells; the driver only
  ever holds k*d doubles. Nothing collects the vector table.

- `semantic_dedup` — SemDeDup (Abbas et al., arXiv:2303.09540): cluster
  the corpus embeddings on the unit sphere, then confine the quadratic
  near-duplicate search WITHIN clusters: a row is dropped when an
  earlier-id row of the same cluster has cosine >= tau. The cluster
  count k is the knob that bounds per-group memory (the paper uses
  k ~ 11k for 100M embeddings); for clusters too large for one group,
  the blocked pair machinery in ann/search.cosine_neardup_pairs_bucketed
  is the escape hatch.

Cross-engine determinism (the oracle gate runs the same algorithm in
DuckDB): centroids are quantized to 6 decimals between iterations and
squared distances to 9 decimals before the argmin (ties -> lowest
cluster index), so both engines walk identical centroid sequences —
fp noise from differing summation orders (numpy pairwise vs SQL
sequential folds, ~1e-14 on O(100) values) sits far below both
rounding guards. Initialization is the k smallest-id vectors: fully
deterministic, no RNG.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_fit", "kmeans_assign", "semantic_dedup"]

#: squared-distance rounding before argmin — the cross-engine tie guard.
DIST_DECIMALS = 9
#: centroid quantization between iterations.
CENT_DECIMALS = 6


def _normalize_rows(V: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(V, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return V / n


def _vec_matrix(series: pd.Series) -> np.ndarray:
    return np.array(list(series), dtype=np.float64)


def _assign_np(V: np.ndarray, C: np.ndarray, block: int = 4096) -> np.ndarray:
    """argmin_c round(||v - c||^2, 9), first (lowest) index on ties."""
    out = np.empty(len(V), dtype=np.int32)
    for s in range(0, len(V), block):
        D = ((V[s:s + block, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        out[s:s + block] = np.argmin(np.round(D, DIST_DECIMALS), axis=1)
    return out


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> np.ndarray:
    """Fit k centroids with `iters` Lloyd's updates; returns the final
    (k, d) float64 centroid matrix (quantized to 6 decimals).

    - init: the vectors of the k smallest ids (collects k rows only).
    - normalize=True runs on the unit sphere (the SemDeDup / spherical
      IVF convention); centroids are plain means of the normalized
      members (not re-normalized).
    - empty clusters keep their previous centroid.

    Per iteration: one fused mapInPandas pass emitting k*d partial-sum
    cells per batch + one (cluster, dim) partial-agg shuffle; the
    vectors DataFrame is evaluated `iters` times — persist it upstream
    when the scan is expensive.
    """
    init_rows = (
        vectors.select(id_col, vec_col)
        .orderBy(id_col).limit(k).collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"k={k} exceeds row count {len(init_rows)}")
    C = np.array([list(r[1]) for r in init_rows], dtype=np.float64)
    if normalize:
        C = _normalize_rows(C)
    C = np.round(C, CENT_DECIMALS)
    d = C.shape[1]

    for _ in range(iters):
        Cb = C

        def gen(batches, Cb=Cb):
            kk, dd = Cb.shape
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = _vec_matrix(pdf[vec_col])
                if normalize:
                    V = _normalize_rows(V)
                a = _assign_np(V, Cb)
                sums = np.zeros((kk, dd))
                cnt = np.zeros(kk, dtype=np.int64)
                for c in range(kk):
                    m = a == c
                    nc = int(m.sum())
                    if nc:
                        cnt[c] = nc
                        sums[c] = V[m].sum(axis=0)
                yield pd.DataFrame({
                    "cluster": np.repeat(np.arange(kk, dtype=np.int32), dd),
                    "dim": np.tile(np.arange(dd, dtype=np.int32), kk),
                    "s": sums.ravel(),
                    "n": np.repeat(cnt, dd),
                })

        cells = (
            vectors.select(vec_col)
            .mapInPandas(gen, "cluster int, dim int, s double, n long")
            .groupBy("cluster", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        newC = C.copy()
        for r in cells:
            if r["n"] > 0:
                newC[r["cluster"], r["dim"]] = r["s"] / r["n"]
        C = np.round(newC, CENT_DECIMALS)
    assert C.shape == (k, d)
    return C


def kmeans_assign(
    vectors: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
    keep_vec: bool = False,
) -> DataFrame:
    """Assign each row to its nearest centroid (same rounded-distance /
    lowest-index-tie rule as training). Returns (id_col[, vec_col],
    cluster int)."""
    C = np.round(np.asarray(centroids, dtype=np.float64), CENT_DECIMALS)

    @F.pandas_udf("int")
    def assign(vec: pd.Series) -> pd.Series:
        V = _vec_matrix(vec)
        if normalize:
            V = _normalize_rows(V)
        return pd.Series(_assign_np(V, C))

    cols = [id_col, vec_col] if keep_vec else [id_col]
    return vectors.select(*cols, assign(F.col(vec_col)).alias("cluster"))


def semantic_dedup(
    vectors: DataFrame,
    centroids: np.ndarray | None = None,
    k: int = 8,
    iters: int = 3,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup keep/drop decisions: (id_col, cluster, keep).

    A row is dropped when an EARLIER-id row of the same cluster has
    round(cosine, 6) >= tau — the deterministic anti-join-to-earlier-
    near-dup keeper rule (same convention as dedup_exact), confined to
    clusters so the pairwise work is O(sum c_i^2), not O(n^2).
    Clustering always runs on the unit sphere (cosine geometry).
    """
    if centroids is None:
        centroids = kmeans_fit(vectors, k=k, iters=iters, id_col=id_col,
                               vec_col=vec_col, normalize=True)
    a = kmeans_assign(vectors, centroids, id_col=id_col, vec_col=vec_col,
                      normalize=True, keep_vec=True)

    def dedup(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        V = _normalize_rows(_vec_matrix(pdf[vec_col]))
        S = np.round(V @ V.T, 6)
        drop = np.tril(S >= tau, -1).any(axis=1)
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(np.int64),
            "cluster": pdf["cluster"].to_numpy(np.int32),
            "keep": ~drop,
        })

    return a.groupBy("cluster").applyInPandas(
        dedup, f"{id_col} long, cluster int, keep boolean")
