"""Deduplication operators for web-text corpora.

Engine additions for the training-data pipeline. All hot paths stay
JVM-side (xxhash64, higher-order array functions); only SimHash drops to a
pandas UDF (bit-level accumulation).

- exact_dedup: hash-groupBy on content → keeper per group.
- minhash_signatures / minhash_lsh_candidates / minhash_dedup_pairs:
  shingle → 64-perm MinHash (xxhash64 salted) → banded LSH buckets →
  candidate pairs → exact Jaccard verify. The standard scale path:
  candidate generation is a groupBy on band-bucket (shuffle bounded by
  bucket sizes), never an all-pairs join.
- simhash_64: 64-bit SimHash + banded buckets for Hamming-near candidates.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_MINHASH = 64
N_BANDS = 16  # 16 bands × 4 rows


def shingles_col(text_col, n: int = 3):
    """Word n-gram shingle array (distinct), JVM-side. Docs shorter than n
    tokens yield an empty array (element_at throws on OOB in Spark 4, so
    short docs must be guarded, not clamped)."""
    w = F.split(text_col, " ")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws("\x01", *[F.element_at(w, i + j + 1) for j in range(n)]),
        )
    )
    return F.when(F.size(w) >= n, sh).otherwise(F.array().cast("array<string>"))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: keeper id (min), group size, md5."""
    return (
        docs.groupBy(text_col)
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("group_size"))
        .select(
            "keeper_id", "group_size",
            F.md5(F.encode(F.col(text_col), "UTF-8")).alias("fp"),
        )
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = N_MINHASH, shingle_n: int = 3,
) -> DataFrame:
    """(id, minhash array<long>) — min over shingles of xxhash64(shingle, salt_j),
    one salted hash family per signature position. Entirely JVM expressions."""
    sh = shingles_col(F.col(text_col), shingle_n)
    mins = F.array(
        *[
            F.array_min(F.transform(F.col("__sh"), lambda s, j=j: F.xxhash64(s, F.lit(j))))
            for j in range(n_hashes)
        ]
    )
    return docs.select(F.col(id_col), sh.alias("__sh")).select(
        id_col, mins.alias("minhash")
    )


def minhash_lsh_candidates(
    sigs: DataFrame, id_col: str = "doc_id", n_bands: int = N_BANDS,
    n_hashes: int = N_MINHASH,
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket → candidate pairs (a < b)."""
    rows_per_band = n_hashes // n_bands
    bands = F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[F.element_at("minhash", b * rows_per_band + r + 1) for r in range(rows_per_band)],
            )
            for b in range(n_bands)
        ]
    )
    exploded = sigs.select(F.col(id_col), F.explode(bands).alias("bucket"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def minhash_dedup_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.5, shingle_n: int = 3,
) -> DataFrame:
    """Full MinHash→LSH→verify pipeline: candidate pairs verified with exact
    shingle-set Jaccard ≥ threshold. Output (doc_a, doc_b, jaccard)."""
    sh = docs.select(F.col(id_col), shingles_col(F.col(text_col), shingle_n).alias("sh")).where(
        F.size("sh") > 0  # shingle-less docs (shorter than n tokens) can't near-dup
    )
    sigs = minhash_signatures(docs, text_col, id_col, shingle_n=shingle_n)
    cand = minhash_lsh_candidates(sigs, id_col)
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = cand.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.try_divide(inter, union)  # ANSI-safe: 0/0 → NULL → filtered
    return (
        joined.withColumn("jaccard", F.round(jac, 4))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _md5_int64(token: str) -> int:
    return int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "little", signed=True)


def simhash_64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens (md5-derived token hashes —
    deterministic across processes, unlike Python's builtin hash)."""

    def gen(batches):
        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                toks = t.split(" ") if t else []
                acc = np.zeros(64, dtype=np.int64)
                for tok in toks:
                    h = _md5_int64(tok)
                    bits = (h >> np.arange(64)) & 1
                    acc += np.where(bits == 1, 1, -1)
                sh = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
                out.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": pd.Series(out, dtype="int64")})

    return docs.select(id_col, text_col).mapInPandas(gen, f"{id_col} long, simhash long")


def simhash_candidates(sim: DataFrame, id_col: str = "doc_id", bands: int = 4) -> DataFrame:
    """Docs sharing any 16-bit SimHash band (Hamming ≤ ~3·16 heuristic)."""
    width = 64 // bands
    mask = (1 << width) - 1
    band_arr = F.array(
        *[
            (F.shiftrightunsigned(F.col("simhash"), b * width).bitwiseAND(F.lit(mask))
             + F.lit(b << 32)).cast("long")
            for b in range(bands)
        ]
    )
    e = sim.select(F.col(id_col), F.explode(band_arr).alias("bucket"))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
