"""Benchmark decontamination for web-text corpora.

The standard pretraining hygiene step (GPT-3 appendix C; PaLM §8; Llama 2
A.6): a training document is *contaminated* when it shares at least one
word n-gram (n = 13 in the published recipes) with any document in a
held-out evaluation set. Contaminated documents are dropped (or the
overlapping spans masked) before training so benchmark numbers measure
generalization, not memorization.

Scale shape (10^12 training docs vs ~10^4-10^6 eval docs):

- Eval-side n-grams are a SMALL relation (benchmarks are tiny compared
  with the corpus) — build them once, `F.broadcast` them into the join.
  No shuffle of the training side for candidate generation.
- Training-side n-grams are one JVM explode (sequence + slice +
  concat_ws, same expression family as dedup.duplicate_spans) — never
  Python.
- The hit count per document is ONE shuffle with map-side partial
  aggregation (groupBy doc_id after the broadcast semi/inner join); the
  join's selectivity means only matching (doc, ngram) rows reach it.
- Joining on `xxhash64(ngram)` instead of the string halves wire bytes
  at shuffle width; counts are identical short of a 64-bit collision
  (same trade documented for duplicate_spans). We keep the string key
  here so the DuckDB oracle compares exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ngrams_col(text_col, n: int, sep: str = " "):
    """Word n-gram array (with duplicates), JVM-side. Docs shorter than
    n tokens yield an empty array — element_at throws on OOB under
    Spark 4 ANSI mode, so short docs are guarded, not clamped.

    Built as a zip_with chain over n shifted slices, NOT
    slice(w, i+1, n) inside a transform lambda: an outer array
    expression referenced inside a HOF lambda is re-evaluated PER
    ELEMENT (the whole split(text) again for every gram — O(tokens²)
    per doc). Slices are HOF inputs, evaluated once per row."""
    w = F.split(text_col, " ")
    m = F.size(w) - n + 1
    grams = F.slice(w, 1, m)
    for j in range(1, n):
        grams = F.zip_with(grams, F.slice(w, 1 + j, m),
                           lambda a, b: F.concat_ws(sep, a, b))
    return F.when(F.size(w) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def eval_ngrams(
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    max_tokens: int | None = None,
) -> DataFrame:
    """Distinct n-grams of the evaluation set: one column `ngram`.

    `max_tokens` truncates each eval document first (benchmark *prompts*
    are typically matched on their first tokens; answers may be held
    back). The result is small by construction — cache or broadcast it.
    """
    txt = F.col(text_col)
    if max_tokens is not None:
        txt = F.concat_ws(" ", F.slice(F.split(txt, " "), 1, max_tokens))
    return (
        eval_docs.select(F.explode(ngrams_col(txt, n)).alias("ngram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document contamination report: (id_col, n_hits) for every
    training document sharing >= 1 word n-gram with the eval set, where
    n_hits counts DISTINCT matched n-grams. Clean documents are absent —
    anti-join `docs` against this result to keep the clean corpus.

    `eval_set` is either raw eval documents (any DataFrame with
    `text_col`; n-grams are derived here) or a prebuilt single-column
    `ngram` relation from eval_ngrams().
    """
    if "ngram" in eval_set.columns and len(eval_set.columns) == 1:
        ev = eval_set
    else:
        ev = eval_ngrams(eval_set, n=n, text_col=text_col)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams_col(F.col(text_col), n))).alias("ngram"),
    )
    return (
        doc_grams.join(F.broadcast(ev), "ngram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter tier: decontamination when the eval n-gram set outgrows an
# exact broadcast map.
# ---------------------------------------------------------------------------


class NgramBloom:
    """Bloom filter over 64-bit n-gram hashes (Bloom 1970; hash derivation
    per Kirsch & Mitzenmacher 2006: k probe positions h1 + i*h2 from ONE
    64-bit key, h2 a splitmix64 remix — no per-probe string rehash).

    Sized from (n_items, fpp): m = -n*ln(p)/ln(2)^2 bits, k = m/n*ln(2)
    probes. At fpp=1% that is ~9.6 bits (1.2 bytes) per eval n-gram —
    an exact broadcast map of the same set costs ~50-100 bytes/entry, so
    the filter keeps a 10^8-n-gram eval suite broadcastable (~120 MB)
    where the exact relation (~10 GB) is not.

    All arithmetic is numpy uint64 with wraparound — ANSI-safe inside
    UDFs (Spark 4 ANSI mode throws on JVM long overflow; numpy does not).
    """

    __slots__ = ("bits", "m", "k")

    def __init__(self, bits, m: int, k: int):
        self.bits, self.m, self.k = bits, m, k

    @staticmethod
    def _mix(h):
        z = h + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    @classmethod
    def build(cls, hashes64, fpp: float = 0.01) -> "NgramBloom":
        """From an int64/uint64 array of xxhash64 keys."""
        h = np.asarray(hashes64).astype(np.int64, copy=False).view(np.uint64)
        n = max(1, len(h))
        m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
        m += (-m) % 64
        k = min(16, max(1, round(m / n * math.log(2))))
        bits = np.zeros(m // 64, np.uint64)
        h2 = cls._mix(h)
        for i in range(k):
            idx = (h + np.uint64(i) * h2) % np.uint64(m)
            np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
        return cls(bits, m, k)

    def might_contain(self, hashes64) -> np.ndarray:
        """Vectorized membership: False is certain, True is 'probably'.
        No false negatives by construction."""
        h = np.asarray(hashes64).astype(np.int64, copy=False).view(np.uint64)
        h2 = self._mix(h)
        out = np.ones(len(h), bool)
        for i in range(self.k):
            idx = (h + np.uint64(i) * h2) % np.uint64(self.m)
            word = (idx >> np.uint64(6)).astype(np.int64)
            out &= ((self.bits[word] >> (idx & np.uint64(63)))
                    & np.uint64(1)).astype(bool)
        return out


def build_eval_bloom(ev: DataFrame, fpp: float = 0.01,
                     ngram_col: str = "ngram") -> NgramBloom:
    """Build the filter from a distinct eval n-gram relation. The hash
    (xxhash64, seed 42 — Spark's default) is computed JVM-side; the
    driver collects 8 bytes per n-gram (the documented broadcast-build
    collect: the eval side is the small relation by contract)."""
    rows = ev.select(F.xxhash64(ngram_col).alias("h")).collect()
    return NgramBloom.build(np.fromiter((r.h for r in rows), np.int64,
                                        count=len(rows)), fpp=fpp)


def bloom_decontaminate(
    docs: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    fpp: float = 0.01,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """decontaminate() with a Bloom prefilter: EXACT same output
    (id_col, n_hits), different scale shape.

    Two stages: (1) candidate — every training n-gram is hashed JVM-side
    (one xxhash64 over the explode, no string leaves the JVM twice) and
    tested against the broadcast filter in an Arrow-batched pandas UDF
    (one long column in, one boolean out; numpy gathers, no per-row
    Python); (2) verify — only the surviving (doc, ngram) rows (true
    hits + ~fpp false positives of the training gram volume) join the
    exact eval relation, which removes every false positive. The verify
    join is NOT broadcast-hinted: at the scale where this tier matters
    the candidate side is tiny and AQE picks the strategy.

    Output is bit-identical to decontaminate() — the filter only prunes.
    """
    if "ngram" in eval_set.columns and len(eval_set.columns) == 1:
        ev = eval_set
    else:
        ev = eval_ngrams(eval_set, n=n, text_col=text_col)
    bloom = build_eval_bloom(ev, fpp=fpp)
    bc = docs.sparkSession.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def _might(h: pd.Series) -> pd.Series:
        return pd.Series(bc.value.might_contain(h.to_numpy(np.int64)))

    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams_col(F.col(text_col), n))).alias("ngram"),
    )
    cand = doc_grams.where(_might(F.xxhash64("ngram")))
    return (cand.join(ev, "ngram")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_hits")))
