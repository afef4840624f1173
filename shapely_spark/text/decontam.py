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
