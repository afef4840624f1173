"""BM25 keyword search over a document corpus — pure Catalyst.

The retrieval view of the documents table: Okapi BM25 (Robertson &
Zaragoza 2009, the Lucene/Elasticsearch default) scored entirely with
JVM expressions — no UDF anywhere:

- document frequencies and the average document length come from one
  explode + partial-agg pass over the corpus;
- idf is a tiny per-term relation (|query terms| rows) broadcast into
  the per-(doc, term) score join;
- top-k uses `orderBy(...).limit(k)` so Catalyst plans
  TakeOrderedAndProject: per-partition heaps + a driver merge — no
  RangePartitioner sampling pass, no global sort shuffle.

Cross-engine determinism: scores are rounded to 6 decimals before
ranking (summation-order fp noise is ~1e-15) and ties break by doc_id,
so the DuckDB oracle (queries.bm25_topk_docs) selects the identical
top-k with identical scores.

Scale notes: the corpus is scanned twice (length stats + term
frequencies) — persist the tokenized projection upstream when the scan
is expensive. Only rows containing a query term survive the explode
filter, so the shuffled relation is |matching (doc, term)| rows, not
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_topk", "inverted_index", "term_stats", "phrase_search"]


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25.

    Returns (rank, id_col, score) with score = round(BM25, 6) and rank
    dense from 1 by (score desc, id ascending).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    w = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col), w.alias("__w")).withColumn(
        "dl", F.size("__w").cast("long"))
    stats = base.agg(F.count("*").alias("n"),
                     F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"])

    tf = (base.select(id_col, "dl", F.explode("__w").alias("word"))
          .where(F.col("word").isin(list(terms)))
          .groupBy(id_col, "dl", "word")
          .agg(F.count("*").cast("long").alias("tf")))
    # document frequency over the (already distinct) (doc, word) rows;
    # idf is |terms| rows — broadcast back into the score join.
    idf = tf.groupBy("word").agg(F.count("*").cast("long").alias("df")).select(
        "word",
        F.log((F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
              / (F.col("df") + F.lit(0.5)) + F.lit(1.0)).alias("idf"))
    # identical operator order to the SQL oracle:
    # idf * ((tf * (k1+1)) / (tf + k1 * (1 - b + b * dl / avgdl)))
    term_score = (F.col("idf")
                  * ((F.col("tf") * F.lit(k1 + 1.0))
                     / (F.col("tf")
                        + F.lit(k1) * (F.lit(1.0 - b)
                                       + F.lit(b) * F.col("dl") / F.lit(avgdl)))))
    # per-term scores are bit-identical across engines (exact int inputs,
    # one shared op order); quantize each to 9 dp and sum on a DECIMAL
    # carrier so the doc score is partition-order insensitive, then
    # present at 6 dp.
    scored = (tf.join(F.broadcast(idf), "word")
              .groupBy(id_col)
              .agg(F.round(F.sum(F.round(term_score, 9)
                                 .cast("decimal(20,9)")), 6)
                   .cast("double").alias("score")))
    top = scored.orderBy(F.desc("score"), id_col).limit(k)
    return (top.repartition(1)
            .withColumn("rank", F.row_number().over(
                Window.partitionBy().orderBy(F.desc("score"), id_col)))
            .select("rank", id_col, "score"))


# ---------------------------------------------------------------------------
# positional inverted index + phrase search
# ---------------------------------------------------------------------------

def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus as a positional postings relation:

    (term, doc_id, tf, positions array<int>)

    — one row per (term, document), positions 0-based token offsets in
    ascending order. This is the persistent artifact a crawl-scale
    search tier materializes once per snapshot (Lucene's postings
    format, re-expressed relationally); BM25 (`bm25_topk`) and phrase
    search (`phrase_search`) both read it instead of re-tokenizing.

    Plan: posexplode(split) → one hash shuffle on (term, doc) with
    map-side partial collect. Writing it bucketed by term makes every
    downstream term lookup a pruned scan with no shuffle. Posting-list
    skew (stopwords at 10^12 docs) stays bounded because the grain is
    (term, doc), never one row per term."""
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"))
    return (toks.groupBy("term", id_col)
            .agg(F.count("*").cast("long").alias("tf"),
                 F.sort_array(F.collect_list("pos")).alias("positions")))


def term_stats(index: DataFrame) -> DataFrame:
    """(term, df, cf): document frequency and collection frequency per
    term — the dictionary side of the index (one partial-agg shuffle
    over the postings relation)."""
    return index.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"))


def phrase_search(
    index: DataFrame,
    phrase: str | list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact consecutive-token phrase match over the positional index:

    (doc_id, n_matches, first_pos)

    for every document containing the phrase, counting OVERLAPPING
    occurrences (the token-adjacency semantics of a positional search
    engine, not substring replace()).

    Algorithm: for phrase terms t0..tk, take t0's posting rows and
    equi-join each ti's rows on doc, intersecting t0's positions with
    ti's positions shifted by -i — all array math JVM-side
    (`array_intersect` over `transform`); surviving positions after the
    last join are exactly the phrase start offsets. Repeated terms in
    the phrase are self-joins of the same posting list under different
    shifts, which the position distinctness makes exact.

    Scale: k-1 joins on doc_id over posting lists already filtered to
    the phrase's terms — the relation sizes are the terms' document
    frequencies, not the corpus; rare-term-first ordering would shrink
    intermediate sizes further but is deliberately NOT applied so the
    intersection base stays t0 (first_pos must be the phrase START)."""
    terms = phrase.split(" ") if isinstance(phrase, str) else list(phrase)
    if not terms:
        raise ValueError("phrase must be non-empty")
    # NB: the shift lambda must come from a factory — a 2-parameter
    # transform lambda binds (element, ARRAY_INDEX), silently turning a
    # default-arg closure salt into the element index (CLAUDE.md rule).
    def _shift_by(k: int):
        return lambda x: x - k

    cur = (index.where(F.col("term") == terms[0])
           .select(id_col, F.col("positions").alias("__p")))
    for i, t in enumerate(terms[1:], start=1):
        shifted = (index.where(F.col("term") == t)
                   .select(id_col,
                           F.transform("positions",
                                       _shift_by(i)).alias("__q")))
        cur = (cur.join(shifted, id_col)
               .select(id_col,
                       F.array_intersect("__p", "__q").alias("__p"))
               .where(F.size("__p") > 0))
    return cur.select(
        id_col,
        F.size("__p").cast("long").alias("n_matches"),
        F.array_min("__p").cast("long").alias("first_pos"))
