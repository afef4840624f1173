"""Training-sequence packing for web-text corpora.

The standard LM pretraining layout (GPT-2/3 style "concat-and-chop"):
documents are concatenated in a fixed stream order (separator tokens
elided here; add +k to n_tokens for k separators) and the token stream is
chopped into fixed-length training sequences of `seq_len` tokens. Each
document therefore owns a token interval [start, start + n_tokens) of
the global stream and touches chunks floor(start/L) ..
floor((start+n_tokens-1)/L).

The only non-trivial part at 10^12 documents is the GLOBAL PREFIX SUM of
token counts. A single `Window.orderBy(id)` cumulative sum is a global
sort into ONE partition — correct, and exactly what we must not do at
scale. The scalable shape is the classic two-level scan:

  1. bucket documents by `floor(id / bucket)` — contiguous id ranges,
     so bucket order == stream order;
  2. per-bucket token totals (one partial-agg shuffle over #buckets
     rows, ~n_docs/bucket);
  3. exclusive cumulative sum over the bucket totals — tiny relation
     (10^12 docs / 2^20 bucket ≈ 10^6 rows; recurse the same trick if
     even that is too wide);
  4. broadcast the bucket prefixes back and take a within-bucket
     cumulative sum (Window partitioned BY BUCKET — bounded partitions,
     no global sort).

start(doc) = bucket_prefix + within_bucket_exclusive_cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket: int = 4096,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Assign every document its packed position: (id_col, n_tokens,
    start_tok, first_chunk, n_chunks). Stream order is ascending
    `id_col` (dense or sparse ids both work — only the ORDER matters).

    n_tokens is the whitespace token count (swap in
    quality.bpe_token_count_col for the BPE-ish pre-tokenizer);
    empty-string docs count 1 token (split('') == ['']), matching the
    oracle's len(string_split(...)). Pass ``n_tokens_col`` to pack a
    PRE-TOKENIZED stream instead — e.g. bpe.bpe_token_stats counts, the
    real LM denomination (text_col is then ignored).
    """
    L = F.lit(seq_len).cast("long")
    ntok = (F.col(n_tokens_col).cast("long") if n_tokens_col
            else F.size(F.split(F.col(text_col), " ")).cast("long"))
    t = docs.select(
        F.col(id_col),
        ntok.alias("n_tokens"),
        F.floor(F.col(id_col) / bucket).cast("long").alias("__bkt"),
    )
    btot = t.groupBy("__bkt").agg(F.sum("n_tokens").alias("__btot"))
    # Exclusive scan over bucket totals: tiny relation, single-partition
    # window is fine HERE (see module docstring for the recursion at
    # extreme scale).
    wb = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    bpre = btot.select(
        "__bkt", F.coalesce(F.sum("__btot").over(wb), F.lit(0)).alias("__bpre")
    )
    # Within-bucket exclusive scan: partitioned window, bounded state.
    ww = (
        Window.partitionBy("__bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("__bpre") + F.coalesce(F.sum("n_tokens").over(ww), F.lit(0))
    out = (
        t.join(F.broadcast(bpre), "__bkt")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            start.alias("start_tok"),
        )
        .select(
            id_col,
            "n_tokens",
            "start_tok",
            F.floor(F.col("start_tok") / L).alias("first_chunk"),
            (
                F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / L)
                - F.floor(F.col("start_tok") / L)
                + 1
            ).alias("n_chunks"),
        )
    )
    return out


def chunk_occupancy(packed: DataFrame, seq_len: int = 512) -> DataFrame:
    """Per training-chunk document counts from pack_sequences output:
    (chunk_id, n_docs, n_whole_docs). n_whole_docs counts the docs that
    lie entirely inside this one chunk (n_chunks == 1); the complement
    n_docs − n_whole_docs is the chunk's boundary-crossing docs — the
    usual attention-mask accounting. One JVM explode + one partial-agg
    shuffle."""
    span = F.sequence(
        F.col("first_chunk"), F.col("first_chunk") + F.col("n_chunks") - 1
    )
    ex = packed.select(
        F.col("n_chunks"), F.explode(span).alias("chunk_id")
    )
    return (
        ex.groupBy("chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("n_chunks") > 1, 0).otherwise(1)).alias(
                "n_whole_docs"
            ),
        )
    )


def shuffle_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic global corpus shuffle — the permutation step before
    concat-and-chop packing (stream order must decorrelate neighboring
    source documents). The sort key is a salted per-id hash, so the
    permutation is a pure function of (id, seed): reproducible across
    runs, partitionings, and engines, and resumable mid-stream.

    Adds ``shuffle_key`` and returns the frame sorted by it (ties broken
    by id). The global sort IS the cost — one range-partitioned shuffle,
    the canonical distributed permutation; for top-k prefixes Catalyst
    plans orderBy+limit as TakeOrderedAndProject instead (no global
    sort), which is what the oracle query exercises.

    hash_fn="md5" is the DuckDB-reproducible gate path (13 hex chars =
    52 bits, exact in a double); xxhash64 is the production default.
    """
    sid = F.concat(F.lit(f"shuf{seed}:"), F.col(id_col).cast("string"))
    if hash_fn == "xxhash64":
        key = F.xxhash64(sid)
    elif hash_fn == "md5":
        key = F.conv(F.substring(F.md5(F.encode(sid, "UTF-8")), 1, 13),
                     16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return (docs.withColumn("shuffle_key", key)
            .orderBy("shuffle_key", id_col))
