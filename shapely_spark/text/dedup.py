"""Deduplication operators for web-text corpora.

Engine additions for the training-data pipeline. Hot paths are either
JVM expressions (shingling, tokenizing, one xxhash64 per shingle/token,
banded bucketing, candidate equi-join) or vectorized Arrow-batched numpy
(the 64-way MinHash family, the SimHash bit accumulation) — never
row-at-a-time Python.

- exact_dedup: hash-groupBy on content → keeper per group.
- minhash_signatures / minhash_lsh_candidates / minhash_dedup_pairs:
  shingle → xxhash64 base hash (JVM, once per shingle) → 64-way
  multiply-shift universal family + per-position min (numpy, one pass)
  → banded LSH buckets → candidate pairs → exact Jaccard verify. The
  standard scale path: candidate pairs are generated within bucket
  groups in ONE shuffle (window-count cap + groupBy on the same
  partitioning + JVM-side C(n,2) emission), never an all-pairs join.
- simhash_64 / simhash_candidates / simhash_dedup_pairs: 64-bit SimHash
  over xxhash64 token hashes (JVM) with vectorized bit accumulation
  (numpy segment sums) + banded buckets for Hamming-near candidates.

Skew safety: both LSH candidate generators cap bucket size
(`max_bucket`); a degenerate bucket (boilerplate/identical docs) would
otherwise emit O(n²) pairs. Oversized buckets are DROPPED from candidate
generation — run `exact_dedup` first so identical content never reaches
LSH, and audit with `oversized_buckets()` (no silent truncation: the
helper reports exactly which buckets were cut and how many docs each
held).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_MINHASH = 64
N_BANDS = 16  # 16 bands × 4 rows
DEFAULT_MAX_BUCKET = 4096
# `max_bucket=None` means "no recall cap", not "unbounded memory": the pair
# generator still collects each bucket into one task's collect_list, so a
# hard internal ceiling bounds worst-case single-task state. A bucket this
# size emits ~2·10^9 pairs — always a skew bug, never a real near-dup group.
HARD_MAX_BUCKET = 65536


def shingles_col(text_col, n: int = 3):
    """Word n-gram shingle array (distinct), JVM-side. Docs shorter than n
    tokens yield an empty array (element_at throws on OOB in Spark 4, so
    short docs must be guarded, not clamped).

    Built as a zip_with chain over n shifted slices, NOT element_at(w, i)
    inside a transform lambda: an outer array expression referenced
    inside a HOF lambda is re-evaluated PER ELEMENT (the whole
    split(text) again for every shingle — O(tokens²) per doc, measured
    100× on 2k-token docs). The slices are HOF *inputs*, evaluated once
    per row."""
    w = F.split(text_col, " ")
    m = F.size(w) - n + 1
    sh = F.slice(w, 1, m)
    for j in range(1, n):
        sh = F.zip_with(sh, F.slice(w, 1 + j, m),
                        lambda a, b: F.concat_ws("\x01", a, b))
    return F.when(F.size(w) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>"))


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


def _minhash_family(n_hashes: int, seed: int):
    """Deterministic multiply-shift universal family over uint64: odd
    multipliers + offsets. One strong base hash (xxhash64) + a linear
    family is the standard cheap MinHash construction."""
    rng = np.random.RandomState(seed)
    A = rng.randint(0, 2**63, size=n_hashes, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    B = rng.randint(0, 2**63, size=n_hashes, dtype=np.uint64)
    return A, B


def _minhash_sig_udf(n_hashes: int, seed: int):
    A, B = _minhash_family(n_hashes, seed)

    @F.pandas_udf("array<long>")
    def sig(hashes: pd.Series) -> pd.Series:
        out: list = []
        vals = [np.asarray(h, dtype=np.int64) for h in hashes]
        lens = np.array([len(v) for v in vals], dtype=np.int64)
        if lens.sum() == 0:
            return pd.Series([None] * len(vals))
        # chunk on doc boundaries so the (shingles × n_hashes) block stays
        # cache-sized (CLAUDE.md: cache-block O(batch × targets) kernels)
        CHUNK = 100_000
        i = 0
        while i < len(vals):
            j, tot = i, 0
            while j < len(vals) and (tot == 0 or tot + lens[j] <= CHUNK):
                tot += lens[j]
                j += 1
            seg_lens = lens[i:j]
            nz = seg_lens > 0
            mins = None
            if nz.any():
                flat = np.concatenate([v for v in vals[i:j] if len(v)]).view(np.uint64)
                M = flat[:, None] * A[None, :] + B[None, :]  # uint64 wraps
                offsets = np.zeros(int(nz.sum()), dtype=np.int64)
                np.cumsum(seg_lens[nz][:-1], out=offsets[1:])
                mins = np.minimum.reduceat(M, offsets, axis=0).view(np.int64)
            k = 0
            for keep in nz:
                if keep:
                    out.append(mins[k].tolist())
                    k += 1
                else:
                    out.append(None)
            i = j
        return pd.Series(out)

    return sig


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = N_MINHASH, shingle_n: int = 3, seed: int = 7,
) -> DataFrame:
    """(id, minhash array<long>) — per-position min over the universal
    family applied to xxhash64(shingle). One JVM hash per shingle, one
    vectorized numpy pass for the 64-way family. Docs with no shingles
    (shorter than shingle_n tokens) get a NULL signature — they cannot
    near-dup and are dropped by the LSH stage."""
    sh = shingles_col(F.col(text_col), shingle_n)
    base = F.transform(sh, lambda s: F.xxhash64(s))
    sig = _minhash_sig_udf(n_hashes, seed)
    return docs.select(F.col(id_col), base.alias("__h")).select(
        id_col, sig("__h").alias("minhash")
    )


def oversized_buckets(exploded: DataFrame, max_bucket: int) -> DataFrame:
    """Audit helper: (bucket, n_docs) for buckets the cap would drop."""
    return (
        exploded.groupBy("bucket").agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > max_bucket)
    )


def _bands_udf(n_bands: int, rows_per_band: int):
    """Signature → per-band FNV-1a digests, vectorized in numpy. The JVM
    alternative (16 × xxhash64(element_at×4) expressions) generates a huge
    codegen method whose first-run JIT dominated the cold battery time
    (~100 s at sf0.1); the numpy digest is a few microseconds per batch."""

    @F.pandas_udf("array<long>")
    def bands(mh: pd.Series) -> pd.Series:
        vals = [None if v is None else np.asarray(v, dtype=np.int64) for v in mh]
        nz = [v for v in vals if v is not None]
        hi = None
        if nz:
            M = np.stack(nz).view(np.uint64).reshape(len(nz), n_bands, rows_per_band)
            h = np.full(M.shape[:2], 14695981039346656037, dtype=np.uint64)
            for r in range(rows_per_band):
                h = (h ^ M[:, :, r]) * np.uint64(1099511628211)
            # namespace per band so all bands share one bucket column
            h = h ^ (np.arange(n_bands, dtype=np.uint64)[None, :] << np.uint64(56))
            hi = h.view(np.int64)
        k = 0
        out = []
        for v in vals:
            if v is None:
                out.append(None)
            else:
                out.append(hi[k].tolist())
                k += 1
        return pd.Series(out)

    return bands


def minhash_band_buckets(
    sigs: DataFrame, id_col: str = "doc_id", n_bands: int = N_BANDS,
    n_hashes: int = N_MINHASH,
) -> DataFrame:
    """(id, bucket) — one row per band; bucket = digest of the band's rows."""
    bands = _bands_udf(n_bands, n_hashes // n_bands)
    return sigs.where(F.col("minhash").isNotNull()).select(
        F.col(id_col), F.explode(bands(F.col("minhash"))).alias("bucket")
    )


def _bucket_pairs(
    exploded: DataFrame, value_cols: list, max_bucket: int | None,
    pair_filter=None,
) -> DataFrame:
    """(…, bucket) rows → within-bucket ordered candidate pairs via a
    bucket-keyed self equi-join: a partial-agg count finds the (few)
    oversized buckets, a broadcast anti-join drops their rows map-side,
    and the C(n,2) emission is the join itself with `a.id < b.id` (plus
    `pair_filter`) in the join condition — pairs are pruned as they are
    produced, inside whole-stage codegen.

    This replaces the r2 collect_list + nested transform/slice emission:
    higher-order array functions are NOT codegen'd (per-element
    interpreted eval + a slice copy per element), and at ~5M emitted
    structs that interpreter loop was 3.4× slower than the join
    (measured sf0.1: 5.0 s → 1.5 s for the same 951k surviving pairs).
    The trade: the exploded sketch subtree feeds three consumers (the
    cap audit and both join branches) instead of one, so its per-doc
    sketch UDF can re-run up to twice more (identical join-branch
    exchanges dedupe via ReusedExchange); sketches are the cheap linear
    stage (measured within noise at sf0.1), and a caller with an
    expensive sketch can `.persist()` the exploded input.

    value_cols: the per-doc payload, first element must be the id (pairs
    are ordered doc_a < doc_b by it). max_bucket=None lifts the RECALL
    cap but not the pair-explosion bound: HARD_MAX_BUCKET always applies
    (a 64k-doc bucket would emit ~2·10^9 pairs — boilerplate skew to
    audit via oversized_buckets(), not a group worth pairing)."""
    cap = HARD_MAX_BUCKET if max_bucket is None else min(max_bucket, HARD_MAX_BUCKET)
    oversized = (
        exploded.groupBy("bucket").count()
        .where(F.col("count") > cap).select("bucket")
    )
    ep = exploded.join(F.broadcast(oversized), "bucket", "left_anti")
    payload = F.struct(*[F.col(c) for c in value_cols])
    a = ep.select("bucket", payload.alias("a"))
    b = ep.select("bucket", payload.alias("b"))
    idc = value_cols[0]
    cond = F.col(f"a.{idc}") < F.col(f"b.{idc}")
    if pair_filter is not None:
        cond = cond & pair_filter(F.col("a"), F.col("b"))
    return (
        a.join(b, "bucket")
        .where(cond)
        .select(
            F.col(f"a.{idc}").alias("doc_a"),
            F.col(f"b.{idc}").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def minhash_lsh_candidates(
    sigs: DataFrame, id_col: str = "doc_id", n_bands: int = N_BANDS,
    n_hashes: int = N_MINHASH, max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket → candidate pairs (a < b)."""
    exploded = minhash_band_buckets(sigs, id_col, n_bands, n_hashes)
    return _bucket_pairs(exploded, [id_col], max_bucket)


def _verify_pairs(
    docs: DataFrame, cand: DataFrame, text_col: str, id_col: str,
    threshold: float, shingle_n: int,
) -> DataFrame:
    """Exact shingle-set Jaccard verify over candidate pairs only.
    Compares HASHED shingles (one xxhash64 per shingle, distinct-preserved):
    set Jaccard is identical to the string-shingle Jaccard unless two
    distinct shingles of a candidate pair collide in 64 bits (~n²/2⁶⁵ per
    pair — deterministically absent on the gate corpora, where the DuckDB
    oracle computes the string form and hashes match), and the long-array
    intersect/union is several times cheaper than string compares."""
    hashed = F.array_distinct(
        F.transform(shingles_col(F.col(text_col), shingle_n), lambda s: F.xxhash64(s))
    )
    sh = docs.select(F.col(id_col), hashed.alias("sh")).where(
        F.size("sh") > 0  # shingle-less docs (shorter than n tokens) can't near-dup
    )
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = (
        cand.join(a, "doc_a").join(b, "doc_b")
        .withColumn("n_a", F.size("sh_a"))
        .withColumn("n_b", F.size("sh_b"))
        # provably lossless size prefilter: J(A,B) ≤ min/max of the set
        # sizes, so a pair failing it can never reach the threshold —
        # and the O(1) length test runs before any hash-set build.
        # The final filter compares ROUND(J, 4) ≥ threshold, which admits
        # true J down to threshold − 5e-5; the prefilter bound must use
        # the same slack or it drops pairs the rounded filter would keep.
        .where(F.least("n_a", "n_b").cast("double")
               / F.greatest("n_a", "n_b") >= threshold - 0.00005)
    )
    # both arrays are array_distinct by construction, so
    # |A∪B| = |A|+|B|−|A∩B| exactly — one hash-set build per pair
    # instead of two (array_union was the second-hottest expression in
    # the verify stage's codegen)
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    jac = F.try_divide(inter, F.col("n_a") + F.col("n_b") - inter)
    return (
        joined.withColumn("jaccard", F.round(jac, 4))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_dedup_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.5, shingle_n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Full MinHash→LSH→verify pipeline: candidate pairs verified with exact
    shingle-set Jaccard ≥ threshold. Output (doc_a, doc_b, jaccard)."""
    sigs = minhash_signatures(docs, text_col, id_col, shingle_n=shingle_n)
    cand = minhash_lsh_candidates(sigs, id_col, max_bucket=max_bucket)
    return _verify_pairs(docs, cand, text_col, id_col, threshold, shingle_n)


def simhash_64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens. Token hashes are xxhash64
    JVM-side (one hash per token); the 64-way ±1 bit accumulation is a
    vectorized numpy segment sum — no per-token Python."""
    toks = F.split(F.col(text_col), " ")
    base = F.transform(toks, lambda t: F.xxhash64(t))
    shifts = np.arange(64, dtype=np.uint64)

    @F.pandas_udf("long")
    def sim(hashes: pd.Series) -> pd.Series:
        vals = [np.asarray(h, dtype=np.int64) for h in hashes]
        lens = np.array([len(v) for v in vals], dtype=np.int64)
        out = np.zeros(len(vals), dtype=np.int64)
        CHUNK = 100_000
        i = 0
        while i < len(vals):
            j, tot = i, 0
            while j < len(vals) and (tot == 0 or tot + lens[j] <= CHUNK):
                tot += lens[j]
                j += 1
            seg_lens = lens[i:j]
            nz = seg_lens > 0
            if nz.any():
                flat = np.concatenate([v for v in vals[i:j] if len(v)]).view(np.uint64)
                bits = ((flat[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
                contrib = 2 * bits - 1
                offsets = np.zeros(int(nz.sum()), dtype=np.int64)
                np.cumsum(seg_lens[nz][:-1], out=offsets[1:])
                acc = np.add.reduceat(contrib, offsets, axis=0)
                packed = ((acc > 0).astype(np.uint64) << shifts[None, :]).sum(
                    axis=1, dtype=np.uint64
                ).view(np.int64)
                out[np.arange(i, j)[nz]] = packed
            i = j
        return pd.Series(out)

    return docs.select(id_col, base.alias("__th")).select(
        id_col, sim("__th").alias("simhash")
    )


def simhash_band_buckets(
    sim: DataFrame, id_col: str = "doc_id", bands: int = 4,
    include_hash: bool = False,
) -> DataFrame:
    """(id[, simhash], bucket) — one row per SimHash band (64/bands bits)."""
    width = 64 // bands
    mask = (1 << width) - 1
    band_arr = F.array(
        *[
            (F.shiftrightunsigned(F.col("simhash"), b * width).bitwiseAND(F.lit(mask))
             + F.lit(b << 48)).cast("long")
            for b in range(bands)
        ]
    )
    cols = [F.col(id_col)] + ([F.col("simhash")] if include_hash else [])
    return sim.select(*cols, F.explode(band_arr).alias("bucket"))


def simhash_candidates(
    sim: DataFrame, id_col: str = "doc_id", bands: int = 4,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Docs sharing any SimHash band (Hamming ≤ 64·(bands-1)/bands heuristic
    guarantee: any pair within Hamming < bands shares ≥1 intact band)."""
    e = simhash_band_buckets(sim, id_col, bands)
    return _bucket_pairs(e, [id_col], max_bucket)


def simhash_dedup_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.5, shingle_n: int = 3, bands: int = 8,
    max_hamming: int = 12, max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """SimHash→banded candidates→Hamming prefilter→exact-Jaccard verify.
    Same output contract as minhash_dedup_pairs (doc_a, doc_b, jaccard ≥
    threshold): the sketch only generates candidates; the verify stage
    makes the result exact-checkable (candidates ⊇ true pairs ⇒ output =
    true pairs). The bit_count(xor) ≤ max_hamming prefilter evaluates
    INSIDE the bucket join (pure JVM; pairs are dropped as produced) and
    bounds the shingle-array verify. Corpus caveat: on templated web text
    the SimHash pair-Hamming distribution concentrates (gate corpus mode
    ≈18/64), so even a tight prefilter passes ~1% of all pairs — measured
    true near-dup pairs sit at Hamming ≤ 12, which the default keeps with
    zero recall loss; MinHash-LSH is the sharper primary sketch on such
    corpora (its candidates ≈ the true pair set)."""
    sim = simhash_64(docs, text_col, id_col)
    # hash rides the exploded band rows, so the Hamming test evaluates
    # INSIDE pair generation (a pair is dropped as it is produced) — no
    # pair-table shuffle before the filter, no extra joins to re-attach
    # the hashes (was the slowest remaining battery stage)
    e = simhash_band_buckets(sim, id_col, bands, include_hash=True)
    cand = _bucket_pairs(
        e, [id_col, "simhash"], max_bucket,
        pair_filter=lambda a, b: F.bit_count(
            a["simhash"].bitwiseXOR(b["simhash"])
        ) <= max_hamming,
    )
    return _verify_pairs(docs, cand, text_col, id_col, threshold, shingle_n)


def duplicate_spans(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    window: int = 8, stride: int = 4, min_count: int = 2,
) -> DataFrame:
    """Duplicate-span counting — the distributed approximation of exact
    substring deduplication (suffix-array dedup à la "Deduplicating
    Training Data Makes Language Models Better"): slide a `window`-token
    span every `stride` tokens over each document, then count global
    span frequency. Output (span, n_docs, n_occ) for spans occurring at
    least `min_count` times; downstream filtering removes (or masks) the
    spans with pathological frequency (boilerplate, license headers).

    Scale shape: one JVM explode (sequence + slice + concat_ws — no
    Python) and ONE shuffle with map-side partial aggregation; span
    strings are the grouping key so results stay oracle-comparable. At
    shuffle widths where long string keys dominate the wire, group by
    (xxhash64(span), span-sample) instead — identical counts short of a
    64-bit collision."""
    # Materialize the token array as a COLUMN before the transform: the
    # lambda below slices it per start index, and an outer *expression*
    # (the split itself) referenced inside a HOF lambda is re-evaluated
    # per element — O(tokens²/stride) per doc. An attribute reference is
    # a row lookup; the multi-referenced non-trivial alias survives
    # CollapseProject (the with_geo materialization rule).
    base = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__toks"))
    toks = F.col("__toks")
    starts = F.when(
        F.size(toks) >= window,
        F.sequence(F.lit(0), F.size(toks) - window, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    span = F.explode(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, window)))
    )
    return (
        base.select(F.col(id_col), span.alias("span"))
        .groupBy("span")
        .agg(F.countDistinct(id_col).alias("n_docs"), F.count("*").alias("n_occ"))
        .where(F.col("n_occ") >= min_count)
    )


def remove_duplicate_spans(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    window: int = 8, stride: int = 4, min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicate-span REMOVAL — the excision stage of
    substring dedup ("Deduplicating Training Data Makes Language Models
    Better", Lee et al.: ExactSubstr cuts every occurrence of any
    sufficiently-long duplicated substring). The suffix array is
    approximated by `window`-token shingles at `stride`; a span counts
    as duplicated when it appears in >= `min_docs` DISTINCT documents —
    the boilerplate/license-header semantic (within-doc repetition is
    the Gopher repetition gate's job, text/quality.py).

    Output: (id, clean_text, n_removed): clean_text drops every token
    position covered by a duplicated window; n_removed counts dropped
    positions. Docs with no duplicated span round-trip byte-identically.

    Scale shape: the corpus shuffles keyed by span (partial-agg count,
    then the occurrence join-back) and once keyed by doc to assemble the
    per-doc mask; the excision itself is JVM higher-order array math —
    no Python anywhere. Coverage of the un-shingled tail mirrors the
    counting op (duplicate_spans). At 100-TB widths, key the span
    shuffles by xxhash64(span) to cut wire bytes (identical result
    short of a 64-bit collision)."""
    toks = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col), toks.alias("__toks"))
    starts = F.when(
        F.size("__toks") >= window,
        F.sequence(F.lit(0), F.size("__toks") - window, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    occ = base.select(
        F.col(id_col),
        F.explode(F.transform(starts, lambda i: F.struct(
            i.alias("s"),
            F.concat_ws(" ", F.slice("__toks", i + 1, window)).alias("span"),
        ))).alias("o"),
    ).select(id_col, F.col("o.s").alias("s"), F.col("o.span").alias("span"))
    bad = (
        occ.groupBy("span")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("span")
    )
    bad_starts = (
        occ.join(bad, "span")
        .groupBy(id_col).agg(F.collect_list("s").alias("__bad"))
    )
    covered = F.array_distinct(F.flatten(F.transform(
        F.coalesce(F.col("__bad"), F.array().cast("array<int>")),
        lambda s: F.sequence(s, s + window - 1),
    )))
    kept = F.filter(
        F.transform("__toks", lambda t, i: F.struct(i.alias("i"), t.alias("t"))),
        lambda x: ~F.array_contains(F.col("__cov"), x["i"]),
    )
    return (
        base.join(bad_starts, id_col, "left")
        .withColumn("__cov", covered)
        .select(
            F.col(id_col),
            F.concat_ws(" ", F.transform(kept, lambda x: x["t"])).alias("clean_text"),
            F.size("__cov").cast("long").alias("n_removed"),
        )
    )


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit: str = "sep:\n\n",
    min_tokens: int = 0,
) -> DataFrame:
    """Cross-document unit-level exact dedup (the RefinedWeb/Falcon
    paragraph dedup): split every document into units, keep only the
    FIRST corpus-wide occurrence of each repeated unit (ordered by
    (id, position)), reassemble the survivors in document order. Drops
    boilerplate (cookie banners, nav text) that exact_dedup misses
    because the surrounding document differs.

    unit: "sep:<delim>" splits on a delimiter (real web text:
    paragraphs on blank lines); "tokens:<K>" chunks into K-token blocks
    (corpora without structural separators). Units shorter than
    `min_tokens` tokens are exempt — always kept, never claim a keeper
    slot (the RefinedWeb short-line guard: deduping "Yes." corpus-wide
    would shred meaning).

    Plan shape at 10^12 docs: ONE window shuffle keyed by the unit
    string (min-struct aggregate window, no sort — a hot boilerplate
    unit costs its row count, not a sort) + ONE groupBy(id) partial-agg
    shuffle to reassemble. The unit array is materialized as a column
    before the chunk lambda so construction is O(tokens) per doc (an
    outer array expression inside a HOF lambda re-evaluates per
    element — CLAUDE.md O(tokens²) trap). Exact string keys, same
    contract as exact_dedup; swap in xxhash64 keys + string re-verify
    if unit strings dominate shuffle volume.

    Returns (id_col, clean_text, n_units, n_removed); clean_text is ""
    for a fully-boilerplate document (row preserved).
    """
    if unit.startswith("sep:"):
        import re as _re

        sep = unit[4:]
        # split's pattern is a Java regex — escape the literal delimiter
        units = F.split(F.col(text_col), _re.escape(sep))
        joiner = sep
    elif unit.startswith("tokens:"):
        k = int(unit[7:])
        if k <= 0:
            raise ValueError("tokens:<K> needs K >= 1")
        joiner = " "
        units = None  # built below from the materialized token column
    else:
        raise ValueError(f"unknown unit spec {unit!r}")

    if units is not None:
        p = docs.select(F.col(id_col), units.alias("__units"))
    else:
        w = docs.select(F.col(id_col),
                        F.split(F.col(text_col), " ").alias("__w"))
        nchunks = F.ceil(F.size("__w") / F.lit(float(k))).cast("int")
        chunks = F.transform(
            F.sequence(F.lit(0), nchunks - 1),
            lambda i: F.concat_ws(" ", F.slice("__w", i * k + 1, k)))
        p = w.select(F.col(id_col), chunks.alias("__units"))

    paras = p.select(
        F.col(id_col),
        F.posexplode_outer("__units").alias("idx", "para"),
    )
    exempt = (F.size(F.split(F.col("para"), " ")) < min_tokens) \
        if min_tokens > 0 else F.lit(False)
    wmin = Window.partitionBy("para")
    first = F.min(F.when(~exempt, F.struct(F.col(id_col), F.col("idx")))
                  ).over(wmin)
    keep = exempt | (F.struct(F.col(id_col), F.col("idx")) == first)
    kept = paras.withColumn("__keep", keep)
    return (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(joiner, F.transform(
                F.array_sort(F.collect_list(
                    F.when(F.col("__keep"), F.struct("idx", "para")))),
                lambda s: s["para"])).alias("clean_text"),
            F.count("para").cast("long").alias("n_units"),
            (F.count("para")
             - F.coalesce(F.sum(F.col("__keep").cast("long")), F.lit(0)))
            .cast("long").alias("n_removed"),
        )
    )
