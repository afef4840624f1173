"""BPE tokenizer (text/bpe.py): training tiers, encode semantics, and
the oracle's sequential-fold equivalence."""

import hashlib

import pytest

from shapely_spark.text.bpe import (
    bpe_encode, bpe_token_stats, bpe_train, bpe_train_distributed,
    encode_word, word_freqs,
)


def _docs(spark):
    rows = [
        (0, "the table the fast value"),
        (1, "fast fast table scan hash"),
        (2, "the the the value batch"),
        (3, "slow window sort merge line"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_matches_hand_computation(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab ab ac")], "doc_id long, text string")
    # pair counts: (a,b)=3, (a,c)=1 -> first merge (a,b); then no pair
    # repeats beat each other: (a,c)=1 remains, merged words are single
    # symbols
    m = bpe_train(word_freqs(docs), 2)
    assert m == [("a", "b"), ("a", "c")]


def test_train_tie_break_is_lexicographic(spark):
    docs = spark.createDataFrame(
        [(0, "ba dc ba dc")], "doc_id long, text string")
    # (b,a)=2 and (d,c)=2 tie -> lexicographically smallest pair wins
    m = bpe_train(word_freqs(docs), 1)
    assert m == [("b", "a")]


def test_distributed_tier_matches_collect_tier(spark):
    fr = word_freqs(_docs(spark))
    m_collect = bpe_train(fr, 20)
    m_dist = bpe_train_distributed(fr, 20, checkpoint_every=3)
    assert m_collect == m_dist


def test_encode_word_reference_semantics():
    ranks = {("t", "h"): 0, ("th", "e"): 1, ("e", "s"): 2}
    assert encode_word("the", ranks) == ("the",)
    assert encode_word("these", ranks) == ("the", "s", "e")
    # leftmost non-overlapping: "a a a" style repetition
    r2 = {("a", "a"): 0}
    assert encode_word("aaa", r2) == ("aa", "a")
    assert encode_word("aaaa", r2) == ("aa", "aa")
    # unseen characters pass through as single symbols
    assert encode_word("zq", ranks) == ("z", "q")


def test_encode_df_matches_python_reference(spark):
    docs = _docs(spark)
    merges = bpe_train(word_freqs(docs), 15)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    got = {r.doc_id: (r.n_tokens, r.tokens_md5)
           for r in bpe_token_stats(docs, merges).collect()}
    for row in docs.collect():
        toks = [t for w in row.text.split(" ") if w
                for t in encode_word(w, ranks)]
        s = " ".join(toks)
        assert got[row.doc_id] == (
            len(toks), hashlib.md5(s.encode()).hexdigest())


def test_encode_never_merges_across_words(spark):
    # "t h" as two words must NOT merge even though (t,h) is rank 0
    docs = spark.createDataFrame([(0, "t h th")], "doc_id long, text string")
    out = bpe_encode(docs, [("t", "h")]).collect()[0]
    assert out.tokens == ["t", "h", "th"]


def test_sequential_fold_equals_rank_based_for_topological_merges(spark):
    # the oracle applies merges SEQUENTIALLY (merge 1 everywhere, then
    # merge 2, ...); the production encoder is rank-based. For a
    # topologically ordered list these are equivalent — pin it on the
    # gate's own merge table over a vocabulary that exercises every
    # multi-level chain.
    from shapely_spark.queries import _BPE_GATE_MERGES

    ranks = {tuple(p): i for i, p in enumerate(_BPE_GATE_MERGES)}

    def sequential(word):
        sym = list(word)
        for a, b in _BPE_GATE_MERGES:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return tuple(sym)

    words = ["table", "fast", "value", "the", "hash", "batch", "scan",
             "tab", "data", "fastest", "thevalue", "tata", "ttha"]
    for w in words:
        assert encode_word(w, ranks) == sequential(w), w


def test_encode_partition_invariance_and_empty(spark):
    docs = spark.createDataFrame(
        [(0, "the table"), (1, ""), (2, None)],
        "doc_id long, text string")
    merges = [("t", "h"), ("th", "e")]
    a = sorted((r.doc_id, tuple(r.tokens))
               for r in bpe_encode(docs, merges).collect())
    b = sorted((r.doc_id, tuple(r.tokens))
               for r in bpe_encode(docs.repartition(5), merges).collect())
    assert a == b
    d = dict(a)
    assert d[0] == ("the", "t", "a", "b", "l", "e")
    assert d[1] == () and d[2] == ()


def test_train_stops_when_no_pairs_left(spark):
    docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    m = bpe_train(word_freqs(docs), 50)
    assert m == [("a", "b")]  # after the merge every word is one symbol
    assert bpe_train_distributed(word_freqs(docs), 50) == m


def test_pack_sequences_n_tokens_col_matches_whitespace_path(spark):
    from shapely_spark.text.packing import pack_sequences
    from pyspark.sql import functions as F

    docs = _docs(spark)
    base = {(r.doc_id, r.n_tokens, r.start_tok, r.first_chunk, r.n_chunks)
            for r in pack_sequences(docs, seq_len=4, bucket=2).collect()}
    pre = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("cnt"))
    got = {(r.doc_id, r.n_tokens, r.start_tok, r.first_chunk, r.n_chunks)
           for r in pack_sequences(pre, seq_len=4, bucket=2,
                                   n_tokens_col="cnt").collect()}
    assert got == base


def test_bpe_pack_composition_consistent(spark):
    from shapely_spark.text.packing import pack_sequences

    docs = _docs(spark)
    merges = bpe_train(word_freqs(docs), 10)
    counts = bpe_token_stats(docs, merges)
    packed = pack_sequences(counts, seq_len=8, bucket=2,
                            n_tokens_col="n_tokens").collect()
    want = {r.doc_id: r.n_tokens for r in counts.collect()}
    rows = sorted(packed, key=lambda r: r.doc_id)
    # starts are the exclusive prefix sum of the BPE counts in id order
    acc = 0
    for r in rows:
        assert r.n_tokens == want[r.doc_id]
        assert r.start_tok == acc
        acc += r.n_tokens


def test_distributed_tier_merge_budget_guard(spark):
    """One shuffle round per merge: production-size vocab requests must
    point to the collect tier instead of running 32k jobs (r4 verdict
    item 9)."""
    import pytest

    from shapely_spark.text.bpe import (
        DISTRIBUTED_MERGE_BUDGET, bpe_train_distributed,
    )

    freqs = spark.createDataFrame(
        [("ab", 3), ("abc", 2)], "word string, freq long")
    with pytest.raises(ValueError, match="collect tier"):
        bpe_train_distributed(freqs, DISTRIBUTED_MERGE_BUDGET + 1)
    # small requests still run, and max_merges=None overrides the guard
    assert bpe_train_distributed(freqs, 1) == [("a", "b")]
    assert bpe_train_distributed(
        freqs, 1, max_merges=None) == [("a", "b")]
