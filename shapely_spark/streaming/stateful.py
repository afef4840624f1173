"""Custom stateful streaming operator: session-gap aggregation via
applyInPandasWithState.

The batch twin is queries.events_sessionize (30-min-gap sessions); this is
the continuous form with explicit per-key state — the engine pattern for
any custom stateful operator the built-in windowed aggregations can't
express (reference has no streaming surface, SURVEY.md §2.10).

Correctness under out-of-order arrival (file sources order microbatches by
modification time, not event time): events are BUFFERED in state, and a
session is finalized only when the event-time watermark passes
session_end + gap — at that point no on-time event can extend it, and
later events are late-by-contract and ignored. State per key is bounded:
only events belonging to not-yet-finalizable sessions are retained
(everything older is emitted and evicted), so memory is O(events within
gap + watermark delay of the key's max timestamp).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = ("user_id long, session_start double, session_end double, "
              "n_events long, sum_value double")
STATE_SCHEMA = "ts array<double>, vs array<double>"


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "1 hour") -> DataFrame:
    """events(user_id, ts timestamp, value double) stream → closed-session
    rows (user_id, session_start, session_end, n_events, sum_value)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = gap_minutes * 60.0

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        user_id = key[0]
        buf_ts: list[float] = []
        buf_vs: list[float] = []
        if state.exists:
            ts0, vs0 = state.get
            buf_ts, buf_vs = list(ts0), list(vs0)
        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf):
                    buf_ts.extend(t.timestamp() for t in pdf["ts"])
                    buf_vs.extend(float(v) for v in pdf["value"])
        wm = state.getCurrentWatermarkMs() / 1000.0
        closed = []
        if buf_ts:
            order = sorted(range(len(buf_ts)), key=lambda i: buf_ts[i])
            ts = [buf_ts[i] for i in order]
            vs = [buf_vs[i] for i in order]
            # split into gap-sessions, finalize those sealed by the watermark
            keep_ts: list[float] = []
            keep_vs: list[float] = []
            i = 0
            n_ev = len(ts)
            while i < n_ev:
                j = i
                while j + 1 < n_ev and ts[j + 1] - ts[j] <= gap:
                    j += 1
                if ts[j] + gap < wm:
                    closed.append(
                        (user_id, ts[i], ts[j], j - i + 1, float(sum(vs[i:j + 1])))
                    )
                else:
                    keep_ts.extend(ts[i:j + 1])
                    keep_vs.extend(vs[i:j + 1])
                i = j + 1
            if keep_ts:
                state.update((keep_ts, keep_vs))
                # wake up when the watermark can seal the open session
                timeout_ms = int((keep_ts[-1] + gap) * 1000) + 1
                state.setTimeoutTimestamp(
                    max(timeout_ms, int(state.getCurrentWatermarkMs()) + 1)
                )
            else:
                state.remove()
        else:
            state.remove()
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end",
                     "n_events", "sum_value"],
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", ts_col: str = "ts",
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: emit each content fingerprint's FIRST
    arrival, drop repeats — the continuous twin of text.dedup.exact_dedup.

    State per fingerprint key is one boolean row (seen); Spark's own
    dropDuplicates-with-watermark covers only event-time-bounded windows,
    while this keeps the fingerprint alive for the state store's lifetime
    and reports the duplicate count per key on eviction-free updates. Keys
    are md5(content) so state size is O(distinct contents), independent of
    document length. At cluster scale the groupBy(fp) shuffle is the
    standard hash-partitioned state layout (RocksDB-backed per executor).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"fp string, {id_col} long, n_dupes long"
    state_schema = "keeper long, n long"

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        fp = key[0]
        if state.exists:
            keeper, n = state.get
            first_emit = False
        else:
            keeper, n = None, 0
            first_emit = True
        for pdf in pdfs:
            for i in pdf[id_col]:
                n += 1
                if keeper is None:
                    keeper = int(i)  # first arrival in stream order wins
        if keeper is not None:
            state.update((int(keeper), int(n)))
        if first_emit and keeper is not None:
            yield pd.DataFrame({"fp": [fp], id_col: [int(keeper)],
                                "n_dupes": [int(n)]})
        else:
            yield pd.DataFrame({"fp": [], id_col: [], "n_dupes": []}).astype(
                {"fp": "object", id_col: "int64", "n_dupes": "int64"})

    keyed = (
        docs.withWatermark(ts_col, watermark)
        .withColumn("__fp", F.md5(F.encode(F.col(text_col), "UTF-8")))
        .groupBy("__fp")
    )
    return keyed.applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout,
    )


def neardup_candidates_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_n: int = 3,
    seed: int = 7,
    max_bucket: int = 4096,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming MinHash-LSH near-dup candidates — the continuous twin of
    text.dedup.minhash_lsh_candidates. The stateless front half IS the
    batch pipeline (shingle → xxhash64 → 64-way signature → banded FNV
    digests, same seeds, so stream and batch land in identical buckets);
    the stateful half keeps, per band bucket, the ids seen so far and
    emits (doc_a, doc_b) = (earlier, later) the moment the later doc
    arrives — candidates surface incrementally instead of after a corpus
    self-join.

    Pairs may repeat across bands (the batch side dedups with ONE
    dropDuplicates); dedup downstream with dropDuplicates within the
    watermark or in the verify join. Bucket cap is PROSPECTIVE: once a
    bucket has emitted against `max_bucket` members it saturates and
    ignores later arrivals (a stream cannot retrospectively drop an
    oversized bucket the way the batch generator does — run exact dedup
    upstream so identical boilerplate never floods a bucket, same
    contract as the batch path). State per bucket is O(min(members,
    max_bucket)) longs."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..text.dedup import _bands_udf, _minhash_sig_udf, shingles_col

    sig = _minhash_sig_udf(n_hashes, seed)
    bands = _bands_udf(n_bands, n_hashes // n_bands)
    base = F.transform(shingles_col(F.col(text_col), shingle_n),
                       lambda s: F.xxhash64(s))
    keyed = (
        docs.withWatermark(ts_col, watermark)
        .select(F.col(id_col), F.col(ts_col), sig(base).alias("__mh"))
        .where(F.col("__mh").isNotNull())
        .select(id_col, ts_col,
                F.explode(bands(F.col("__mh"))).alias("bucket"))
        .groupBy("bucket")
    )
    out_schema = "doc_a long, doc_b long"
    state_schema = "ids array<long>, sat boolean"

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            ids0, sat = state.get
            ids = [int(x) for x in ids0]
            sat = bool(sat)
        else:
            ids, sat = [], False
        chunks = [pdf[[ts_col, id_col]] for pdf in pdfs if len(pdf)]
        pa: list[int] = []
        pb: list[int] = []
        if chunks and not sat:
            arr = pd.concat(chunks).sort_values([ts_col, id_col])
            for d in arr[id_col]:
                d = int(d)
                if sat or d in ids:
                    continue  # replays/dupes of the same id are no-ops
                for m in ids:
                    pa.append(min(m, d))
                    pb.append(max(m, d))
                ids.append(d)
                if len(ids) >= max_bucket:
                    sat = True
                    break
        state.update((ids, sat))
        yield pd.DataFrame({"doc_a": pd.Series(pa, dtype="int64"),
                            "doc_b": pd.Series(pb, dtype="int64")})

    return keyed.applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout,
    )


def revisit_stream(pages: DataFrame, url_col: str = "url",
                   ts_col: str = "warc_ts", content_col: str = "text",
                   watermark: str = "1 hour") -> DataFrame:
    """Streaming revisit detection: classify each arriving fetch as
    (is_first, changed) against the url's PREVIOUS fetch — the
    continuous twin of spark.crawl.version_changes, i.e. the
    classification a crawler stamps into CDX/WARC revisit records at
    fetch time.

    State per url is (last_ts, last_digest) — two numbers, independent
    of payload size (digest = md5/64-bit-truncated of the content, the
    same equality contract as the batch digest lag). Within a microbatch
    fetches are ordered by event time; across microbatches
    classification follows arrival order, which equals event-time order
    whenever the source delivers fetches in crawl order (the WARC/CDX
    convention) — a fetch arriving with ts older than the url's state is
    classified against the newest-seen fetch and flagged out_of_order
    instead of silently misclassified.

    Output: (url, ts, is_first, changed, out_of_order)."""
    import hashlib

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (f"{url_col} string, ts double, is_first boolean, "
                  "changed boolean, out_of_order boolean")
    state_schema = "last_ts double, last_fp long"

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        url = key[0]
        last_ts, last_fp = state.get if state.exists else (None, None)
        urls, tss, firsts, changeds, oods = [], [], [], [], []
        batch = [pdf for pdf in pdfs if len(pdf)]
        rows = []
        for pdf in batch:
            for t, c in zip(pdf["ts"], pdf[content_col]):
                rows.append((t.timestamp(), c))
        rows.sort(key=lambda r: r[0])
        for t, c in rows:
            fp = int.from_bytes(
                hashlib.md5(str(c).encode()).digest()[:8], "little",
                signed=True)
            urls.append(url)
            tss.append(t)
            firsts.append(last_fp is None)
            changeds.append(last_fp is not None and fp != last_fp)
            oods.append(last_ts is not None and t < last_ts)
            if last_ts is None or t >= last_ts:
                last_ts, last_fp = t, fp
        if last_ts is not None:
            state.update((float(last_ts), int(last_fp)))
        yield pd.DataFrame({url_col: pd.Series(urls, dtype="object"),
                            "ts": pd.Series(tss, dtype="float64"),
                            "is_first": pd.Series(firsts, dtype="bool"),
                            "changed": pd.Series(changeds, dtype="bool"),
                            "out_of_order": pd.Series(oods, dtype="bool")})

    keyed = (pages.withColumnRenamed(ts_col, "ts")
             .withWatermark("ts", watermark)
             .groupBy(url_col))
    return keyed.applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout,
    )
