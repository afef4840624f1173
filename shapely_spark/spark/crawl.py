"""Recrawl analytics over a multi-snapshot pages table.

A Common-Crawl-style corpus carries MANY fetches of the same url across
crawls (the `warc_ts` axis of the input contract). These operators answer
the questions a crawl scheduler and a training-data curator both ask:

- which fetch is the CURRENT version of each url (`latest_snapshot`);
- did a refetch actually change the content (`version_changes` — the
  revisit classification CDX "revisit" records encode, reference
  ecosystem: WARC 1.1 §6.7.2 revisit records keyed on payload digest);
- how volatile is each host (`host_change_stats` — the signal behind
  per-host recrawl frequency).

Scale design (10^12 fetches): every operator shuffles ONCE on url for
the per-url window (content comparison is lag() over the url's fetch
chain — no self-join), then `host_change_stats` reduces url-grain
results with a map-side partial aggregate to host grain (~10^7 rows).
Content equality at scale uses a 64-bit fingerprint column (xxhash64 of
the payload), not the payload itself, so the url shuffle moves
(url, ts, 8-byte digest) — bucketing the table by url makes it
shuffle-free. Collisions: 64-bit digests over ~10^3 versions per url
put the per-url collision probability ≲ 1e-13 (birthday bound) — the
same tradeoff the WARC revisit-by-digest convention makes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "latest_snapshot",
    "version_changes",
    "host_change_stats",
]


def _fp(content: Column) -> Column:
    """64-bit content digest (xxhash64 — the engine's standard mixer;
    ANSI-safe, JVM-side)."""
    return F.xxhash64(content)


def latest_snapshot(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """One row per url: the fetch with the greatest `ts_col` (ties break
    toward the later row by a stable tiebreak on the digest so the pick
    is deterministic under equal timestamps).

    This is the "current web" view of a crawl archive. One hash shuffle
    on url; the window computes row_number over (url) ordered by ts desc
    and keeps rank 1 — no self-join against a max-ts aggregate (which
    would scan twice and shuffle twice)."""
    w = Window.partitionBy(url_col).orderBy(
        F.col(ts_col).desc(), F.xxhash64(url_col, ts_col).asc())
    return (pages.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn"))


def version_changes(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "text",
) -> DataFrame:
    """Per fetch: `is_first` (first time this url was seen) and
    `changed` (payload digest differs from the url's previous fetch).

    A refetch with an unchanged digest is what CDX/WARC dedupe as a
    "revisit" record; `changed` rows are the fetches worth re-extracting
    downstream. Adds columns, preserves grain. One url shuffle; the
    payload column itself never moves — only its 64-bit digest feeds the
    lag comparison."""
    w = Window.partitionBy(url_col).orderBy(F.col(ts_col).asc())
    fp = _fp(F.col(content_col))
    prev = F.lag(fp).over(w)
    return (pages
            .withColumn("is_first", prev.isNull())
            .withColumn("changed", prev.isNotNull() & (prev != fp)))


def host_change_stats(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "text",
) -> DataFrame:
    """Host-grain crawl-volatility summary:

    (host, n_fetches, n_urls, n_refetches, n_changed, change_rate)

    where `n_refetches` counts fetches beyond each url's first,
    `n_changed` counts refetches whose content digest differs from the
    previous fetch, and `change_rate` = n_changed / n_refetches (NULL for
    hosts never refetched — try_divide, ANSI-safe). This is the prior a
    scheduler uses to set per-host revisit frequency.

    Plan: version_changes' url window (one shuffle) → partial-agg count
    rollup to host (second shuffle moves ≤ one row per host partial)."""
    v = version_changes(pages, url_col, ts_col, content_col)
    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    return (v.select(host.alias("host"), url_col, "is_first", "changed")
            .groupBy("host")
            .agg(F.count("*").alias("n_fetches"),
                 F.count_distinct(F.col(url_col)).alias("n_urls"),
                 F.sum((~F.col("is_first")).cast("long")).alias("n_refetches"),
                 F.sum(F.col("changed").cast("long")).alias("n_changed"))
            .withColumn("change_rate",
                        F.round(F.try_divide("n_changed", "n_refetches"), 6)))
