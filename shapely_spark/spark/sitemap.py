"""Sitemap parsing (sitemaps.org XML protocol) — pure JVM expressions.

The crawl-discovery side of the engine: a host's sitemap.xml enumerates
its urls with optional freshness hints (`lastmod`, `changefreq`,
`priority`), and a sitemap INDEX points at child sitemaps. Both shapes
parse with the same two-pass JVM regex used for anchors
(spark/extract.py): extract the `<url>`/`<sitemap>` blocks, then capture
each field inside a transform lambda over the materialized block array —
the document decodes once per row, no Python anywhere.

Per the protocol, `lastmod` is W3C datetime (date-only or full
timestamp, both accepted via try_to_timestamp chains) and `priority`
defaults to 0.5 when absent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sitemap_entries", "is_sitemap_index", "parse_sitemaps"]

_URL_BLOCK_RE = r"(?s)<url>.*?</url>"
_SM_BLOCK_RE = r"(?s)<sitemap>.*?</sitemap>"
_LOC_RE = r"(?s)<loc>\s*([^<]*?)\s*</loc>"
_LASTMOD_RE = r"(?s)<lastmod>\s*([^<]*?)\s*</lastmod>"
_FREQ_RE = r"(?s)<changefreq>\s*([^<]*?)\s*</changefreq>"
_PRIO_RE = r"(?s)<priority>\s*([^<]*?)\s*</priority>"


def is_sitemap_index(xml: Column) -> Column:
    """True when the document is a sitemap INDEX (children are other
    sitemaps, not page urls)."""
    return F.locate("<sitemapindex", xml) > 0


def _entry(b: Column) -> Column:
    lastmod = F.regexp_extract(b, _LASTMOD_RE, 1)
    prio = F.regexp_extract(b, _PRIO_RE, 1)
    return F.struct(
        F.regexp_extract(b, _LOC_RE, 1).alias("loc"),
        F.coalesce(
            # W3C datetime forms, most-specific first: fractional seconds
            # (with/without offset), whole seconds (with/without offset),
            # minute precision with offset, date-only
            F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
            F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS")),
            F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
            F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
            F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mmXXX")),
            F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd")),
        ).alias("lastmod"),
        F.nullif(F.lower(F.regexp_extract(b, _FREQ_RE, 1)), F.lit(""))
        .alias("changefreq"),
        F.coalesce(prio.try_cast("double"), F.lit(0.5)).alias("priority"),
    )


def sitemap_entries(xml: Column) -> Column:
    """array<struct<loc,lastmod,changefreq,priority>> of a sitemap's
    `<url>` entries (empty array for an index document — route those
    through `is_sitemap_index` + the child locs)."""
    blocks = F.regexp_extract_all(xml, F.lit(_URL_BLOCK_RE), F.lit(0))
    return F.transform(blocks, _entry)


def child_sitemap_locs(xml: Column) -> Column:
    """array<string> of a sitemap index's child sitemap urls."""
    blocks = F.regexp_extract_all(xml, F.lit(_SM_BLOCK_RE), F.lit(0))
    return F.transform(blocks, lambda b: F.regexp_extract(b, _LOC_RE, 1))


def parse_sitemaps(docs: DataFrame, xml_col: str = "xml",
                   src_col: str = "sitemap_url") -> DataFrame:
    """(sitemap_url, loc, lastmod, changefreq, priority) — one row per
    discovered page url across a frame of fetched sitemap documents;
    index documents contribute (sitemap_url, child_loc) rows flagged
    ``is_index`` so the caller can enqueue the children (fetching is the
    crawler's job — one explode, no shuffle)."""
    xml = F.col(xml_col)
    urls = (docs.where(~is_sitemap_index(xml))
            .select(F.col(src_col),
                    F.explode(sitemap_entries(xml)).alias("e"))
            .select(src_col, F.col("e.loc").alias("loc"),
                    F.col("e.lastmod").alias("lastmod"),
                    F.col("e.changefreq").alias("changefreq"),
                    F.col("e.priority").alias("priority"),
                    F.lit(False).alias("is_index")))
    kids = (docs.where(is_sitemap_index(xml))
            .select(F.col(src_col),
                    F.explode(child_sitemap_locs(xml)).alias("loc"))
            .select(src_col, "loc",
                    F.lit(None).cast("timestamp").alias("lastmod"),
                    F.lit(None).cast("string").alias("changefreq"),
                    F.lit(None).cast("double").alias("priority"),
                    F.lit(True).alias("is_index")))
    return urls.unionByName(kids)
