"""Sitemap protocol parsing (spark/sitemap.py)."""

from pyspark.sql import functions as F

from shapely_spark.spark.sitemap import (
    is_sitemap_index,
    parse_sitemaps,
    sitemap_entries,
)


def _parse(spark, xml, src="https://s.example.org/sitemap.xml"):
    df = spark.createDataFrame([(src, xml)], "sitemap_url string, xml string")
    return parse_sitemaps(df).collect()


def test_url_entries_all_fields(spark):
    xml = ('<?xml version="1.0"?><urlset>'
           "<url><loc>https://a/1</loc><lastmod>2026-02-03</lastmod>"
           "<changefreq>Daily</changefreq><priority>0.8</priority></url>"
           "<url><loc> https://a/2 </loc>"
           "<lastmod>2026-02-03T04:05:06</lastmod></url>"
           "<url><loc>https://a/3</loc></url>"
           "</urlset>")
    rows = {r.loc: r for r in _parse(spark, xml)}
    assert set(rows) == {"https://a/1", "https://a/2", "https://a/3"}
    r1 = rows["https://a/1"]
    assert (r1.changefreq, r1.priority, r1.is_index) == ("daily", 0.8, False)
    assert r1.lastmod.strftime("%Y-%m-%d %H:%M:%S") == "2026-02-03 00:00:00"
    r2 = rows["https://a/2"]  # whitespace-trimmed loc, T-form lastmod
    assert r2.lastmod.strftime("%H:%M:%S") == "04:05:06"
    assert rows["https://a/3"].priority == 0.5  # protocol default
    assert rows["https://a/3"].lastmod is None


def test_index_document_children(spark):
    xml = ("<sitemapindex>"
           "<sitemap><loc>https://a/s1.xml</loc></sitemap>"
           "<sitemap><loc>https://a/s2.xml</loc></sitemap>"
           "</sitemapindex>")
    rows = _parse(spark, xml)
    assert all(r.is_index for r in rows)
    assert sorted(r.loc for r in rows) == ["https://a/s1.xml",
                                          "https://a/s2.xml"]


def test_is_index_and_empty(spark):
    df = spark.createDataFrame(
        [("<urlset></urlset>",), ("<sitemapindex></sitemapindex>",)],
        "xml string")
    got = [r[0] for r in df.select(is_sitemap_index(F.col("xml"))).collect()]
    assert got == [False, True]
    assert df.where(~is_sitemap_index(F.col("xml"))).select(
        F.size(sitemap_entries(F.col("xml")))).collect()[0][0] == 0


def test_lastmod_fractional_and_minute_forms(spark):
    """W3C datetime with fractional seconds / minute precision must not
    silently parse to NULL lastmod (r4 ADVICE)."""
    from pyspark.sql import functions as F

    from shapely_spark.spark.sitemap import sitemap_entries

    xml = ("<urlset>"
           "<url><loc>https://a/f1</loc>"
           "<lastmod>2026-01-05T03:04:05.123+00:00</lastmod></url>"
           "<url><loc>https://a/f2</loc>"
           "<lastmod>2026-01-05T03:04:05.500</lastmod></url>"
           "<url><loc>https://a/f3</loc>"
           "<lastmod>2026-01-05T03:04+01:00</lastmod></url>"
           "</urlset>")
    df = spark.createDataFrame([(xml,)], "xml string")
    rows = {e.loc: e for e in df.select(
        F.explode(sitemap_entries(F.col("xml"))).alias("e")
    ).select("e.*").collect()}
    assert rows["https://a/f1"].lastmod.strftime("%H:%M:%S.%f") \
        == "03:04:05.123000"
    assert rows["https://a/f2"].lastmod.strftime("%H:%M:%S.%f") \
        == "03:04:05.500000"
    # minute-precision with offset: +01:00 → 02:04 UTC
    assert rows["https://a/f3"].lastmod.strftime("%H:%M:%S") == "02:04:00"
