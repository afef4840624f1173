"""Outlink extraction → host-level link graph (spark/extract.py
extract_links / host_of / outlink_host_edges)."""

from pyspark.sql import functions as F

from shapely_spark.spark.extract import (extract_links, host_of,
                                         outlink_host_edges)


def _pages(spark, rows):
    df = spark.createDataFrame(rows, "url string, body string")
    return df.select("url", F.encode("body", "UTF-8").alias("html"))


def test_extract_links_order_and_multiplicity(spark):
    pages = _pages(spark, [(
        "https://a.org/",
        '<a href="https://b.org/1">x</a> mid '
        '<img href="https://c.org/2"> <a href="https://b.org/1">again</a>')])
    links = pages.select(extract_links(F.col("html")).alias("l")).collect()[0].l
    assert links == ["https://b.org/1", "https://c.org/2", "https://b.org/1"]


def test_host_of_lowercases_and_nulls(spark):
    df = spark.createDataFrame(
        [("https://WWW.Example.ORG/Path?q=1",), ("/relative/path",),
         ("mailto:x@y.z",), ("",)], "u string")
    got = [r.h for r in df.select(host_of(F.col("u")).alias("h")).collect()]
    assert got[0] == "www.example.org"
    assert got[1] is None and got[3] is None


def test_outlink_host_edges_counts_and_drops(spark):
    pages = _pages(spark, [
        ("https://a.org/p1",
         '<a href="https://b.org/x">.</a><a href="https://b.org/y">.</a>'
         '<a href="/relative">.</a><a href="https://c.org/">.</a>'),
        ("https://a.org/p2", '<a href="https://b.org/z">.</a>'),
        ("https://b.org/p", '<a href="HTTPS://A.ORG/up">.</a>'),
        ("https://d.org/none", "no anchors here"),
    ])
    got = {(r.src_host, r.dst_host): r.n_links
           for r in outlink_host_edges(pages).collect()}
    assert got == {("a.org", "b.org"): 3, ("a.org", "c.org"): 1,
                   ("b.org", "a.org"): 1}


def test_edges_plan_is_jvm_only(spark):
    pages = _pages(spark, [("https://a.org/", '<a href="https://b.org/">.</a>')])
    plan = outlink_host_edges(pages)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
