"""Charset sniffing + decoding (spark/charset.py) — WHATWG order
(BOM → meta → default), exact windows-1252 via latin-1 + translate."""

import codecs

import pytest
from pyspark.sql import functions as F

from shapely_spark.spark.charset import (
    _CP1252_FROM,
    _CP1252_TO,
    decode_html,
    sniff_charset,
    with_decoded_html,
)


def _decode_one(spark, raw: bytes):
    df = spark.createDataFrame([(raw,)], "html binary")
    r = with_decoded_html(df).select("charset", "html_text").collect()[0]
    return r.charset, r.html_text


def test_bom_beats_meta(spark):
    # UTF-16LE BOM wins over a (lying) meta tag inside the byte stream
    body = '<meta charset="iso-8859-1"><p>útf</p>'
    cs, txt = _decode_one(spark, codecs.BOM_UTF16_LE + body.encode("utf-16-le"))
    assert cs == "utf-16le" and txt == body


def test_utf8_bom_stripped(spark):
    cs, txt = _decode_one(spark, codecs.BOM_UTF8 + "<p>çà</p>".encode("utf-8"))
    assert cs == "utf-8" and txt == "<p>çà</p>"


def test_meta_variants(spark):
    for meta in ('<meta charset="ISO-8859-1">',
                 "<meta charset='iso-8859-1'>",
                 '<meta http-equiv="Content-Type" '
                 'content="text/html; charset=iso-8859-1">'):
        body = meta + "<p>héllo Ä</p>"
        cs, txt = _decode_one(spark, body.encode("iso-8859-1"))
        assert cs == "iso-8859-1" and txt == body, meta


def test_cp1252_exact(spark):
    body = '<meta charset="windows-1252"><p>“smart” €™ œŸ ž</p>'
    cs, txt = _decode_one(spark, body.encode("cp1252"))
    assert cs == "windows-1252" and txt == body
    # the translate table is a bijection on the defined slots
    assert len(set(_CP1252_FROM)) == len(set(_CP1252_TO)) == 27


def test_default_and_unknown_label(spark):
    cs, txt = _decode_one(spark, b"<p>plain</p>")
    assert cs == "utf-8" and txt == "<p>plain</p>"
    # unknown label: reported verbatim, decoded as latin-1 (byte-preserving)
    body = '<meta charset="koi8-r"><p>abc</p>'
    cs, txt = _decode_one(spark, body.encode("ascii"))
    assert cs == "koi8-r" and txt == body


def test_utf16_be_bom(spark):
    body = "<p>中文 sixteen</p>"
    raw = body.encode("utf-16")  # python utf-16 = LE BOM on this platform
    cs, txt = _decode_one(spark, raw)
    assert cs in ("utf-16le", "utf-16be") and txt == body
    raw_be = codecs.BOM_UTF16_BE + body.encode("utf-16-be")
    cs2, txt2 = _decode_one(spark, raw_be)
    assert cs2 == "utf-16be" and txt2 == body


def test_decode_with_explicit_charset_column(spark):
    df = spark.createDataFrame(
        [("a", "héllo".encode("iso-8859-1"), "iso-8859-1"),
         ("b", "héllo".encode("utf-8"), "utf-8")],
        "k string, html binary, cs string")
    got = {r.k: r.t for r in df.select(
        "k", decode_html(F.col("html"), F.col("cs")).alias("t")).collect()}
    assert got == {"a": "héllo", "b": "héllo"}


def test_malformed_utf8_falls_back_to_latin1(spark):
    # meta claims utf-8 but the payload carries invalid sequences —
    # ubiquitous in real crawls; must NOT fail the job (Spark 4's
    # default codingErrorAction=REPORT throws without the guard)
    raw = b'<meta charset="utf-8"><p>\xff\xfe\x80 broken</p>'
    cs, txt = _decode_one(spark, raw)
    assert cs == "utf-8"
    assert txt == raw.decode("iso-8859-1")  # byte-preserving fallback
    # valid utf-8 still decodes as utf-8
    cs, txt = _decode_one(spark, '<meta charset="utf-8"><p>é</p>'.encode())
    assert txt == '<meta charset="utf-8"><p>é</p>'


def test_malformed_utf16_falls_back_to_latin1(spark):
    import codecs

    # UTF-16LE BOM followed by an ODD number of payload bytes
    raw = codecs.BOM_UTF16_LE + "ab".encode("utf-16-le") + b"\x41"
    cs, txt = _decode_one(spark, raw)
    assert cs == "utf-16le" and txt == raw.decode("iso-8859-1")
    # unpaired high surrogate (D800 with no low surrogate following)
    raw = codecs.BOM_UTF16_LE + b"\x00\xd8" + "x".encode("utf-16-le")
    cs, txt = _decode_one(spark, raw)
    assert cs == "utf-16le" and txt == raw.decode("iso-8859-1")
    # a proper surrogate PAIR (astral char) is valid and decodes
    raw = codecs.BOM_UTF16_LE + "a\U0001F600b".encode("utf-16-le")
    cs, txt = _decode_one(spark, raw)
    assert cs == "utf-16le" and txt == "a\U0001F600b"
    # BE: truncated pair via meta label (no BOM)
    body = '<meta charset="utf-16be">'
    raw = body.encode("utf-16-be") + b"\xdc\x00\x41\x41"  # lone LOW surr
    df = spark.createDataFrame([(raw,)], "html binary")
    got = df.select(decode_html(
        F.col("html"), F.lit("utf-16be")).alias("t")).collect()[0].t
    assert got == raw.decode("iso-8859-1")


def test_ascii_label_with_high_bytes_does_not_throw(spark):
    df = spark.createDataFrame([(b"plain ascii \xc3\xa9",)], "html binary")
    got = df.select(decode_html(
        F.col("html"), F.lit("us-ascii")).alias("t")).collect()[0].t
    assert got == "plain ascii é"  # valid utf-8 high bytes: decode utf-8
    df = spark.createDataFrame([(b"bad \xff ascii",)], "html binary")
    got = df.select(decode_html(
        F.col("html"), F.lit("us-ascii")).alias("t")).collect()[0].t
    assert got == "bad \xff ascii"  # invalid: latin-1 passthrough
