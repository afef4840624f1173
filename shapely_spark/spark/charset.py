"""Charset detection + decoding for crawled HTML — pure JVM expressions.

A Common-Crawl-scale corpus is far from all-UTF-8; the fetch pipeline
must sniff each page's encoding and decode to one canonical string
column before any text op. WHATWG encoding-sniffing order (the browser
contract, https://encoding.spec.whatwg.org/#specification): byte-order
mark first, then the in-document `<meta charset>` declaration, then the
default (UTF-8 here).

Everything stays in whole-stage codegen: BOM checks are binary-prefix
comparisons, the meta scan is one regex over a latin-1 decode of the
first KB (latin-1 never fails, and for multi-byte-encoded documents the
interleaved NULs simply stop the regex matching — the BOM already
decided those), and decoding is a `when` chain over Spark's built-in
charsets. windows-1252 — the classic "latin-1 that isn't" of real web
text — is decoded EXACTLY as latin-1 + a 1:1 `translate` of the
0x80–0x9F block to the cp1252 printable characters (the only bytes
where the two differ; the five undefined slots pass through).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sniff_charset", "decode_html", "with_decoded_html",
           "SUPPORTED_CHARSETS"]

# cp1252 0x80-0x9F → Unicode (WHATWG windows-1252 index); 0x81 0x8D 0x8F
# 0x90 0x9D are undefined in cp1252 and pass through as C1 controls.
_CP1252_FROM = "".join(chr(b) for b in range(0x80, 0xA0)
                       if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D))
_CP1252_TO = ("€‚ƒ„…†‡ˆ‰"
              "Š‹ŒŽ‘’“”•"
              "–—˜™š›œžŸ")
assert len(_CP1252_FROM) == len(_CP1252_TO) == 27

SUPPORTED_CHARSETS = ("utf-8", "iso-8859-1", "windows-1252",
                      "utf-16", "utf-16le", "utf-16be")

_META_RE = (r'(?i)<meta[^>]*charset\s*=\s*["\']?\s*([A-Za-z0-9_.:-]+)')


def sniff_charset(html: Column, default: str = "utf-8") -> Column:
    """Detected charset label per document (lowercased), WHATWG order:
    BOM (UTF-8 / UTF-16LE / UTF-16BE) → `<meta charset=...>` /
    `<meta http-equiv content="...charset=...">` in the first 1024
    bytes → `default`. Unknown meta labels are normalized to the
    closest supported decoder by `decode_html`; this function reports
    them verbatim (audit-friendly)."""
    b2 = F.substring(html, 1, 2)
    b3 = F.substring(html, 1, 3)
    prefix = F.decode(F.substring(html, 1, 1024), "ISO-8859-1")
    meta = F.lower(F.regexp_extract(prefix, _META_RE, 1))
    return (F.when(b3 == F.lit(b"\xef\xbb\xbf"), F.lit("utf-8"))
            .when(b2 == F.lit(b"\xff\xfe"), F.lit("utf-16le"))
            .when(b2 == F.lit(b"\xfe\xff"), F.lit("utf-16be"))
            .when(meta != "", meta)
            .otherwise(F.lit(default)))


# UTF-16 well-formedness over the hex expansion of the payload: units
# are 2-byte groups (4 hex chars); a unit is either a non-surrogate, or
# a high surrogate (high byte D8-DB) that MUST be followed by a low
# surrogate (high byte DC-DF). Possessive quantifier — no backtracking,
# one linear pass. Odd byte counts fail automatically (hex length not a
# multiple of 4). LE carries the high byte SECOND, BE first.
_H = "[0-9A-F]"
_UTF16LE_OK = (f"^(?:{_H}{{2}}(?:[0-9ABCEF]{_H}|D[0-7])"
               f"|{_H}{{2}}D[89AB]{_H}{{2}}D[CDEF])*+$")
_UTF16BE_OK = (f"^(?:(?:[0-9ABCEF]{_H}|D[0-7]){_H}{{2}}"
               f"|D[89AB]{_H}{{2}}D[CDEF]{_H}{{2}})*+$")


def decode_html(html: Column, charset: Column | None = None) -> Column:
    """html binary → string, decoded per the (sniffed or supplied)
    charset column. windows-1252 = latin-1 + exact 0x80-0x9F translate;
    any unrecognized label falls back to latin-1, which never fails and
    preserves the bytes 1:1 for a downstream re-decode (flag-don't-drop;
    ASCII documents decode identically under every 8-bit label). A
    leading U+FEFF left by a UTF-8/UTF-16 BOM is stripped so the decoded
    text never carries the marker.

    Malformed-input resilience: Spark 4's default codingErrorAction
    REPORTS (throws) on malformed bytes, and real crawls are full of
    pages whose BOM/meta lies about the payload — so every multi-byte
    branch is guarded by a JVM validity check and falls back to the
    latin-1 byte-preserving decode instead of failing the job: UTF-8 and
    US-ASCII via is_valid_utf8 (ASCII-labeled pages with valid-UTF-8
    high bytes decode as UTF-8 — strictly better than throwing), UTF-16
    variants via a possessive-regex well-formedness check over the hex
    expansion (even length + surrogates correctly paired; the generic
    utf-16 label validates LE when an FF FE BOM leads, else BE, matching
    the JVM decoder's byte-order rule). The when-chain short-circuits,
    so non-UTF-16 rows never pay the hex scan."""
    cs = charset if charset is not None else sniff_charset(html)
    latin1 = F.decode(html, "ISO-8859-1")
    hexed = F.hex(html)
    le_ok = hexed.rlike(_UTF16LE_OK)
    be_ok = hexed.rlike(_UTF16BE_OK)
    u8_ok = F.is_valid_utf8(html)
    u16_ok = F.when(F.substring(html, 1, 2) == F.lit(b"\xff\xfe"),
                    le_ok).otherwise(be_ok)
    decoded = (F.when((cs == "utf-8") & u8_ok, F.decode(html, "UTF-8"))
               .when((cs == "utf-16le") & le_ok, F.decode(html, "UTF-16LE"))
               .when((cs == "utf-16be") & be_ok, F.decode(html, "UTF-16BE"))
               .when((cs == "utf-16") & u16_ok, F.decode(html, "UTF-16"))
               .when((cs == "us-ascii") & u8_ok, F.decode(html, "UTF-8"))
               .when(cs == "windows-1252",
                     F.translate(latin1, _CP1252_FROM, _CP1252_TO))
               .otherwise(latin1))
    # strip a decoded BOM: UTF-16LE/BE decodes leave U+FEFF when the
    # document carried a BOM (the LE/BE charsets treat it as ZWNBSP),
    # as does a BOM'd UTF-8 document
    return F.when(F.substring(decoded, 1, 1) == "﻿",
                  F.substring(decoded, 2, 2147483646)).otherwise(decoded)


def with_decoded_html(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """pages + (charset, html_text): the ingest normalization step. The
    charset column is materialized (referenced by both the audit and
    the decode), so the sniff runs once per row."""
    return (pages
            .withColumn("charset", sniff_charset(F.col(html_col)))
            .withColumn("html_text",
                        decode_html(F.col(html_col), F.col("charset"))))
