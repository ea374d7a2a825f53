"""Decode rules: byte-identical text vs the reference's two decode paths
(/root/reference/src/warc/parser.py:29-77; src/warc_processor.py:239-264)."""

from __future__ import annotations

import gzip

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.oracle import decode_bulk, decode_with_headers, gunzip_sniff


def test_gunzip_sniff_plain_passthrough():
    assert gunzip_sniff(b"<html>hi</html>") == b"<html>hi</html>"
    assert gunzip_sniff(b"") == b""
    assert gunzip_sniff(None) == b""


def test_gunzip_sniff_roundtrip():
    raw = "çok güzel ĞÜŞİÖÇ html".encode("utf-8")
    assert gunzip_sniff(gzip.compress(raw)) == raw


def test_gunzip_sniff_truncated_tail():
    # Bulk path tolerates 'Compressed file ended' (src/warc_processor.py:273-279):
    # a truncated gzip stream yields its decompressed prefix.
    raw = b"A" * 100_000 + b"TAIL_MARKER"
    gz = gzip.compress(raw)
    cut = gz[: len(gz) // 2]
    out = gunzip_sniff(cut)
    assert out.startswith(b"AAAA") and len(out) > 0 and b"TAIL_MARKER" not in out


def test_gunzip_sniff_bad_gzip_falls_back_to_raw():
    fake = b"\x1f\x8b" + b"not really gzip at all"
    assert gunzip_sniff(fake) == fake


def test_decode_bulk_utf8_ignore():
    # invalid continuation bytes are DROPPED (errors='ignore'), not replaced
    raw = b"caf\xc3\xa9 \xff\xfe broken"
    assert decode_bulk(raw) == raw.decode("utf-8", errors="ignore")
    assert "�" not in decode_bulk(raw)


def test_decode_with_headers_charset_extraction():
    raw = "Ünïcödé ĞÜŞ".encode("iso-8859-9", errors="ignore")
    # charset token parsing: lowered, ';'-split, stripped
    got = decode_with_headers(raw, "text/html; charset=ISO-8859-9 ; foo=bar")
    assert got == raw.decode("iso-8859-9", errors="ignore")


def test_decode_with_headers_unknown_charset_falls_back_utf8():
    raw = "plain ascii".encode()
    assert decode_with_headers(raw, "text/html; charset=klingon-1") == "plain ascii"


def test_decode_with_headers_default_utf8():
    raw = "türkçe".encode("utf-8")
    assert decode_with_headers(raw, "text/html") == "türkçe"
    assert decode_with_headers(raw, None) == "türkçe"


def test_declared_charset_lies():
    # FIXTURES.md ~1% declared-charset-lies: bytes are utf-8 but header says
    # iso-8859-1 → decoded AS DECLARED with errors='ignore' (mojibake is the
    # reference behavior; we must reproduce it, not fix it).
    raw = "şğü".encode("utf-8")
    got = decode_with_headers(raw, "text/html; charset=iso-8859-1")
    assert got == raw.decode("iso-8859-1", errors="ignore")
    assert got != "şğü"


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2000), st.booleans())
def test_decode_bulk_property(raw, compress):
    data = gzip.compress(raw) if compress else raw
    expect = raw if compress else raw
    # plain path may accidentally start with gzip magic — mirror the oracle
    assert decode_bulk(data) == gunzip_sniff(data).decode("utf-8", errors="ignore")
    if compress:
        assert decode_bulk(data) == expect.decode("utf-8", errors="ignore")


@pytest.mark.spark
def test_decode_udfs_roundtrip(spark):
    import gzip as gz

    from crawler_spark.functions.decode import decode_bulk_udf, decode_with_headers_udf
    from pyspark.sql import functions as F

    rows = [
        (1, gz.compress("gzip utf-8 şğü".encode()), "text/html; charset=utf-8"),
        (2, "plain latin-9 şĞ".encode("iso-8859-9", "ignore"), "text/html; charset=iso-8859-9"),
        (3, b"caf\xc3\xa9 \xff broken", None),
        (4, None, None),
        (5, gz.compress(b"X" * 50_000)[:100], None),  # truncated gzip
    ]
    df = spark.createDataFrame(rows, "id int, html binary, mime string")
    got = {
        r["id"]: (r["bulk"], r["hdr"])
        for r in df.select(
            "id",
            decode_bulk_udf(F.col("html")).alias("bulk"),
            decode_with_headers_udf(F.col("html"), F.col("mime")).alias("hdr"),
        ).collect()
    }
    for rid, raw, mime in rows:
        assert got[rid][0] == decode_bulk(raw), f"bulk id={rid}"
        assert got[rid][1] == decode_with_headers(raw, mime), f"hdr id={rid}"
