"""Raw WARC-bytes ingest: writer→reader round trip, truncated-tail
tolerance, byte-identical text parity with the corpus, and the parse →
classify composition (SURVEY §2.7 'WARC record iteration')."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from crawler_spark.oracle.reference_decode import decode_bulk, decode_with_headers
from crawler_spark.sources.corpus import generate_pages
from crawler_spark.sources.warc import (
    build_warc,
    iter_warc_records,
    parse_warc_bytes,
)


def _recs(n: int = 5):
    return [
        {
            "url": f"https://h{i}.example/p/{i}",
            "body": f"<html><p>page {i} ünïcode</p></html>".encode(),
            "content_type": "text/html; charset=utf-8",
        }
        for i in range(n)
    ]


def test_reader_handles_all_compressions():
    recs = _recs()
    for compress in ("none", "whole", "record"):
        out = [r for r in iter_warc_records(build_warc(recs, compress=compress))]
        assert [r["target_uri"] for r in out] == [r["url"] for r in recs]
        assert all(r["http_status"] == 200 for r in out)
        assert out[3]["body"] == recs[3]["body"]


def test_truncated_tail_drops_only_incomplete_record():
    recs = _recs(6)
    blob = build_warc(recs, compress="record")
    cut = blob[:-25]  # cuts inside the last gzip member
    out = list(iter_warc_records(cut))
    assert len(out) == 5
    assert out[-1]["target_uri"] == recs[4]["url"]


def test_charset_rules_match_reference():
    body = "<html>ıç üç ğş</html>".encode("iso-8859-9")
    blob = build_warc(
        [{"url": "https://t.example/", "body": body,
          "content_type": "text/html; charset=iso-8859-9"}]
    )
    rec = next(iter_warc_records(blob))
    # targeted rule: header charset; bulk rule: utf-8-always
    assert decode_with_headers(rec["body"], rec["http_headers"]["Content-Type"]) == \
        "<html>ıç üç ğş</html>"
    assert decode_bulk(rec["body"]) == body.decode("utf-8", errors="ignore")


@pytest.mark.spark
def test_spark_parse_byte_identical_to_corpus(spark):
    """Corpus pages → WARC blobs → parse_warc_bytes must reproduce the url,
    raw html bytes, and bulk-decoded text byte-for-byte (the per-row
    invariant: byte-identical extracted text per url)."""
    pages = generate_pages(spark, 240, partitions=4).collect()

    # one blob per warc_source, records in warc_offset order; the corpus
    # `html` column is the raw (sometimes gzipped, sometimes truncated)
    # HTTP body — exactly what a WARC response payload carries.
    by_src: dict[str, list] = {}
    for r in sorted(pages, key=lambda r: (r.warc_source, r.warc_offset)):
        by_src.setdefault(r.warc_source, []).append(r)
    seg_rows = [
        (
            src,
            build_warc(
                [
                    {
                        "url": r.url,
                        "body": bytes(r.html),
                        "content_type": r.mime,
                        "status": int(r.status),
                        "rec_type": r.rec_type,
                    }
                    for r in rows
                ],
                compress="record",
            ),
        )
        for src, rows in by_src.items()
    ]
    segments = spark.createDataFrame(seg_rows, "warc_source string, data binary")

    parsed = parse_warc_bytes(segments, mode="bulk").collect()
    got = {(p.warc_source, p.warc_offset): p for p in parsed}

    n_checked = 0
    for src, rows in by_src.items():
        for off, r in enumerate(rows):
            if r.rec_type != "response":
                continue  # bulk mode keeps response records only
            p = got[(src, off)]
            assert p.url == r.url
            assert bytes(p.html) == bytes(r.html)
            assert p.text == r.text  # corpus text IS decode_bulk(html)
            assert p.mime == r.mime and p.status == r.status
            n_checked += 1
    assert n_checked > 150
    # request records were filtered out by the response gate
    assert all(p.rec_type == "response" for p in parsed)


@pytest.mark.spark
def test_spark_targeted_mode_first_response_only(spark):
    blob = build_warc(
        [{"url": "https://t.example/req", "body": b"", "rec_type": "request"}]
        + [
            {
                "url": f"https://t.example/{i}",
                "body": "tëxt".encode("iso-8859-1"),
                "content_type": "text/html; charset=iso-8859-1",
            }
            for i in range(3)
        ]
    )
    segments = spark.createDataFrame([("w0", blob)], "warc_source string, data binary")
    out = parse_warc_bytes(segments, mode="targeted").collect()
    assert len(out) == 1
    assert out[0].url == "https://t.example/0"
    assert out[0].text == "tëxt"  # header-charset rule applied


@pytest.mark.spark
def test_parse_then_classify_composes(spark):
    """parse_warc_bytes output plugs straight into classify_bulk and yields
    the same results as classifying the original pages."""
    from crawler_spark.plans.flagship import classify_bulk

    pages = generate_pages(spark, 200, partitions=2)
    rows = sorted(pages.collect(), key=lambda r: (r.warc_source, r.warc_offset))
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.warc_source, []).append(r)
    seg_rows = [
        (src, build_warc(
            [{"url": r.url, "body": bytes(r.html), "content_type": r.mime,
              "status": int(r.status), "rec_type": r.rec_type} for r in rs],
            compress="record"))
        for src, rs in by_src.items()
    ]
    segments = spark.createDataFrame(seg_rows, "warc_source string, data binary")
    from_warc = classify_bulk(parse_warc_bytes(segments, mode="bulk"))
    direct = classify_bulk(pages)

    key = ["warc_source", "url", "confidence"]
    a = {tuple(r[k] for k in key) for r in from_warc.select(*key).collect()}
    b = {tuple(r[k] for k in key) for r in direct.select(*key).collect()}
    assert a == b and len(a) > 0


@pytest.mark.spark
def test_spark_head_sample_max_bytes(spark):
    recs = _recs(20)
    blob = build_warc(recs, compress="record")
    segments = spark.createDataFrame([("w0", blob)], "warc_source string, data binary")
    full = parse_warc_bytes(segments, mode="bulk").count()
    sampled = parse_warc_bytes(segments, mode="bulk", max_bytes=len(blob) // 2).count()
    assert full == 20 and 0 < sampled < 20


@pytest.mark.spark
def test_targeted_ingest_charsets_and_head_slice(spark):
    """warc_ingest_targeted fixture: the utf-16-le body must round-trip
    through the header-charset rule (a utf-8-always decode would NUL-
    interleave it), and g%3==0 blobs — first record cut by the max_bytes
    slice — must yield nothing."""
    import pandas as pd
    from crawler_spark.sources.warc import warc_ingest_targeted_from_documents

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(8)),
                "source": [f"src{i}" for i in range(8)],
                "text": [f"some doc text number {i} with words" for i in range(8)],
            }
        )
    )
    rows = {r["url"]: r for r in warc_ingest_targeted_from_documents(docs).collect()}
    # 8 docs → 8 groups of one; g%3==0 (0,3,6) sliced away → 5 survivors
    assert len(rows) == 5
    assert set(rows) == {
        f"https://src{i}.example.com/d/{i}" for i in (1, 2, 4, 5, 7)
    }
    # doc 2 is the UTF-16-LE case: identity decode → original char length
    r2 = rows["https://src2.example.com/d/2"]
    assert r2["mime"] == "text/html; charset=UTF-16-LE"
    assert r2["n_chars"] == len("some doc text number 2 with words")
