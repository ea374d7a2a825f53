"""Raw WARC-bytes ingest — the operator every real use of this engine
starts from: a byte stream of WARC records → typed page rows.

The reference does this with ``warcio.ArchiveIterator`` over a fetched
(and possibly mid-file-truncated) stream
(/root/reference/src/warc/parser.py:28-90,
/root/reference/src/warc_processor.py:226-280). warcio is not available
in this environment, so :func:`iter_warc_records` is a minimal pure-Python
reader for the WARC/1.0 format (length-prefixed records: version line,
CRLF headers, blank line, ``Content-Length`` payload bytes, CRLF CRLF
separator), with the same tolerances the reference relies on:

- gzip sniff on the whole stream, including *member-per-record* gzip
  (the Common Crawl layout) — concatenated members are decompressed in a
  loop and a truncated tail yields its partial prefix;
- a record whose payload is cut off by the truncation is DROPPED and
  iteration stops — warcio raises there and the reference catches
  "Compressed file ended" keeping only the complete records
  (src/warc_processor.py:273-279);
- response records carry an embedded HTTP message: status line + headers
  + CRLF CRLF + body; the body is the record "content" and the
  ``Content-Type`` HTTP header feeds the charset rule.

Spark-side, :func:`parse_warc_bytes` is ONE ``mapInPandas`` stage
(blob → many page rows, Arrow-batched, nothing collected): at 100 TB each
task parses its own WARC segments and the emitted rows have exactly the
``pages`` schema, so the output plugs straight into
``plans.flagship.classify_bulk``. Per-blob work is independent → the
stage scales linearly with executors and needs no shuffle.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from crawler_spark.oracle.reference_decode import (
    GZIP_MAGIC,
    decode_bulk,
    decode_with_headers,
)

# --------------------------------------------------------------- reading --


def _gunzip_members(raw: bytes) -> bytes:
    """Decompress concatenated gzip members; a truncated or corrupt tail
    yields whatever decompressed cleanly before it (tolerant-tail rule)."""
    out = io.BytesIO()
    rest = raw
    while rest.startswith(GZIP_MAGIC):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.write(d.decompress(rest))
            out.write(d.flush())
        except zlib.error:
            break
        if not d.eof:  # truncated final member: partial prefix kept
            break
        rest = d.unused_data
    return out.getvalue()


def _sniff_stream(raw: bytes | None) -> bytes:
    if not raw:
        return b""
    if raw.startswith(GZIP_MAGIC):
        return _gunzip_members(raw)
    return raw


def _parse_http_payload(payload: bytes):
    """Split an HTTP response message into (status, headers, body).

    Headers keep their original spelling; lookups in the targeted path are
    case-sensitive on 'Content-Type' exactly like the reference's plain
    dict access (src/warc/parser.py:52-64)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, {}, payload
    head = payload[:sep].decode("latin-1", errors="ignore")
    body = payload[sep + 4 :]
    lines = head.split("\r\n")
    status = None
    parts = lines[0].split(" ", 2) if lines else []
    if len(parts) >= 2 and parts[0].startswith("HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if _:
            headers[k.strip()] = v.strip()
    return status, headers, body


def iter_warc_records(data: bytes | None) -> Iterator[dict]:
    """Tolerant WARC/1.0 record iterator over a raw (maybe gzipped,
    maybe truncated) byte stream. Yields one dict per COMPLETE record:
    rec_type, target_uri, warc_date, rec_offset, http_status,
    http_headers, body."""
    stream = _sniff_stream(data)
    pos = 0
    n = len(stream)
    rec_idx = 0
    while pos < n:
        # seek the version line (skips inter-record CRLFs)
        start = stream.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = stream.find(b"\r\n\r\n", start)
        if head_end < 0:
            return  # truncated inside the header block → drop
        head = stream[start:head_end].decode("latin-1", errors="ignore")
        whdr: dict[str, str] = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            if _:
                whdr[k.strip().lower()] = v.strip()
        try:
            length = int(whdr.get("content-length", ""))
        except ValueError:
            return  # unparseable record → stop (warcio raises here)
        body_start = head_end + 4
        if body_start + length > n:
            return  # payload cut off by truncation → drop record, stop
        payload = stream[body_start : body_start + length]
        rec_type = whdr.get("warc-type", "")
        status, hh, body = (None, {}, payload)
        if rec_type == "response":
            status, hh, body = _parse_http_payload(payload)
        yield {
            "rec_type": rec_type,
            "target_uri": whdr.get("warc-target-uri"),
            "warc_date": whdr.get("warc-date"),
            "rec_offset": rec_idx,
            "http_status": status,
            "http_headers": hh,
            "body": body,
        }
        rec_idx += 1
        pos = body_start + length


# --------------------------------------------------------------- writing --


def build_warc(records: list[dict], compress: str = "record") -> bytes:
    """Serialize response records to WARC/1.0 bytes (test/fixture writer
    and the shape a WARC sink would emit).

    records: dicts with url, body (bytes), optional status (200),
        content_type ('text/html'), date (ISO8601), rec_type ('response').
    compress: 'record' (one gzip member per record — the Common Crawl
        layout), 'whole' (one gzip stream), or 'none'.
    """
    members: list[bytes] = []
    for r in records:
        body = r["body"]
        status = r.get("status", 200)
        ctype = r.get("content_type", "text/html")
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("latin-1") + body
        whdr = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('rec_type', 'response')}\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r.get('date', '2026-01-01T00:00:00Z')}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("latin-1")
        rec = whdr + http + b"\r\n\r\n"
        members.append(
            gzip.compress(rec, compresslevel=1) if compress == "record" else rec
        )
    out = b"".join(members)
    if compress == "whole":
        out = gzip.compress(out, compresslevel=1)
    return out


# -------------------------------------------------------------- operator --

WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, "
    "warc_source string, warc_offset bigint, mime string, status int, "
    "rec_type string"
)


def parse_warc_bytes(
    segments: DataFrame,
    mode: str = "bulk",
    max_bytes: int | None = None,
    data_col: str = "data",
    source_col: str = "warc_source",
) -> DataFrame:
    """segments(warc_source, data:binary) → pages rows, one mapInPandas stage.

    mode='bulk': every response record, text via the utf-8-always rule
        (reference src/warc_processor.py:252-268);
    mode='targeted': FIRST response record per blob only, text via the
        header-charset rule (reference src/warc/parser.py:43-90).
    max_bytes: slice each blob first — the reference's head-sample fetch
        reads only the first N MB of a WARC (src/warc_processor.py:179-181);
        the truncated record at the cut is dropped, like warcio's
        tolerated "Compressed file ended".
    """
    if mode not in ("bulk", "targeted"):
        raise ValueError(f"unknown mode {mode!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols: dict[str, list] = {
                k.split(" ")[0]: []
                for k in WARC_PAGES_SCHEMA.split(", ")
            }
            for src, blob in zip(pdf[source_col], pdf[data_col]):
                if blob is None:
                    continue
                if max_bytes is not None:
                    blob = blob[:max_bytes]
                for rec in iter_warc_records(blob):
                    if rec["rec_type"] != "response":
                        continue
                    ctype = rec["http_headers"].get("Content-Type", "")
                    if mode == "bulk":
                        text = decode_bulk(rec["body"])
                    else:
                        text = decode_with_headers(rec["body"], ctype)
                    cols["url"].append(rec["target_uri"])
                    cols["warc_ts"].append(
                        pd.to_datetime(rec["warc_date"], utc=True, errors="coerce")
                        .tz_localize(None)
                        if rec["warc_date"]
                        else None
                    )
                    cols["html"].append(rec["body"])
                    cols["text"].append(text)
                    cols["warc_source"].append(src)
                    cols["warc_offset"].append(rec["rec_offset"])
                    cols["mime"].append(ctype or None)
                    cols["status"].append(rec["http_status"])
                    cols["rec_type"].append(rec["rec_type"])
                    if mode == "targeted":
                        break
            pdf_out = pd.DataFrame(cols)
            pdf_out["status"] = pdf_out["status"].astype("Int32")
            pdf_out["warc_offset"] = pdf_out["warc_offset"].astype("Int64")
            yield pdf_out

    return segments.mapInPandas(batches, WARC_PAGES_SCHEMA)


# ----------------------------------------------------- oracle demo query --


def warc_ingest_from_documents(docs: DataFrame) -> DataFrame:
    """End-to-end ingest check over driver testdata: documents → WARC blobs
    (one per ``doc_id % 16`` group, member-gzip, every 5th blob truncated
    mid-final-record) → :func:`parse_warc_bytes` → verification columns.

    Exercises the full write→compress→truncate→read→decode loop against a
    closed-form DuckDB oracle (oracle/sqlgen.sql_warc_ingest): the oracle
    knows the truncated blob's last record is dropped and recomputes each
    row's url / offset / text md5 arithmetically. Bodies of ``doc_id % 3
    == 0`` docs are additionally gzip-compressed at the HTTP layer to
    exercise the gunzip sniff inside the bulk decode rule.
    """
    from pyspark.sql import functions as F

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(key[0])
        pdf = pdf.sort_values("doc_id")
        recs = []
        for doc_id, source, text in zip(pdf["doc_id"], pdf["source"], pdf["text"]):
            body = text.encode("utf-8")
            if doc_id % 3 == 0:
                body = gzip.compress(body, compresslevel=1)
            recs.append(
                {
                    "url": f"https://{source}.example.com/d/{doc_id}",
                    "body": body,
                    "content_type": "text/html; charset=utf-8",
                }
            )
        if g % 5 == 0 and len(recs) > 1:
            blob = build_warc(recs[:-1]) + build_warc([recs[-1]])[:12]
        else:
            blob = build_warc(recs)
        return pd.DataFrame({"warc_source": [f"synth-{g:03d}.warc.gz"], "data": [blob]})

    segments = (
        docs.select("doc_id", "source", "text")
        .groupBy((F.col("doc_id") % 16).alias("g"))
        .applyInPandas(build, "warc_source string, data binary")
    )
    pages = parse_warc_bytes(segments, mode="bulk")
    return pages.select(
        "url",
        "warc_offset",
        "status",
        "mime",
        F.length("text").cast("bigint").alias("n_chars"),
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
    )


# The four Content-Type shapes the targeted decode rule must handle
# (reference src/warc/parser.py:62-77): (header string, python codec used
# to ENCODE the fixture body). Keyed by doc_id % 4.
_TARGETED_CTYPES = [
    ("text/html", "utf-8"),  # no charset= → default utf-8
    # uppercase + trailing parameter → lowered, ';'-split, stripped
    ("text/html; charset=ISO-8859-1; format=flowed", "iso-8859-1"),
    # bytes that would NOT survive a utf-8-always decode
    ("text/html; charset=UTF-16-LE", "utf-16-le"),
    # unknown codec → utf-8 errors='ignore' fallback
    ("text/html; charset=x-unknown-enc", "utf-8"),
]

_TARGETED_PAD = 8192
_TARGETED_SLICE = 4096


def warc_ingest_targeted_from_documents(docs: DataFrame) -> DataFrame:
    """Point-lookup (targeted) ingest check over driver testdata.

    Builds one UNcompressed WARC blob per ``doc_id % 64`` group (records in
    doc_id order) and reads it back with
    ``parse_warc_bytes(mode='targeted', max_bytes=4096)``. Covers the two
    paths :func:`warc_ingest_from_documents` does not:

    - the header-charset decode rule (reference src/warc/parser.py:62-77)
      across the four Content-Type shapes in ``_TARGETED_CTYPES`` — the
      UTF-16-LE case is discriminating: its bytes decoded utf-8-always
      would NUL-interleave and fail the md5 check;
    - the head-sample ``max_bytes`` slice (reference
      src/warc_processor.py:179-181): groups ``g % 3 == 0`` carry a
      padding response record larger than the slice as record 0, so the
      cut lands mid-payload and the blob yields no rows — warcio's
      tolerated early-end behavior.

    Surviving blobs emit exactly their first response record (= the
    group's min doc_id, which is ``g`` itself for a contiguous doc_id
    range); the DuckDB oracle (oracle/sqlgen.sql_warc_ingest_targeted)
    recomputes every column closed-form, all decode paths being the
    identity on the ASCII corpus text.
    """
    from pyspark.sql import functions as F

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(key[0])
        pdf = pdf.sort_values("doc_id")
        recs = []
        if g % 3 == 0:
            recs.append(
                {
                    "url": f"https://pad.example.com/{g}",
                    "body": b"X" * _TARGETED_PAD,
                    "content_type": "text/html",
                }
            )
        for doc_id, source, text in zip(pdf["doc_id"], pdf["source"], pdf["text"]):
            ctype, enc = _TARGETED_CTYPES[doc_id % 4]
            recs.append(
                {
                    "url": f"https://{source}.example.com/d/{doc_id}",
                    "body": text.encode(enc),
                    "content_type": ctype,
                }
            )
        blob = build_warc(recs, compress="none")
        return pd.DataFrame(
            {"warc_source": [f"synth-t-{g:03d}.warc"], "data": [blob]}
        )

    segments = (
        docs.select("doc_id", "source", "text")
        .groupBy((F.col("doc_id") % 64).alias("g"))
        .applyInPandas(build, "warc_source string, data binary")
    )
    pages = parse_warc_bytes(segments, mode="targeted", max_bytes=_TARGETED_SLICE)
    return pages.select(
        "url",
        "warc_offset",
        "status",
        "mime",
        F.length("text").cast("bigint").alias("n_chars"),
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
    )


def warc_outlinks_from_documents(docs: DataFrame) -> DataFrame:
    """The full archive-bytes → frontier-feed path: documents → WARC
    blobs whose HTML bodies carry anchor tags (root-relative + relative
    href per record) → tolerant reader → bulk decode → outlink
    extraction and RFC 3986 resolution (functions/links.py).

    Same grouping/truncation scheme as :func:`warc_ingest_from_documents`
    (one blob per ``doc_id % 16`` group, every 5th blob truncated
    mid-final-record — the cut record's links must NOT appear). The
    DuckDB oracle (oracle/sqlgen.sql_warc_outlinks) recomputes the two
    resolved links per surviving record closed-form.
    """
    from pyspark.sql import functions as F

    from crawler_spark.functions.links import outlinks

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(key[0])
        pdf = pdf.sort_values("doc_id")
        recs = []
        for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
            body = (
                f'<html><body><a href="/g{g}/next">n</a>'
                f"<a href='rel{doc_id}.html'>r</a></body></html>"
            ).encode("utf-8")
            recs.append(
                {
                    "url": f"https://{source}.example.com/d/{doc_id}",
                    "body": body,
                    "content_type": "text/html; charset=utf-8",
                }
            )
        if g % 5 == 0 and len(recs) > 1:
            blob = build_warc(recs[:-1]) + build_warc([recs[-1]])[:12]
        else:
            blob = build_warc(recs)
        return pd.DataFrame(
            {"warc_source": [f"synth-{g:03d}.warc.gz"], "data": [blob]}
        )

    segments = (
        docs.select("doc_id", "source")
        .groupBy((F.col("doc_id") % 16).alias("g"))
        .applyInPandas(build, "warc_source string, data binary")
    )
    pages = parse_warc_bytes(segments, mode="bulk")
    return outlinks(pages.select("url", F.col("text").alias("html")))
