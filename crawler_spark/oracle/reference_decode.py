"""Row-at-a-time oracle for the reference's byte→text decode rules.

The byte-identical-text invariant of the rebuild lives here: `pages.text`
must equal, byte for byte, what the reference would have produced from the
same raw bytes. The reference has TWO distinct decode rules:

1. header-charset decode (EP1 targeted path, /root/reference/src/warc/parser.py:62-77):
   charset taken from the Content-Type header (`charset=` token, first
   `;`-terminated, stripped), default utf-8, decoded with errors='ignore';
   on ANY failure (unknown codec etc.) fall back to utf-8 errors='ignore'.

2. utf-8-always decode (EP2 bulk + EP3 survey paths,
   /root/reference/src/warc_processor.py:260-264;
   /root/reference/examples/bulk_warc_search.py:102-106):
   content.decode('utf-8', errors='ignore'), unconditionally.

Both are preceded by a gzip sniff (/root/reference/src/warc/parser.py:29-40):
try gunzip, on BadGzipFile/OSError treat the bytes as plain. The bulk path
additionally tolerates a truncated gzip tail ("Compressed file ended" is
expected when sampling the first N MB of a WARC,
/root/reference/src/warc_processor.py:273-279) — we reproduce that as
"decompress as much as is available, keep the partial output".
"""

from __future__ import annotations

import zlib

GZIP_MAGIC = b"\x1f\x8b"


def gunzip_sniff(raw: bytes | None) -> bytes:
    """Gzip sniff + tolerant decompress.

    Mirrors gzip.GzipFile(...).read(1)-then-rewind sniffing
    (reference src/warc/parser.py:29-40): if the bytes do not parse as
    gzip at all, return them unchanged. A stream that starts as valid
    gzip but ends early yields its decompressed prefix (the tolerated
    truncated-tail path, reference src/warc_processor.py:273-279).
    """
    if not raw:
        return b""
    if not raw.startswith(GZIP_MAGIC):
        return raw
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    try:
        out = d.decompress(raw)
        out += d.flush()
        return out
    except zlib.error:
        # Header looked like gzip but the body is corrupt → reference's
        # BadGzipFile path falls back to the raw bytes.
        return raw


def _charset_from_content_type(content_type: str | None) -> str:
    """Reference's exact charset extraction (src/warc/parser.py:64-71)."""
    encoding = "utf-8"
    if content_type and "charset=" in content_type.lower():
        try:
            encoding = content_type.lower().split("charset=")[1].split(";")[0].strip()
        except Exception:
            pass
    return encoding


def decode_with_headers(raw: bytes | None, content_type: str | None) -> str:
    """Rule 1: header-charset decode with utf-8-ignore fallback."""
    data = gunzip_sniff(raw)
    encoding = _charset_from_content_type(content_type)
    try:
        return data.decode(encoding, errors="ignore")
    except Exception:
        return data.decode("utf-8", errors="ignore")


def decode_bulk(raw: bytes | None) -> str:
    """Rule 2: unconditional utf-8, errors='ignore'."""
    data = gunzip_sniff(raw)
    return data.decode("utf-8", errors="ignore")
