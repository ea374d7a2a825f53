"""Pure-Python, row-at-a-time re-execution of the reference pipeline logic.

This package is the correctness oracle: it follows the reference's control
flow statement-for-statement (same regexes, same scoring, same decode
rules), so the distributed Spark path can be compared against it row by
row. It is NOT used in the Spark hot path.
"""

from crawler_spark.oracle.reference_detector import detect, no_detection
from crawler_spark.oracle.reference_decode import (
    decode_bulk,
    decode_with_headers,
    gunzip_sniff,
)

__all__ = [
    "detect",
    "no_detection",
    "decode_bulk",
    "decode_with_headers",
    "gunzip_sniff",
]
