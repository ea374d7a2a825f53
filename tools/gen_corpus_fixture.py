"""Derive the expected `corpus_classify` histogram WITHOUT Spark.

Re-runs the whole EP2 pipeline row-at-a-time through the pure-Python
reference oracles (oracle/reference_decode + oracle/reference_detector)
over the deterministic generator batch (sources/corpus._pages_batch is
partition-independent, so one numpy batch == the distributed corpus).

The resulting (confidence, n) rows are the independent ground truth that
`oracle/sqlgen.sql_corpus_classify()` hardcodes as a VALUES fixture;
tests/test_corpus.py::test_corpus_classify_fixture re-derives them on
every run so the constant cannot drift from the generator or detector.

Usage: python tools/gen_corpus_fixture.py [n_pages]
"""

from __future__ import annotations

import sys
from collections import Counter

import numpy as np

sys.path.insert(0, ".")


def expected_histogram(n_pages: int = 4_000) -> dict[str, int]:
    from crawler_spark.oracle.reference_detector import detect
    from crawler_spark.patterns import CONFIDENCE_ORDER
    from crawler_spark.sources.corpus import _pages_batch

    num_warcs = max(4, n_pages // 2_000)  # generate_pages default
    pdf = _pages_batch(np.arange(n_pages, dtype=np.int64), num_warcs)

    # classify_bulk(min_confidence='medium', dedupe='per_warc'), reference-style:
    first_wins: dict[tuple[str, str], tuple[int, str]] = {}
    for row in pdf.itertuples(index=False):
        if row.rec_type != "response":
            continue
        if "html" not in row.text[:1000].lower():
            continue
        d = detect(row.text, row.url)
        if not d["is_nextjs"]:
            continue
        if CONFIDENCE_ORDER.get(d["confidence"], 0) < CONFIDENCE_ORDER["medium"]:
            continue
        key = (row.warc_source, row.url)
        prev = first_wins.get(key)
        if prev is None or row.warc_offset < prev[0]:
            first_wins[key] = (row.warc_offset, d["confidence"])
    return dict(Counter(conf for _, conf in first_wins.values()))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000
    hist = expected_histogram(n)
    print({k: hist[k] for k in sorted(hist)})
