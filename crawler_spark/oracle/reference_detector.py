"""Row-at-a-time oracle for the Next.js detector.

Statement-level translation of the reference's ``NextJsDetector.detect``
(/root/reference/src/detectors/nextjs.py:60-149): same pattern bank, same
evaluation order, same scoring truth table (:125-131). Deviations:

- ``indicators`` is returned sorted (the reference does ``list(set(...))``
  at :136, whose order is hash-nondeterministic; SURVEY §5 fixes the
  comparison contract to sorted indicator sets).
- meta-tag extraction uses the stdlib scanner (see functions/_html_meta.py)
  instead of BeautifulSoup, which is not in this runtime.
"""

from __future__ import annotations

from typing import Any

from crawler_spark import patterns as P
from crawler_spark.functions._html_meta import extract_meta_tags


def no_detection(url: str = "") -> dict[str, Any]:
    """Negative result (reference src/detectors/nextjs.py:195-205)."""
    return {
        "is_nextjs": False,
        "confidence": None,
        "indicators": [],
        "build_id": None,
        "version": None,
        "meta_tags": {},
        "url": url,
    }


def detect(html: str | None, url: str = "") -> dict[str, Any]:
    """Detect Next.js usage in one HTML document."""
    if not html:
        return no_detection(url)

    indicators: list[str] = []
    scores: list[int] = []

    for rx in P.HIGH_REGEX:
        if rx.search(html):
            indicators.append(rx.pattern)
            scores.append(P.SCORE_HIGH)
    for rx in P.MEDIUM_REGEX:
        if rx.search(html):
            indicators.append(rx.pattern)
            scores.append(P.SCORE_MEDIUM)
    for rx in P.LOW_REGEX:
        if rx.search(html):
            indicators.append(rx.pattern)
            scores.append(P.SCORE_LOW)

    m = P.BUILD_ID_REGEX.search(html)
    build_id = m.group(1) if m else None
    if build_id:
        indicators.append(f"build_id:{build_id}")
        scores.append(P.SCORE_BUILD_ID)

    m = P.VERSION_REGEX.search(html)
    version = m.group(1) if m else None

    meta_tags = extract_meta_tags(html)
    if meta_tags:
        indicators.append("nextjs_meta_tags")
        scores.append(P.SCORE_META_TAGS)

    is_nextjs = len(indicators) > 0
    confidence = P.confidence_from_scores(scores) if is_nextjs else None

    return {
        "is_nextjs": is_nextjs,
        "confidence": confidence,
        "indicators": sorted(set(indicators)),
        "build_id": build_id,
        "version": version,
        "meta_tags": meta_tags,
        "url": url,
    }
