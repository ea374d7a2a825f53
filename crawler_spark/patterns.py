"""Detection pattern bank + scoring constants.

Single source of truth for the Next.js classifier semantics. The pattern
strings and tier scores reproduce the reference's detector
(/root/reference/src/detectors/nextjs.py:22-58; scoring thresholds :125-131)
— they are *semantic constants* (regex strings), re-declared here so both
the row-at-a-time oracle (crawler_spark.oracle) and the vectorized Spark
path (crawler_spark.functions.detector) share one definition.

Users of the reference could append to the class-level pattern lists
(reference QUICKSTART.md:218-225); we keep the bank as plain module-level
lists for the same extensibility.
"""

from __future__ import annotations

import re

# Tier score 3 — any single match ⇒ confidence 'high'
# (reference src/detectors/nextjs.py:22-30)
HIGH_CONFIDENCE_PATTERNS: list[str] = [
    r"__NEXT_DATA__",
    r'"__NEXT_LOADED_PAGES__"',
    r"self\.__next",
    r"window\.__NEXT_DATA__",
    r'<div id="__next"',
    r'id="__NEXT_DATA__"',
    r'"buildId"',
]

# Tier score 2 (reference src/detectors/nextjs.py:32-42)
MEDIUM_CONFIDENCE_PATTERNS: list[str] = [
    r"/_next/static/",
    r"/_next/data/",
    r"/_next/image",
    r"next-route-announcer",
    r"__next-error-boundary",
    r"data-nextjs-scroll-focus-boundary",
    r"/_next/webpack",
    r"__BUILD_MANIFEST",
    r"__NEXT_P",
]

# Tier score 1 (reference src/detectors/nextjs.py:44-48)
LOW_CONFIDENCE_PATTERNS: list[str] = [
    r"/_next/",
    r"next\.js",
    r"nextjs",
]

# Case-SENSITIVE, unlike the bank (reference src/detectors/nextjs.py:50,57)
BUILD_ID_PATTERN = r"/_next/static/([a-zA-Z0-9_-]+)/"
# Case-SENSITIVE (compiled without flags in the reference, :58)
VERSION_PATTERN = r"Next\.js\s+v?(\d+\.\d+\.\d+)"

# Meta-tag name substrings the reference looks for inside <meta name=/property=
# (reference src/detectors/nextjs.py:168-172)
META_NAME_SUBSTRINGS: list[str] = ["next-head-count", "next-font", "__next"]

# Scores per tier (reference src/detectors/nextjs.py:89,95,101,107,116)
SCORE_HIGH = 3
SCORE_MEDIUM = 2
SCORE_LOW = 1
SCORE_BUILD_ID = 3
SCORE_META_TAGS = 2

# Confidence rank map used by threshold filters
# (reference src/detectors/nextjs.py:239; main.py:68-74)
CONFIDENCE_ORDER: dict[str, int] = {"low": 1, "medium": 2, "high": 3}

# Pre-compiled banks (compile once per process, as the reference does once
# per detector instance: src/detectors/nextjs.py:53-58).
HIGH_REGEX = [re.compile(p, re.IGNORECASE) for p in HIGH_CONFIDENCE_PATTERNS]
MEDIUM_REGEX = [re.compile(p, re.IGNORECASE) for p in MEDIUM_CONFIDENCE_PATTERNS]
LOW_REGEX = [re.compile(p, re.IGNORECASE) for p in LOW_CONFIDENCE_PATTERNS]
BUILD_ID_REGEX = re.compile(BUILD_ID_PATTERN)
VERSION_REGEX = re.compile(VERSION_PATTERN)


def confidence_from_scores(scores: list[int]) -> str | None:
    """Reference scoring truth table (src/detectors/nextjs.py:122-131).

    max>=3 or sum>=5 → high; max>=2 or sum>=3 → medium; any → low;
    none → None.
    """
    if not scores:
        return None
    mx, sm = max(scores), sum(scores)
    if mx >= 3 or sm >= 5:
        return "high"
    if mx >= 2 or sm >= 3:
        return "medium"
    return "low"
