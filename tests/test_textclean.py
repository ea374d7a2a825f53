"""Corpus-level text cleaning (operators/textclean.py).

Reference oracle: pure-Python recomputation of segmentation,
boilerplate-line frequency, and repetition stats over the same rows —
independent of the Spark implementation.
"""

from __future__ import annotations

import math

from crawler_spark.operators.textclean import (
    BOILERPLATE_MIN_DOCS,
    remove_boilerplate,
    repetition_stats,
)

BP = "cookie banner accept all"
FOOT = "copyright example corp all rights reserved"


def _segments(text: str, k: int) -> list[str]:
    w = text.split(" ")
    return [" ".join(w[i * k : i * k + k]) for i in range(math.ceil(len(w) / k))]


def _py_remove(rows, k, min_docs):
    lines = {i: _segments(t, k) for i, t in rows}
    freq: dict[str, set[int]] = {}
    for i, segs in lines.items():
        for s in set(segs):
            freq.setdefault(s, set()).add(i)
    hot = {s for s, docs in freq.items() if len(docs) >= min_docs}
    out = {}
    for i, segs in lines.items():
        kept = [s for s in segs if s not in hot]
        out[i] = (" ".join(kept), len(segs), len(segs) - len(kept))
    return out


def _newline_docs():
    # 3+ docs share BP and FOOT lines; doc 4 is entirely boilerplate;
    # doc 5 shares nothing.
    return [
        (1, f"{BP}\nunique one alpha\n{FOOT}"),
        (2, f"{BP}\nunique two beta gamma\n{FOOT}"),
        (3, f"{BP}\nunique three delta\n{FOOT}\nunique three tail"),
        (4, f"{BP}\n{FOOT}"),
        (5, "entirely unique document five"),
    ]


def test_remove_boilerplate_newline_mode(spark):
    rows = _newline_docs()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate(df).collect()
    }
    assert len(got) == 5
    # shared lines stripped, unique lines kept in order
    assert got[1] == ("unique one alpha", 3, 2)
    assert got[3] == ("unique three delta\nunique three tail", 4, 2)
    # fully-boilerplate doc survives with empty clean_text
    assert got[4] == ("", 2, 2)
    # untouched doc
    assert got[5] == ("entirely unique document five", 1, 0)


def test_remove_boilerplate_below_threshold_kept(spark):
    # a line shared by only min_docs-1 documents must NOT be stripped
    shared = "shared but rare line"
    rows = [(i, f"{shared}\nuniq {i}") for i in range(BOILERPLATE_MIN_DOCS - 1)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_removed"] for r in remove_boilerplate(df).collect()}
    assert all(v == 0 for v in got.values())


def test_remove_boilerplate_segment_mode_matches_python(spark):
    # k = SEGMENT_WORDS = 10; build word streams where one exact 10-word
    # window recurs across 3 docs at segment-aligned positions, plus a
    # short (non-multiple-of-10) tail.
    from crawler_spark.operators.textclean import SEGMENT_WORDS as k

    hot = " ".join(f"nav{i}" for i in range(k))
    rows = [
        (1, hot + " " + " ".join(f"a{i}" for i in range(k)) + " tail one"),
        (2, hot + " " + " ".join(f"b{i}" for i in range(k))),
        (3, hot + " short tail"),
        (4, " ".join(f"c{i}" for i in range(k + 3))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate(df, min_docs=3, segments=True).collect()
    }
    exp = _py_remove(rows, k, 3)
    assert got == exp
    assert got[1][2] == 1  # hot nav segment stripped from every doc
    assert got[3] == ("short tail", 2, 1)


def test_repetition_stats_gates(spark):
    rep_line = "spam spam spam repeated line"
    rows = [
        # 4 identical lines of 5 words -> dup_line_pm = 750, repetitive
        (1, "\n".join([rep_line] * 4)),
        # all-distinct lines and 11 distinct 2-grams (top share 90pm)
        # -> not repetitive
        (2, "alpha beta gamma delta\nepsilon zeta eta theta\niota kappa lambda mu"),
        # one line, single dominant 2-gram: 'go go go go go' ->
        # 2-grams all 'go go' (4/4) -> top_2gram_pm = 1000
        (3, "go go go go go"),
        # single word -> no 2-grams at all
        (4, "solitary"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"],
            r["dup_line_pm"],
            r["top_2gram_pm"],
            r["is_repetitive"],
        )
        for r in repetition_stats(df).collect()
    }
    # 2-grams run over the raw space-split word stream, so "line\nspam"
    # is one merged token that also swallows the next line's leading
    # 'spam': 17 tokens, 16 grams, top ('spam spam') = 5 -> 312.
    assert got[1] == (4, 750, 312, True)
    assert got[2][1] == 0 and got[2][3] is False
    assert got[3] == (1, 0, 1000, True)
    assert got[4] == (1, 0, 0, False)
