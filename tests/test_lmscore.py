"""Corpus-LM familiarity scoring vs a row-at-a-time Python twin."""

from __future__ import annotations

from collections import Counter

from crawler_spark.operators.lmscore import (
    LM_COUNT_CAP,
    LM_HEAD_MIN,
    LM_TAIL_MAX,
    lm_familiarity,
)


def _py_familiarity(rows):
    model: Counter = Counter()
    per_doc = {}
    for doc_id, text in rows:
        w = text.split(" ")
        if len(w) < 2:
            continue
        bgs = [f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1)]
        per_doc[doc_id] = bgs
        model.update(bgs)
    out = {}
    for doc_id, bgs in per_doc.items():
        raw = sum(min(model[b], LM_COUNT_CAP) for b in bgs)
        fam = raw // len(bgs)
        bucket = (
            "head" if fam >= LM_HEAD_MIN
            else "tail" if fam <= LM_TAIL_MAX
            else "middle"
        )
        out[doc_id] = (len(bgs), fam, bucket)
    return out


def test_lm_familiarity_matches_python_twin(spark):
    common = "the quick brown fox jumps over the lazy dog"
    rows = (
        [(i, common) for i in range(50)]  # familiar head
        + [(100 + i, f"zx{i}q glarb{i} wibble{i} flurp{i}") for i in range(5)]  # garbled tail
        + [(200, common + " unique tail phrase here")]
        + [(201, "single")]  # < 2 words: absent from output
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["familiarity"], r["bucket"])
        for r in lm_familiarity(df).collect()
    }
    assert got == _py_familiarity(rows)
    assert 201 not in got
    # the repeated doc is maximally familiar, the garbled ones minimal
    assert got[0][2] == "head"
    assert all(got[100 + i][1] == 1 for i in range(5))


def test_lm_cap_bounds_single_bigram_votes(spark):
    # one bigram repeated far past the cap must not score above it
    text = " ".join(["spam"] * (LM_COUNT_CAP * 2))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = lm_familiarity(df).collect()[0]
    assert r["familiarity"] == LM_COUNT_CAP
