"""Duplicated-span removal (operators/spandedup.py).

Reference oracle: an independent imperative Python implementation of
the same documented semantics (keep the globally-first occurrence of
every duplicated K-window, remove words covered by the rest).
"""

from __future__ import annotations

import hashlib

from crawler_spark.operators.spandedup import (
    SPAN_NGRAM,
    remove_duplicated_spans,
)

K = 4  # small window so fixtures stay readable


def _py_remove(docs: dict[int, str], k: int = K) -> dict[int, tuple]:
    occ = []  # (doc, pos, gram)
    for d in sorted(docs):
        w = docs[d].split(" ")
        for i in range(len(w) - k + 1):
            occ.append((d, i, " ".join(w[i : i + k])))
    by_gram: dict[str, list] = {}
    for d, i, g in occ:
        by_gram.setdefault(g, []).append((d, i))
    covered: dict[int, set] = {d: set() for d in docs}
    for g, locs in by_gram.items():
        if len(locs) < 2:
            continue
        keep = min(locs)
        for d, i in locs:
            if (d, i) != keep:
                covered[d].update(range(i, i + k))
    out = {}
    for d in docs:
        w = docs[d].split(" ")
        kept = [x for j, x in enumerate(w) if j not in covered[d]]
        clean = " ".join(kept)
        pm = len(covered[d]) * 1000 // len(w)
        out[d] = (
            len(w),
            len(covered[d]),
            pm,
            hashlib.md5(clean.encode()).hexdigest(),
        )
    return out


SHARED = "alpha beta gamma delta"  # one full K-window, shared everywhere
DOCS = {
    # doc 1 holds the canonical (first) occurrence of SHARED
    1: f"{SHARED} unique one text tail",
    # doc 2 repeats SHARED — its copy must be removed
    2: f"lead in {SHARED} and more words",
    # doc 3: within-doc repeat — second copy removed, first kept
    # (it is NOT the global first, so it is removed too)
    3: f"{SHARED} middle bit {SHARED}",
    # doc 4: no duplicated window at all
    4: "totally fresh words never repeated anywhere at all",
    # doc 5: fully duplicated against doc 4? no — unique short doc,
    # shorter than K has no windows and survives untouched
    5: "tiny doc",
}


def test_matches_python_oracle(spark):
    df = spark.createDataFrame(
        [(d, t) for d, t in DOCS.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_removed"],
            r["dup_span_pm"],
            r["clean_md5"],
        )
        for r in remove_duplicated_spans(df, k=K).collect()
    }
    exp = _py_remove(DOCS)
    assert got == exp
    # pin the semantics by hand, independent of both implementations:
    # doc 1 keeps everything (canonical copy of SHARED lives here)
    assert got[1][1] == 0
    # doc 2 loses exactly the 4 SHARED words
    assert got[2][1] == 4
    # doc 3: global-first is doc 1, so BOTH copies here are removed
    assert got[3][1] == 8
    assert got[4][1] == 0 and got[5][1] == 0


def test_full_duplicate_doc_empties(spark):
    docs = {1: "a b c d e f", 2: "a b c d e f"}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in remove_duplicated_spans(df, k=K).collect()}
    assert got[1]["n_removed"] == 0  # canonical survives verbatim
    assert got[2]["n_removed"] == 6  # overlapping windows cover all words
    assert got[2]["clean_md5"] == hashlib.md5(b"").hexdigest()
    assert got[2]["dup_span_pm"] == 1000


def test_huge_doc_ids_canonical_selection(spark):
    """The struct occurrence key survives doc ids (or word positions)
    where the old packed ``doc_id * 10^6 + pos`` long overflowed int64
    and silently inverted canonical-copy selection."""
    big = 10**13  # big * 10^6 > 2^63 — the packed key would wrap negative
    docs = {big: f"{SHARED} first home", big + 1: f"pad pad {SHARED} tail"}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r["doc_id"]: r["n_removed"] for r in remove_duplicated_spans(df, k=K).collect()}
    assert got == {big: 0, big + 1: 4}  # lowest (doc_id, pos) keeps


def test_default_window_and_pure_jvm_plan(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(SPAN_NGRAM + 2)))],
        "doc_id long, text string",
    )
    res = remove_duplicated_spans(df)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python UDF anywhere
    assert res.collect()[0]["n_removed"] == 0


# ---------------------------------------------------------------------------
# simhash_neardup_pairs (operators/textdedup.py) — multi-block Hamming search


def test_simhash_neardups_matches_bruteforce(spark):
    from crawler_spark.operators.textdedup import (
        SIMHASH_BITS,
        simhash,
        simhash_neardup_pairs,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),   # identical -> hamming 0
        (3, "alpha beta gamma delta zeta"),      # one token swapped
        (4, "totally different words entirely here"),
        (5, "unrelated content again something else"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k, nb = 3, 4
    width = SIMHASH_BITS // nb
    mask = (1 << width) - 1

    fps = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    expected = set()
    for a in fps:
        for b in fps:
            if a < b:
                ham = bin(fps[a] ^ fps[b]).count("1")
                shares = any(
                    (fps[a] >> (i * width)) & mask == (fps[b] >> (i * width)) & mask
                    for i in range(nb)
                )
                if ham <= k and shares:
                    expected.add((a, b, ham))

    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_neardup_pairs(df, k=k).collect()
    }
    assert got == expected
    assert (1, 2, 0) in got  # identical docs always pair at distance 0


def test_simhash_hot_block_cap_prunes(spark):
    from crawler_spark.operators.textdedup import simhash_neardup_pairs

    # many identical docs: every block value is shared by all of them —
    # a cap below the group size suppresses ALL candidate generation
    rows = [(i, "same words every time") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert simhash_neardup_pairs(df).count() == 45  # 10 choose 2
    assert simhash_neardup_pairs(df, max_block_docs=5).count() == 0
