"""Seeded-random differential tests for the round-4 operators.

Unlike the DuckDB twins (which share constants with the Spark plans by
construction), the oracles here are INDEPENDENT pure-Python
re-implementations — a drifted formula on either side fails loudly.
Randomness is seeded so failures reproduce.
"""

from __future__ import annotations

import hashlib
import random

from crawler_spark.operators.cdc import CDC_DIV, cdc_chunks
from crawler_spark.operators.linkgraph import triangle_counts
from crawler_spark.operators.mixing import lang_temperature_allocation
from crawler_spark.operators.winnowing import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
)


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ------------------------------------------------------------- triangles --


def test_triangles_match_bruteforce_on_random_graphs(spark):
    """15 random digraphs (disjoint id ranges) in one edge list; exact
    per-node triangle counts recomputed by O(n^3) enumeration."""
    rng = random.Random(42)
    edges, nodes, expected = [], [], {}
    for g in range(15):
        base = g * 100
        n = rng.randint(3, 12)
        ids = [base + i for i in range(n)]
        nodes.extend(ids)
        und = set()
        for a in ids:
            for b in ids:
                if a != b and rng.random() < 0.35:
                    edges.append((a, b))
                    und.add((min(a, b), max(a, b)))
        for v in ids:
            nbr = [
                u
                for u in ids
                if u != v and (min(u, v), max(u, v)) in und
            ]
            t = sum(
                1
                for i in range(len(nbr))
                for j in range(i + 1, len(nbr))
                if (min(nbr[i], nbr[j]), max(nbr[i], nbr[j])) in und
            )
            expected[v] = t
    e = spark.createDataFrame(edges, ["src", "dst"])
    nd = spark.createDataFrame([(i,) for i in nodes], ["node"])
    got = {r["node"]: r["n_tri"] for r in triangle_counts(e, nd).collect()}
    assert got == expected


# ------------------------------------------------------------------- cdc --


def _cdc_py(words: list[str], div: int) -> list[list[str]]:
    chunks, cur = [], []
    for w in words:
        cur.append(w)
        if _h64(w) % div == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return chunks


def test_cdc_matches_pure_python_on_random_docs(spark):
    rng = random.Random(7)
    docs = []
    for i in range(30):
        n = rng.randint(1, 120)
        docs.append((i, " ".join(f"w{rng.randint(0, 50)}" for _ in range(n))))
    out = cdc_chunks(spark.createDataFrame(docs, ["doc_id", "text"]))
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_words"], r["chunk_hash"])
        for r in out.collect()
    }
    want = {}
    for doc_id, text in docs:
        for idx, chunk in enumerate(_cdc_py(text.split(" "), CDC_DIV)):
            want[(doc_id, idx)] = (len(chunk), _h64(" ".join(chunk)))
    assert got == want


# ------------------------------------------------------------- winnowing --


def _winnow_py(words: list[str], k: int, w: int) -> set[tuple[int, int]]:
    grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    hs = [_h64(g) for g in grams]
    sel = set()
    for s in range(max(1, len(hs) - w + 1)):
        sub = hs[s : s + w]
        m = min(sub)
        j = max(i for i, h in enumerate(sub) if h == m)
        sel.add((s + j + 1, hs[s + j]))  # 1-based pos
    return sel


def test_winnowing_matches_pure_python_on_random_docs(spark):
    rng = random.Random(99)
    docs = []
    for i in range(25):
        n = rng.randint(WINNOW_K, 150)
        docs.append((i, " ".join(f"t{rng.randint(0, 30)}" for _ in range(n))))
    out = winnow_fingerprints(spark.createDataFrame(docs, ["doc_id", "text"]))
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for doc_id, text in docs:
        assert got[doc_id] == _winnow_py(text.split(" "), WINNOW_K, WINNOW_W)


# ------------------------------------------------------------ temperature --


def _hamilton_py(counts: dict[str, int], budget: int) -> dict[str, int]:
    import math

    w = {k: math.isqrt(v) for k, v in counts.items()}
    tw = sum(w.values())
    base = {k: budget * v // tw for k, v in w.items()}
    rem = {k: (budget * v) % tw for k, v in w.items()}
    leftover = budget - sum(base.values())
    order = sorted(counts, key=lambda k: (-rem[k], k))
    for k in order[:leftover]:
        base[k] += 1
    return base


def test_temperature_matches_pure_python_hamilton(spark):
    rng = random.Random(5)
    for trial in range(5):
        n_langs = rng.randint(2, 9)
        counts = {f"l{j}": rng.randint(1, 5000) for j in range(n_langs)}
        budget = rng.choice([97, 1000, 10007])
        rows = [(k, i) for k, v in counts.items() for i in range(v)]
        docs = spark.createDataFrame(rows, ["lang", "doc_id"])
        got = {
            r["lang"]: r["budget_docs"]
            for r in lang_temperature_allocation(docs, budget=budget).collect()
        }
        assert got == _hamilton_py(counts, budget), (trial, counts, budget)
