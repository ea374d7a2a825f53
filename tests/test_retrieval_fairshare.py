"""BM25 retrieval, priority sampling, and fair-budget water-filling —
each checked against an independent pure-Python re-derivation of its
exact-integer semantics (the DuckDB twin is the cross-engine check;
these pin the math itself)."""

from __future__ import annotations

import hashlib

import pytest

from crawler_spark.operators.fairshare import fair_budget
from crawler_spark.operators.retrieval import bm25_topk
from crawler_spark.operators.sampling import _PRI_SCALE, priority_sample

DOCS = [
    (0, "join join vector table scan"),
    (1, "vector vector vector join"),
    (2, "spark join spark"),
    (3, "table scan merge batch row"),
    (4, "join"),
    (5, "spark vector join join join spark spark spark"),
]


def _py_bm25(docs, query, k):
    toks = {d: [t for t in txt.split(" ") if t] for d, txt in docs}
    dl = {d: len(ts) for d, ts in toks.items() if ts}
    sumdl, n = sum(dl.values()), len(dl)
    tf = {
        (d, q): ts.count(q)
        for d, ts in toks.items()
        for q in query
        if q in ts
    }
    df = {q: sum(1 for (d2, q2) in tf if q2 == q) for q in query}
    score: dict = {}
    for (d, q), f in tf.items():
        r_pm = dl[d] * 1000 * n // sumdl
        tfp = 22000000 * f // (10000 * f + 3000 + 9 * r_pm)
        idf = 1000 * (n - df[q] + 1) // (df[q] + 1)
        score[d] = score.get(d, 0) + idf * tfp
    ranked = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {d: s for d, s in ranked}


@pytest.mark.spark
def test_bm25_matches_python_reference(spark):
    sdf = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["terms_matched"], r["score_pm"])
        for r in bm25_topk(sdf, ("join", "vector", "spark"), k=4).collect()
    }
    want = _py_bm25(DOCS, ("join", "vector", "spark"), 4)
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d][1] == s
    # doc 5 has all three query terms and the heaviest tf mass
    assert got[5][0] == 3
    assert max(want, key=lambda d: want[d]) == 5


@pytest.mark.spark
def test_bm25_rare_term_outscores_common(spark):
    # one doc with ONLY the rare term vs one doc with only a stopword
    docs = [(i, "common word filler") for i in range(20)]
    docs += [(100, "rareterm"), (101, "common common common")]
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = bm25_topk(sdf, ("rareterm", "common"), k=2).collect()
    assert rows[0]["doc_id"] == 100  # idf dominates saturated tf


def _py_priorities(rows, seed="ps1"):
    out = []
    for doc_id, w in rows:
        h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
        u = int(h[:6], 16) + 1
        out.append((doc_id, w, w * _PRI_SCALE // u))
    return out


@pytest.mark.spark
def test_priority_sample_matches_python_reference(spark):
    rows = [(i, 50 + (i * 37) % 200) for i in range(40)]
    sdf = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    got = {
        r["doc_id"]: (r["weight"], r["priority_pm"], r["est_w_pm"])
        for r in priority_sample(sdf, k=8).collect()
    }
    pri = sorted(_py_priorities(rows), key=lambda t: (-t[2], t[0]))
    tau = pri[8][2]  # (k+1)-th priority
    want = {d: (w, p, max(w * 1000, tau)) for d, w, p in pri[:8]}
    assert got == want


@pytest.mark.spark
def test_priority_sample_population_smaller_than_k(spark):
    rows = [(1, 10), (2, 20), (3, 30)]
    sdf = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    got = {r["doc_id"]: r for r in priority_sample(sdf, k=10).collect()}
    assert len(got) == 3  # everything sampled, τ = 0, estimates exact
    for d, w in rows:
        assert got[d]["est_w_pm"] == w * 1000


def _py_waterfill(demands: dict[str, int], budget: int):
    total = sum(demands.values())
    if total <= budget:
        return dict(demands), max(demands.values())
    theta = 0
    while sum(min(d, theta + 1) for d in demands.values()) <= budget:
        theta += 1
    spent = sum(min(d, theta) for d in demands.values())
    grants = {h: min(d, theta) for h, d in demands.items()}
    for h in sorted(h for h, d in demands.items() if d > theta)[
        : budget - spent
    ]:
        grants[h] += 1
    return grants, theta


@pytest.mark.spark
@pytest.mark.parametrize("budget", [3, 17, 30, 100, 10_000])
def test_fair_budget_matches_python_waterfill(spark, budget):
    demands = {f"h{i:02d}": 1 + (i * 7) % 23 for i in range(12)}
    sdf = spark.createDataFrame(
        list(demands.items()), ["host", "demand"]
    )
    rows = fair_budget(sdf, budget=budget).collect()
    want, theta = _py_waterfill(demands, budget)
    got = {r["host"]: r["granted"] for r in rows}
    assert got == want
    assert sum(got.values()) == min(budget, sum(demands.values()))
    assert all(r["water_level"] == theta for r in rows)
    # max-min property: a host below its demand is never out-granted
    # by more than the remainder +1
    capped = [r["granted"] for r in rows if r["granted"] < r["demand"]]
    if capped:
        assert max(capped) - min(capped) <= 1
