"""Triangle census and Heaps'-law curve tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.linkgraph import triangle_counts
from crawler_spark.operators.termstats import HEAPS_BUCKETS, heaps_curve


def _tri(spark, edges, node_ids):
    e = spark.createDataFrame(edges, ["src", "dst"])
    nodes = spark.createDataFrame([(i,) for i in node_ids], ["node"])
    return {r["node"]: r for r in triangle_counts(e, nodes).collect()}


def test_triangle_single_triangle(spark):
    got = _tri(spark, [(0, 1), (1, 2), (2, 0)], [0, 1, 2])
    for n in (0, 1, 2):
        assert got[n]["n_tri"] == 1 and got[n]["deg"] == 2
        # 2000 * 1 / (2 * 1) = 1000 — a 2-neighborhood that closes
        assert got[n]["clustering_pm"] == 1000


def test_triangle_k4_complete_graph(spark):
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _tri(spark, edges, list(range(4)))
    # K4: each node is in C(3,2) = 3 triangles, deg 3, coefficient 1000
    for n in range(4):
        assert got[n]["n_tri"] == 3
        assert got[n]["clustering_pm"] == 1000


def test_triangle_direction_and_duplicates_ignored(spark):
    # same triangle given with reversed/duplicate directed edges
    got = _tri(spark, [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)], [0, 1, 2])
    assert all(got[n]["n_tri"] == 1 for n in (0, 1, 2))


def test_triangle_open_wedge_counts_zero(spark):
    got = _tri(spark, [(0, 1), (1, 2)], [0, 1, 2, 7])
    assert all(got[n]["n_tri"] == 0 for n in (0, 1, 2))
    assert got[1]["deg"] == 2 and got[1]["clustering_pm"] == 0
    assert got[7]["deg"] == 0  # isolated node present with zeros


def _curve(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    return heaps_curve(docs, len(texts)).orderBy("bucket").collect()


def test_heaps_cumulative_identities(spark):
    texts = [f"common w{i} w{i % 7}" for i in range(40)]
    rows = _curve(spark, texts)
    assert rows[-1]["cum_tokens"] == sum(len(t.split()) for t in texts)
    vocab = len({w for t in texts for w in t.split()})
    assert rows[-1]["cum_vocab"] == vocab
    cum_v = [r["cum_vocab"] for r in rows]
    assert cum_v == sorted(cum_v)  # vocabulary only grows


def test_heaps_new_words_land_in_first_bucket_only(spark):
    # every doc repeats the same two words -> all types are new in
    # bucket 0, zero afterwards
    rows = _curve(spark, ["aa bb"] * (HEAPS_BUCKETS * 2))
    assert rows[0]["new_words"] == 2
    assert all(r["new_words"] == 0 for r in rows[1:])


def test_heaps_bucket_count_bounded(spark):
    rows = _curve(spark, [f"x{i}" for i in range(100)])
    assert len(rows) <= HEAPS_BUCKETS
