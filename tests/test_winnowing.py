"""Winnowing fingerprint tests — the SIGMOD 2003 guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.winnowing import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
)


def _fps(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    return winnow_fingerprints(df)


def test_winnowing_detection_guarantee(spark):
    """Any shared word run of length >= w + k - 1 must contribute at
    least one fingerprint common to both documents."""
    shared = " ".join(f"s{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    a = " ".join(f"a{i}" for i in range(20)) + " " + shared
    b = shared + " " + " ".join(f"b{i}" for i in range(20))
    out = _fps(spark, [a, b])
    common = (
        out.where("doc_id = 0").select("fp")
        .intersect(out.where("doc_id = 1").select("fp"))
    )
    assert common.count() >= 1


def test_winnowing_disjoint_docs_share_nothing(spark):
    a = " ".join(f"a{i}" for i in range(30))
    b = " ".join(f"b{i}" for i in range(30))
    out = _fps(spark, [a, b])
    assert out.where(F.col("shared")).count() == 0
    assert out.where(F.col("n_docs") != 1).count() == 0


def test_winnowing_density_below_full_kgram_set(spark):
    """Winnowing selects ~2/(w+1) of k-grams — far fewer than all."""
    text = " ".join(f"w{i}" for i in range(200))
    n_kgrams = 200 - WINNOW_K + 1
    n_sel = _fps(spark, [text]).count()
    assert 0 < n_sel < n_kgrams / 2


def test_winnowing_identical_docs_identical_fingerprints(spark):
    text = " ".join(f"t{i}" for i in range(60))
    out = _fps(spark, [text, text])
    a = sorted((r["pos"], r["fp"]) for r in out.where("doc_id = 0").collect())
    b = sorted((r["pos"], r["fp"]) for r in out.where("doc_id = 1").collect())
    assert a == b
    assert all(r["n_docs"] == 2 for r in out.collect())


def test_winnowing_short_doc_single_truncated_window(spark):
    # k words -> exactly one k-gram -> one window -> one fingerprint
    text = " ".join(f"x{i}" for i in range(WINNOW_K))
    rows = _fps(spark, [text]).collect()
    assert len(rows) == 1 and rows[0]["pos"] == 1
