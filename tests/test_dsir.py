"""operators/dsir.py — hashed-n-gram importance selection (DSIR-shaped)."""

from pyspark.sql import functions as F

from crawler_spark.operators.dsir import dsir_scores, dsir_select


def _docs(spark):
    # target (src0) talks about fish; raw pool mostly talks about rocks
    rows = []
    for i in range(4):
        rows.append((i, "src0", "fresh fish swim deep fresh fish swim"))
    for i in range(4, 16):
        rows.append((i, "src1", "hard rocks sit still hard rocks sit"))
    for i in range(16, 20):
        rows.append((i, "src1", "fresh fish swim deep fresh fish swim"))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_target_like_docs_score_higher(spark):
    got = {r["doc_id"]: r["dsir_score"] for r in dsir_scores(_docs(spark)).collect()}
    fish = [got[i] for i in list(range(4)) + list(range(16, 20))]
    rocks = [got[i] for i in range(4, 16)]
    assert min(fish) > max(rocks)  # fish-vocabulary docs look like the target
    # identical text -> identical score, source plays no per-doc role
    assert len(set(fish)) == 1


def test_select_keeps_top_quantile(spark):
    sel = dsir_select(_docs(spark), keep_q=0.75).collect()
    kept = {r["doc_id"] for r in sel if r["kept"]}
    # exactly the 8 fish docs clear the 75th percentile of 20 docs
    assert kept == set(range(4)) | set(range(16, 20))


def test_score_is_occurrence_weighted(spark):
    df = spark.createDataFrame(
        [(0, "src0", "a b"), (1, "src1", "a b a b a b")],
        "doc_id long, source string, text string",
    )
    got = {r["doc_id"]: r for r in dsir_scores(df).collect()}
    assert got[0]["n_bigrams"] == 1
    assert got[1]["n_bigrams"] == 5
    # doc 1 mixes the target bigram 'a b' with raw-only 'b a' -> lower mean
    assert got[0]["dsir_score"] > got[1]["dsir_score"]


def test_plan_broadcasts_weights_no_window(spark):
    plan = (
        dsir_scores(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
