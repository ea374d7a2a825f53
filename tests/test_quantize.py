"""similarity.quantize_embeddings — int8 scalar quantization."""

from pyspark.sql import functions as F

from crawler_spark.operators.similarity import quantize_embeddings


def test_quantize_range_signs_and_zero_dim(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 0.0]),
            (2, [0.5, 2.0, 0.0]),
            (3, [-1.0, 1.0, 0.0]),  # dim 3 all-zero -> quantizes to 0
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in quantize_embeddings(emb).collect()}
    # max|dim1| = 1.0, max|dim2| = 2.0
    assert got[1]["qvec"] == [127, -127, 0]
    # floor semantics: 0.5*127/1 = 63.5 -> 63
    assert got[2]["qvec"] == [63, 127, 0]
    assert got[3]["qvec"] == [-127, 63, 0]
    assert got[1]["l1"] == 254
    for r in got.values():
        assert all(-127 <= q <= 127 for q in r["qvec"])


def test_quantize_plan_broadcasts_scales(spark):
    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % 7).cast("float") for _ in range(4)]).alias(
            "embedding"
        ),
    )
    plan = (
        quantize_embeddings(emb)._jdf.queryExecution().executedPlan().toString()
    )
    # the corpus side is never shuffled; the scale vector broadcasts
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") <= 1  # only the dim agg
