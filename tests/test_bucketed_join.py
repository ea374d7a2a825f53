"""Bucketed co-located join: zero shuffle exchanges, lossless round-trip."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.spark
def test_bucketed_join_has_no_exchange_and_matches_direct(spark):
    import __spark_entry__ as e

    df = e._q_bucketed_join(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the whole point: join AND aggregation reuse the bucketBy layout —
    # no Exchange anywhere in the physical plan
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan

    got = {(r["custkey"], r["c_name"]): (r["order_cnt"], r["total_price"])
           for r in df.collect()}

    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    direct = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("tp"),
        )
        .collect()
    )
    exp = {(r["c_custkey"], r["c_name"]): (r["cnt"], r["tp"]) for r in direct}
    assert got == exp and len(got) > 0


@pytest.mark.spark
def test_bucketed_join_is_rerunnable(spark):
    # the table/dir round-trip must be idempotent (driver runs it twice:
    # once per correctness pass, once per bench rep)
    import __spark_entry__ as e

    n1 = e._q_bucketed_join(spark, SF_DIR).count()
    n2 = e._q_bucketed_join(spark, SF_DIR).count()
    assert n1 == n2 > 0
