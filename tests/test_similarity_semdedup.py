"""SemDedup: keep-lowest-id within-cell pruning semantics."""

from __future__ import annotations

import pytest

from crawler_spark.operators.similarity import semdedup


@pytest.mark.spark
def test_semdedup_keep_lowest_id(spark):
    # two tight groups on orthogonal axes + one isolated vector; labels
    # (= cells) chosen so group A spans ids 1..3, B spans 10..11
    dim = 64
    def v(axis, eps=0.0):
        x = [0.0] * dim
        x[axis] = 1.0
        x[(axis + 1) % dim] = eps
        return x
    rows = [
        (1, v(0), 0), (2, v(0, 0.01), 0), (3, v(0, 0.02), 0),  # near-dups
        (10, v(5), 1), (11, v(5, 0.015), 1),                   # near-dups
        (20, v(30), 2),                                        # isolated
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r["vec_id"]: r["is_kept"] for r in semdedup(emb, threshold=0.99).collect()}
    assert got == {1: True, 2: False, 3: False, 10: True, 11: False, 20: True}
