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


@pytest.mark.spark
def test_ann_recall_full_probe_is_perfect(spark):
    """With nprobe = ncells the IVF search is exhaustive, so recall@k
    must be exactly 1000 pm for every query; hits == k_eff."""
    from crawler_spark.operators.similarity import ann_recall

    dim = 64

    def v(axis, eps):
        x = [0.0] * dim
        x[axis] = 1.0
        x[(axis + 1) % dim] = eps
        return x

    rows = [(i, v(i % 4, 0.01 * (i // 4)), i % 4) for i in range(16)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r["query_id"]: r for r in ann_recall(emb, [0, 5], k=3, nprobe=4).collect()}
    assert set(got) == {0, 5}
    for r in got.values():
        assert r["k_eff"] == 3
        assert r["hits"] == 3
        assert r["recall_pm"] == 1000


@pytest.mark.spark
def test_ann_recall_detects_missed_neighbors(spark):
    """nprobe=1 on a query sitting between two cells misses the exact
    neighbors living in the unprobed cell — recall < 1000 and the
    report says by how much."""
    from crawler_spark.operators.similarity import ann_recall

    dim = 64

    def v(axis, eps):
        x = [0.0] * dim
        x[axis] = 1.0
        x[(axis + 1) % dim] = eps
        return x

    # IVF re-assigns every vector to its NEAREST centroid, so the miss
    # must come from the Voronoi boundary: vectors in the plane of axes
    # (0, 32) at angle θ. Cell 0's centroid sits near θ≈8°, cell 1's
    # near θ≈70°; the θ=48°/50° vectors land in cell 1 but the θ=48°
    # one is the query's #3 exact neighbor — nprobe=1 probes only
    # cell 0 and misses it.
    import math

    def ang(theta_deg):
        x = [0.0] * dim
        r = math.radians(theta_deg)
        x[0] = math.cos(r)
        x[32] = math.sin(r)
        return x

    rows = [
        (0, ang(20), 0),   # query
        (1, ang(0), 0),
        (2, ang(5), 0),
        (10, ang(48), 1),
        (11, ang(50), 1),
        (12, ang(90), 1),
        (13, ang(90), 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    r = ann_recall(emb, [0], k=3, nprobe=1).collect()[0]
    # exact top-3 = {θ5, θ0, θ48}; probed cell supplies only {θ0, θ5}
    assert r["k_eff"] == 3
    assert r["hits"] == 2
    assert r["recall_pm"] == 666
