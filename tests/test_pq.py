"""Product quantization vs a pure-Python twin."""

from __future__ import annotations

import hashlib

import pytest

from crawler_spark.operators.similarity import (
    PQ_K,
    PQ_M,
    PQ_SEED,
    PQ_SUBDIM,
    pq_encode,
)


def _h64(s: str, seed: int) -> int:
    return int(hashlib.md5(f"s{seed}:{s}".encode()).hexdigest()[:15], 16)


def _py_pq(rows):
    """rows: list of (vec_id, [float...]). Returns {vec_id: (codes, err)}."""
    sample = sorted(rows, key=lambda r: (_h64(str(r[0]), PQ_SEED), r[0]))[:PQ_K]
    out = {}
    for vid, vec in rows:
        codes, err = [], 0.0
        for m in range(PQ_M):
            best = None
            for j, (_, cw) in enumerate(sample):
                d = 0.0
                for i in range(PQ_SUBDIM):
                    x = vec[m * PQ_SUBDIM + i] - cw[m * PQ_SUBDIM + i]
                    d += x * x
                d = round(d * 1_000_000)
                if best is None or (d, j) < best:
                    best = (d, j)
            codes.append(best[1])
            err += best[0]
        out[vid] = (codes, err)
    return out


@pytest.mark.spark
def test_pq_matches_python_twin(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [
        (i, [float(np.float32(v)) for v in rng.randn(PQ_M * PQ_SUBDIM)])
        for i in range(40)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], ["vec_id", "embedding"]
    )
    got = {
        r["vec_id"]: ([r[f"c{m}"] for m in range(PQ_M)], r["recon_err_u6"])
        for r in pq_encode(df).collect()
    }
    want = _py_pq(rows)
    assert set(got) == set(want)
    for vid in want:
        assert got[vid][0] == want[vid][0], vid
        assert got[vid][1] == want[vid][1]


@pytest.mark.spark
def test_pq_codebook_members_have_zero_error(spark):
    # every sampled codebook vector reconstructs itself exactly
    import numpy as np

    rng = np.random.RandomState(11)
    rows = [
        (i, [float(np.float32(v)) for v in rng.randn(PQ_M * PQ_SUBDIM)])
        for i in range(PQ_K)  # ALL rows are the codebook
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    for r in pq_encode(df).collect():
        assert r["recon_err_u6"] == 0
