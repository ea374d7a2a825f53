"""textdedup.lsh_band_table / lsh_match_new — incremental near-dup."""

from pyspark.sql import functions as F

from crawler_spark.operators.textdedup import (
    LSH_BANDS,
    lsh_band_table,
    lsh_match_new,
    minhash_lsh_pairs,
)

TXT = "the quick brown fox jumps over the lazy dog again and again today"


def test_match_new_finds_twin_not_decoy(spark):
    corpus = spark.createDataFrame(
        [(1, TXT), (2, "completely different words about spark engines here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(101, TXT + " tail"), (102, "zz unrelated qq words nothing shared")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["match_id"], r["n_hits"])
        for r in lsh_match_new(lsh_band_table(new), lsh_band_table(corpus)).collect()
    }
    assert 101 in got and got[101][0] == 1
    assert 1 <= got[101][1] <= LSH_BANDS
    assert 102 not in got


def test_exact_duplicate_hits_every_band_min_match(spark):
    corpus = spark.createDataFrame(
        [(5, TXT), (9, TXT)], "doc_id long, text string"  # two copies
    )
    new = spark.createDataFrame([(100, TXT)], "doc_id long, text string")
    rows = lsh_match_new(lsh_band_table(new), lsh_band_table(corpus)).collect()
    assert len(rows) == 1
    r = rows[0]
    # identical text -> all bands collide with BOTH corpus copies
    assert r["n_hits"] == 2 * LSH_BANDS
    assert r["match_id"] == 5  # min corpus id


def test_band_table_refactor_preserves_pairs(spark):
    # minhash_lsh_pairs through the extracted band table still finds the
    # planted duplicate pair
    docs = spark.createDataFrame(
        [(1, TXT), (2, TXT), (3, "other words entirely unrelated to that")],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
