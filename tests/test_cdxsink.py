"""sources/cdxsink.py — range-sorted CDX shards + cluster index."""

import os

from pyspark.sql import functions as F

from crawler_spark.plans.docpages import pages_from_documents
from crawler_spark.plans.targeted import cdx_from_pages
from crawler_spark.sources.cdxsink import (
    read_cluster_idx,
    scan_prefix,
    shards_for_prefix,
    write_cdx_index,
)


def _cdx(spark, n=400):
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 7).cast("string")).alias("source"),
        F.lit(10).alias("n_chars"),
    )
    return cdx_from_pages(pages_from_documents(docs))


def test_shards_sorted_and_disjoint(spark, tmp_path):
    out = str(tmp_path / "cdx")
    write_cdx_index(_cdx(spark), out, n_shards=5)
    idx = read_cluster_idx(out)
    assert len(idx) >= 2
    # cluster index sorted
    assert [k for k, _ in idx] == sorted(k for k, _ in idx)
    ranges = []
    for first_key, shard in idx:
        with open(os.path.join(out, "shards", shard), encoding="utf-8") as f:
            keys = [ln.split(" ", 1)[0] for ln in f]
        assert keys == sorted(keys), shard  # internally sorted
        assert keys[0] == first_key
        ranges.append((keys[0], keys[-1]))
    # global order across shards: shard i's max <= shard i+1's min
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo


def test_prefix_scan_prunes_and_matches(spark, tmp_path):
    out = str(tmp_path / "cdx")
    cdx = _cdx(spark)
    write_cdx_index(cdx, out, n_shards=5)
    idx = read_cluster_idx(out)

    prefix = "com,example,src3)/"
    expected = cdx.where(F.col("urlkey").startswith(prefix)).count()
    assert expected > 0
    got = scan_prefix(spark, out, prefix)
    assert got.count() == expected
    # two-level pruning: the lookup opens a strict subset of shards
    assert len(shards_for_prefix(idx, prefix)) < len(idx)


def test_prefix_scan_empty_prefix_range(spark, tmp_path):
    out = str(tmp_path / "cdx")
    write_cdx_index(_cdx(spark), out, n_shards=3)
    assert scan_prefix(spark, out, "zzz,nonexistent)/").count() == 0
