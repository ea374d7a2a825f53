"""Deterministic global corpus shuffle → training shards.

Training runs consume the corpus in random order, but the order must be
REPRODUCIBLE — a pure function of (corpus, seed): rerunning after a
crash, on a different cluster size, or with different partitioning must
yield byte-identical example order (public practice: T5/GPT data
pipelines shuffle with a seeded hash before sharding; Megatron's data
loader builds seeded shuffle indexes; a new seed per epoch gives fresh
order without materializing anything).

Spark-first, and honest about scale: a single global ``ORDER BY`` is a
total sort whose final position assignment serializes, so the shuffled
order is DEFINED as the lexicographic (shard, pos) order instead —
exactly how sharded training data is consumed:

- ``key = md5(seed || ':' || doc_id)`` — a keyed hash both engines
  compute bit-identically; no engine-specific hash function;
- ``shard = hex_digit(key[0])`` (16-way; two digits for 256) — a pure
  map-side assignment, balanced by the hash;
- ``pos = row_number() over (partition by shard order by key, doc_id)``
  — a per-shard window, the only shuffle, keyed on the shard so skew is
  bounded by hash balance. The (key, doc_id) order key makes ties
  impossible and the result independent of physical partitioning.

Changing the seed permutes everything; changing the cluster changes
nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.texthash import HEX_DIGITS, hex_prefix_value, seeded_md5_key

SHUFFLE_SHARDS = 16  # one hex digit of the key; 256 via two digits
HEX = HEX_DIGITS  # re-export for the oracle twin


def seeded_shuffle(
    docs: DataFrame, seed: str, id_col: str = "doc_id"
) -> DataFrame:
    """(id, …) → (id, shard, pos): the reproducible shuffled layout.
    Consume shards in index order, rows in pos order."""
    d = docs.select(
        F.col(id_col), seeded_md5_key(seed, F.col(id_col)).alias("_k")
    )
    shard = hex_prefix_value(F.col("_k"), 1).cast("int")
    w = Window.partitionBy("shard").orderBy("_k", id_col)
    return (
        d.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )


SHUFFLE_SEED = "r3"


def shuffle_over_documents(docs: DataFrame) -> DataFrame:
    """Driver query: the shuffled layout plus a per-shard balance check
    (n rows, first/last key position) — small, hash-stable output that
    still pins every row's (shard, pos)."""
    lay = seeded_shuffle(docs, SHUFFLE_SEED)
    return lay.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("pos") * F.col("doc_id")).alias("pos_dot_id"),
        F.min(F.col("doc_id")).alias("first_id"),
    )
