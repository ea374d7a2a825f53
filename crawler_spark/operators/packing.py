"""Training-sequence packing: concat-and-chunk document → example layout.

Pretraining dataloaders (GPT-3 appendix B; public) concatenate documents
with an EOS separator and slice the token stream into fixed-length
examples. At corpus scale that layout must be computed distributively
and deterministically — every doc's byte range in the packed stream is a
pure function of the corpus, so shard writers can run independently and
a re-run (or a resumed run) produces identical shards.

Semantics implemented here:
- docs are sharded by ``doc_id % PACK_SHARDS`` (production: pick the
  shard count so one shard ≈ one writer task's output file);
- within a shard, docs are laid out in ``doc_id`` order, each occupying
  ``bpe_token_count(text) + 1`` tokens (the +1 is the EOS separator);
- the stream is cut every ``PACK_BUDGET`` tokens; a doc may straddle a
  cut (``n_chunks > 1``) — the standard concat-and-chunk trade
  (no padding waste, occasional mid-document split).

Everything is integer window arithmetic over a single shuffle on the
shard key: the window compiles to exchange(shard) + sort(doc_id) —
exactly the repartitionByRange + sortWithinPartitions a shard writer
needs anyway, so the layout computation is free at write time. No
Python, no floats, no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.textstats import bpe_token_count

PACK_BUDGET = 2048  # tokens per training example
PACK_SHARDS = 16


def pack_layout(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """(doc_id, shard, n_tokens, start_offset, first_chunk, n_chunks,
    straddles) — the packed position of every document. ``start_offset``
    is the token offset of the doc inside its shard's concatenated
    stream; ``first_chunk``/``n_chunks`` locate it in the cut
    fixed-length examples."""
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("doc_id") % PACK_SHARDS).cast("long").alias("shard"),
        (bpe_token_count(F.col("text")) + 1).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("end_offset", F.sum("n_tokens").over(w))
    start = F.col("end_offset") - F.col("n_tokens")
    first = F.expr(f"(end_offset - n_tokens) div {budget}")
    last = F.expr(f"(end_offset - 1) div {budget}")
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        start.alias("start_offset"),
        first.alias("first_chunk"),
        (last - first + 1).alias("n_chunks"),
        (last > first).alias("straddles"),
    )


def shard_stats(layout: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Per-shard packing report: docs, total tokens, full examples cut,
    straddling docs, and tail tokens left in the final partial example."""
    return layout.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.max(F.expr(f"(start_offset + n_tokens) div {budget}")).alias("n_full_chunks"),
        F.sum(F.col("straddles").cast("long")).alias("n_straddling"),
        (F.max(F.col("start_offset") + F.col("n_tokens")) % budget).alias("tail_tokens"),
    )


# -------------------------------------------------- padding-bucket plan --
#
# The OTHER batching layout: inference / finetune loaders that cannot
# split documents pad every sequence in a batch to the batch max, so
# the loader buckets by length first (fairseq/HF group_by_length; the
# public "bucketing" trick from the NMT literature — Khomenko et al.
# 2016, Morishita et al. 2017). This planner reports, per
# power-of-two length bucket, how much compute padding would burn —
# the measured answer to "is concat-and-chunk (above) worth it for
# this corpus slice?".
#
# Integer/portable: bucket = 2^ceil(log2 n) via length(bin(n-1)) (the
# same bin() rank trick as operators/hll.py), floored at PAD_MIN_BUCKET
# and capped at PAD_MAX_BUCKET (longer docs count truncated, the
# loader's behavior). One map + one partial agg; waste in exact ‰.

PAD_MIN_BUCKET = 16
PAD_MAX_BUCKET = 4096


def pad_plan(docs: DataFrame) -> DataFrame:
    """(bucket_len, n_docs, actual_tokens, padded_tokens, waste_pm):
    per power-of-two length bucket, the padding overhead a
    pad-to-bucket-max loader pays on this corpus."""
    n = bpe_token_count(F.col("text"))
    used = F.least(n, F.lit(PAD_MAX_BUCKET))
    p2 = F.expr(
        # 2^ceil(log2 u) = 1 << bitlen(u-1); the inner greatest keeps
        # bin()'s argument ≥ 1 even for empty docs (the u ≤ 1 CASE arm
        # wins then, but BOTH engines still evaluate this arm
        # vectorized — never hand bin() a negative)
        "shiftleft(CAST(1 AS BIGINT), length(bin(greatest(_used - 1, 1))))"
    )
    bucket = F.greatest(
        F.lit(PAD_MIN_BUCKET).cast("long"),
        F.when(F.col("_used") <= 1, F.lit(1).cast("long")).otherwise(p2),
    )
    return (
        docs.select(used.alias("_used"))
        .select("_used", bucket.alias("bucket_len"))
        .groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_used").alias("actual_tokens"),
        )
        .withColumn(
            "padded_tokens",
            (F.col("n_docs") * F.col("bucket_len")).cast("long"),
        )
        .withColumn(
            "waste_pm",
            F.expr(
                "(padded_tokens - actual_tokens) * 1000 div padded_tokens"
            ),
        )
        .select(
            "bucket_len", "n_docs", "actual_tokens",
            "padded_tokens", "waste_pm",
        )
    )
