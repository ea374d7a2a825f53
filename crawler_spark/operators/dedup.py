"""Dedupe operators — the reference's three membership policies, Spark-first.

Reference semantics (SURVEY §2.4):
- global URL-seen (src/crawler.py:54-55,181-186): drop a row if its URL was
  ever emitted → Bloom-prefiltered exact anti-join against ``url_seen``;
- per-WARC (src/warc_processor.py:345-361): duplicates allowed across WARCs,
  first record wins within one → partition-local window;
- domain-first-wins (examples/bulk_warc_search.py:178-188): one result per
  domain, earliest wins → window over domain.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.config import DEFAULT, EngineConfig
from crawler_spark.operators.bloom import probe_blooms, probe_blooms_broadcast


def first_wins(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Deterministic first-wins dedupe (the order-sensitive analog of the
    reference's 'if url not in seen: seen.add(url)' insertion order)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame | None,
    blooms: DataFrame | None = None,
    key_col: str = "surt",
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """Rows of ``candidates`` whose key is NOT in ``seen`` — exactly.

    With blooms: probe first; Bloom-negative rows are provably unseen and
    bypass the anti-join (at a 10^10-row seen table this is the difference
    between shuffling the whole frontier and shuffling only the ~few %% of
    Bloom positives). Bloom-positive rows are confirmed exactly, so false
    positives never drop a URL.

    ``seen`` must expose ``key_col``; candidates carrying a null key are
    dropped (unparseable URLs can never be scheduled).
    """
    cand = candidates.where(F.col(key_col).isNotNull())
    if seen is None:
        return cand
    seen_keys = seen.select(key_col)
    if blooms is None:
        return cand.join(seen_keys, key_col, "left_anti")
    probed = probe_blooms(cand, blooms, key_col, cfg)
    definitely_new = probed.where(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybe = probed.where(F.col("_maybe_seen")).drop("_maybe_seen")
    confirmed_new = maybe.join(seen_keys, key_col, "left_anti")
    return definitely_new.unionByName(confirmed_new)


@dataclass
class UnseenResult:
    unseen: DataFrame  # exact; carries a ``bucket`` column
    probed: DataFrame  # cached — caller unpersists after the round
    maybe_buckets: list[int]  # buckets with ≥1 Bloom positive


def filter_unseen_pruned(
    candidates: DataFrame,
    seen: DataFrame,
    blooms: DataFrame,
    key_col: str = "surt",
    cfg: EngineConfig = DEFAULT,
    total_bits: int | None = None,
    probe=None,
) -> UnseenResult:
    """The frontier-loop variant of :func:`filter_unseen`: exact, with the
    seen side *pruned to Bloom-positive buckets* before the anti-join.

    The unseen stage is filter-structure agnostic: any probe with the
    maybe/definitely-new contract slots in via ``probe=`` (signature of
    :func:`crawler_spark.operators.bloom.probe_blooms_broadcast`) — the
    cuckoo form (operators/cuckoo.probe_cuckoo_broadcast, with its
    filter table as ``blooms``) yields the identical exact unseen set
    because correctness lives in the confirm join, not the filter. The
    default is the Bloom pair with size-based broadcast/cogroup
    selection below.

    ``seen`` must carry a ``bucket`` column (bloom.bucket_of, written
    bucket-sorted): the ``bucket IN (...)`` predicate pushes down to
    parquet row-group stats — the Iceberg ``bucket(B, surt)`` partition-
    pruning analog. At a 10^10-row seen table this is what keeps the
    confirm join from shuffling the whole table when only a few buckets
    have positives (early rounds: most candidates are Bloom-negative and
    skip the join entirely).

    ``probed`` is cached here because BOTH output branches (definitely-new
    ∪ confirmed-new) read it — without the cache the candidate subtree
    (window dedupe + bloom cogroup) would execute twice per action, and
    any Observation planted upstream would double-fire.
    """
    cand = candidates.where(F.col(key_col).isNotNull())
    # Probe strategy: broadcast+codegen while the filter set is small
    # enough to ship to every executor; cogrouped per-bucket probe beyond
    # that (no single place ever holds the whole filter). The size comes
    # from the blooms snapshot meta when the caller has it (piggybacked on
    # the previous round's write Observation — zero jobs); the fallback is
    # a 1-row aggregate job over the (tiny, B-row) blooms table.
    if probe is None:
        if total_bits is None:
            total_bits = blooms.agg(F.sum("m")).first()[0] or 0
        total_bytes = total_bits // 8
        probe = (
            probe_blooms_broadcast
            if total_bytes <= cfg.bloom_broadcast_max_bytes
            else probe_blooms
        )
    probed = probe(cand, blooms, key_col, cfg, bucket_out="bucket").persist()
    maybe_buckets = [
        r[0]
        for r in probed.where(F.col("_maybe_seen")).select("bucket").distinct().collect()
    ]
    definitely_new = probed.where(~F.col("_maybe_seen")).drop("_maybe_seen")
    if maybe_buckets:
        seen_keys = seen.select("bucket", key_col).where(
            F.col("bucket").isin(maybe_buckets)
        )
        confirmed_new = (
            probed.where(F.col("_maybe_seen"))
            .drop("_maybe_seen")
            .join(seen_keys, ["bucket", key_col], "left_anti")
        )
        unseen = definitely_new.unionByName(confirmed_new)
    else:
        unseen = definitely_new
    return UnseenResult(unseen=unseen, probed=probed, maybe_buckets=maybe_buckets)


def dedupe_per_warc(results: DataFrame) -> DataFrame:
    """EP2 policy: first record wins within (warc_source, url)."""
    return first_wins(results, ["warc_source", "url"], [F.col("warc_offset").asc()])


def dedupe_domain_first_wins(results: DataFrame, order: list[Column]) -> DataFrame:
    """EP3 policy: one row per domain, earliest by ``order`` wins."""
    return first_wins(results, ["domain"], order)


def merge_runs(a: DataFrame, b: DataFrame, key: str = "domain") -> DataFrame:
    """Result merge across runs — the documented jq recipe
    ``jq -s 'add | unique_by(.domain)'`` (reference COMPARISON.md:270-274)."""
    return a.unionByName(b, allowMissingColumns=True).dropDuplicates([key])
