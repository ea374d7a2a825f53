"""Mirror-site detection: host pairs serving the same payloads.

Mirrors (and mass-produced template farms) waste crawl budget and
flood training corpora with near-copies; every large crawl maintains a
host-level mirror map (Heritrix's via payload digests, Common Crawl's
via URL-agnostic content dedup). The detector: two hosts sharing many
identical payload digests, relative to their own sizes, are mirrors.

Shape (the scale-safe version of "join the corpus with itself"):

1. (digest, host) distinct pairs — one shuffle, partial agg;
2. HOT-DIGEST CAP: a digest served by more than ``max_hosts`` hosts is
   dropped before pairing (empty pages, license boilerplate, parked-
   domain templates live on thousands of hosts — pairing them is
   O(hosts²) and means nothing). Same pruning role as the hot-shingle
   cap in textdedup.
3. self-join on digest with ``h1 < h2`` — the join fan-out is bounded
   by max_hosts² per digest, NOT corpus²;
4. pair rollup + per-host totals broadcast back; overlap is scored in
   integer per-mille against the SMALLER host (containment), so a
   small full mirror of a big site still scores 1000.

Typed as (host, digest) so it runs over any capture store projection
(pages, WARC ingest, the revisit ledger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIRROR_MAX_HOSTS = 16  # hot-digest cap: pairing fan-out bound
MIRROR_MIN_SHARED = 2  # pairs sharing fewer digests are noise
MIRROR_MIN_PM = 500  # containment >= 50% of the smaller host → mirror


def _host_digests(
    captures: DataFrame, host_col: str, digest_col: str
) -> DataFrame:
    """The distinct (digest, host) projection — built ONCE; candidates
    and per-host totals both derive from it (one corpus scan + one
    dedup shuffle, not two)."""
    return captures.select(
        F.col(digest_col).alias("digest"), F.col(host_col).alias("host")
    ).distinct()


def _candidates_from(hd: DataFrame, max_hosts: int) -> DataFrame:
    fanout = hd.groupBy("digest").agg(F.count(F.lit(1)).alias("_n"))
    keep = fanout.where(F.col("_n") <= max_hosts).select("digest")
    pruned = hd.join(keep, "digest")
    a = pruned.select("digest", F.col("host").alias("host_a"))
    b = pruned.select("digest", F.col("host").alias("host_b"))
    pairs = a.join(b, "digest").where(F.col("host_a") < F.col("host_b"))
    return pairs.groupBy("host_a", "host_b").agg(
        F.count(F.lit(1)).alias("n_shared")
    )


def mirror_candidates(
    captures: DataFrame,
    host_col: str = "host",
    digest_col: str = "digest",
    max_hosts: int = MIRROR_MAX_HOSTS,
) -> DataFrame:
    """(host_a, host_b, n_shared) for host pairs sharing ≥1 non-hot
    digest, host_a < host_b."""
    return _candidates_from(
        _host_digests(captures, host_col, digest_col), max_hosts
    )


def mirror_report(
    captures: DataFrame,
    host_col: str = "host",
    digest_col: str = "digest",
    max_hosts: int = MIRROR_MAX_HOSTS,
    min_shared: int = MIRROR_MIN_SHARED,
    min_pm: int = MIRROR_MIN_PM,
) -> DataFrame:
    """(host_a, host_b, n_shared, n_a, n_b, containment_pm, is_mirror):
    candidate pairs scored by shared-digest containment of the smaller
    host (integer per-mille; totals count distinct digests per host)."""
    hd = _host_digests(captures, host_col, digest_col).persist()
    cands = _candidates_from(hd, max_hosts).where(
        F.col("n_shared") >= min_shared
    )
    totals = hd.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    j = (
        cands.join(
            F.broadcast(totals.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))),
            "host_a",
        )
        .join(
            F.broadcast(totals.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))),
            "host_b",
        )
    )
    pm = F.expr("n_shared * 1000 div least(n_a, n_b)")
    return j.select(
        "host_a",
        "host_b",
        "n_shared",
        "n_a",
        "n_b",
        pm.alias("containment_pm"),
        (pm >= F.lit(min_pm)).alias("is_mirror"),
    )
