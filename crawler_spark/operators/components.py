"""Connected components over candidate-pair graphs → duplicate clusters.

The last stage of web-scale dedup: pair generators (MinHash+LSH banding,
exact-hash, embedding-LSH — :mod:`crawler_spark.operators.textdedup` /
:mod:`.similarity`) emit near-dup EDGES; training-data curation needs
CLUSTERS (one canonical survivor per group of mutually-similar docs).
Pairs alone under-delete: A~B and B~C without A~C still means keeping
only one of {A,B,C}.

The reference engine never gets this far (its dedupe is a per-URL seen
set — SURVEY §2.4); this tier is part of the LLM-data-pipeline surface
the engine adds on top.

Algorithm: alternating large-star / small-star contraction (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
MapReduce and Beyond", SoCC 2014 — public). Each half-step is one
groupBy-min plus one equi-join — both partial-agg / shuffle-on-key
shapes — and the edge multiset provably never grows beyond O(|E|);
convergence is O(log² n) rounds even on adversarial chains, vs O(graph
diameter) for naive label propagation. Duplicate clusters are
near-cliques so typical convergence is 2-3 rounds, but a 10^10-node
crawl graph WILL contain long drift-chains — the star alternation is
what makes the worst case safe.

Driver involvement per round is one fixpoint probe (count + hash-sum in
a single aggregate job) — no collect of any node/edge data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fixpoint_sig(e: DataFrame) -> tuple[int, int]:
    """(count, xxhash64-xor) of the edge set — equality between rounds is
    the convergence probe. One aggregate job, no data to the driver.
    bit_xor (not sum): order-independent, overflow-free under ANSI mode,
    and the edge set is distinct so self-cancellation can't occur."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node on an edge; component = the
    minimum node id reachable from it. Nodes not on any edge are absent
    (callers coalesce to the node's own id — see :func:`dedup_clusters`).

    Invariant maintained by both half-steps: every edge points from the
    larger id to the strictly smaller (u > v), so at the fixpoint the
    edge set IS the (node → component-min) star forest.
    """
    # localCheckpoint, NOT persist: persist caches partitions but keeps
    # the logical plan, so each iteration's plan embeds the previous
    # one's — Catalyst re-analysis grows exponentially and a 10-iteration
    # run stalls in the optimizer (measured). Checkpointing truncates the
    # lineage to the materialized data — the standard discipline for
    # iterative graph algorithms (same as GraphFrames/GraphX). On a real
    # cluster swap localCheckpoint for checkpoint(reliable dir) so a lost
    # executor can't lose partitions mid-run.
    e = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    sig = _fixpoint_sig(e)
    for _ in range(max_iter):
        # large-star: for each u over the SYMMETRIZED neighborhood, link
        # every strictly-larger neighbor to m = min(Γ(u) ∪ {u}).
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m"))
        )
        e2 = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: edges all point down (v < u); link every smaller
        # neighbor of u, and u itself, to m = min(N(u)).
        mins2 = e2.groupBy("u").agg(F.min("v").alias("m"))
        e2 = (
            e2.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .unionByName(mins2.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        sig2 = _fixpoint_sig(e2)
        e = e2
        if sig2 == sig:
            break
        sig = sig2
    # The fixpoint star forest lists roots only on the v side — add their
    # self-rows so every node on an edge gets a label.
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    return members.unionByName(roots)


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster assignment for EVERY document: (doc_id, cluster_id,
    cluster_size, is_canonical). cluster_id = min doc_id of the connected
    component under ``pairs`` (singletons cluster with themselves); the
    canonical survivor is the cluster min — the deterministic first-wins
    rule every dedup operator here uses.

    Keep-policy downstream: ``where(is_canonical)`` is the deduped
    corpus; ``cluster_size`` feeds duplication-rate stats."""
    cc = connected_components(pairs, src="id_a", dst="id_b")
    labels = cc.select(
        F.col("node").alias(id_col), F.col("component").alias("cluster_id")
    )
    lab = (
        df.select(F.col(id_col).cast("long").alias(id_col))
        .join(labels, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )
    sizes = lab.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return lab.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
    )


def cluster_keep_best(
    docs: DataFrame,
    clusters: DataFrame,
    quality_col: str = "quality_pm",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware canonical selection: (doc_id, cluster_id,
    cluster_size, quality_pm, is_kept) — within every duplicate cluster
    keep the HIGHEST-quality document instead of the min-id one.

    ``dedup_clusters``'s min-id survivor is the right default for crawl
    URL-dedup (first-wins parity with the reference's seen set), but a
    training-data release wants the best COPY of each duplicated page:
    RefinedWeb/FineWeb-style pipelines pick the cluster representative
    by quality signal, not discovery order. ``docs`` must carry an
    integer quality column (``quality_col``; e.g. textstats
    quality_score_pm — integer so the argmax is bit-identical across
    engines); ties break to the smaller doc_id, so selection stays
    deterministic.

    Scale shape: one map-side join of the (already computed) cluster
    labels with the per-doc quality column, then ONE partial-agg argmax
    per cluster (min_by over a (-quality, id) struct — no window, no
    per-cluster sort), and a broadcast-or-shuffle join back on
    cluster_id. Cluster count ≤ doc count and the argmax output is one
    row per cluster, so no stage ever exceeds O(|docs|) rows."""
    q = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(quality_col).cast("long").alias("quality_pm"),
    )
    lab = clusters.select(id_col, "cluster_id", "cluster_size").join(q, id_col)
    best = lab.groupBy("cluster_id").agg(
        F.min_by(
            F.col(id_col),
            F.struct((-F.col("quality_pm")).alias("o1"), F.col(id_col).alias("o2")),
        ).alias("_keep")
    )
    return lab.join(best, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        "quality_pm",
        (F.col(id_col) == F.col("_keep")).alias("is_kept"),
    )


def duplication_census(
    docs: DataFrame, clusters: DataFrame, stratum_col: str = "source"
) -> DataFrame:
    """Per-stratum corpus-health ledger over the cluster assignment —
    the duplication reporting every published pipeline does (C4,
    RefinedWeb report removal rates per source) plus the soft-dedup
    mass: ``kept_mass`` sums cluster_size over this stratum's CANONICAL
    docs, i.e. how many corpus documents the stratum's kept set
    represents if duplicates are dropped but their sampling mass is
    kept (the dedup-then-upweight alternative to hard dropping; a
    cross-source cluster credits its whole mass to the canonical doc's
    stratum). One join + one partial-agg rollup over the (already
    cluster-labelled) corpus."""
    j = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), stratum_col
    ).join(clusters, "doc_id")
    return (
        j.groupBy(stratum_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("is_canonical").cast("long")).alias("n_canonical"),
            F.sum(
                F.when(F.col("is_canonical"), F.col("cluster_size")).otherwise(0)
            ).alias("kept_mass"),
            F.max("cluster_size").alias("max_cluster"),
        )
        .withColumn(
            "dup_rate_ppm",
            F.expr("((n_docs - n_canonical) * 1000000) div n_docs"),
        )
    )
