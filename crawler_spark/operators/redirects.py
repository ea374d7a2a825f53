"""Redirect-chain resolution: 3xx hops → final target, cycles flagged.

A crawl store is full of redirects — CDX rows with 3xx status whose
``Location`` points at the next URL. Downstream consumers (dedupe,
link-graph edges, frontier canonicalization) want the TERMINAL target:
``u1 → u2 → u3`` should contribute one page identity, and a redirect
cycle (``a → b → a``, or a rho-shaped tail into one) must be flagged,
never followed forever — every production crawler caps the chain
(browsers stop at ~20 hops).

Spark-first algorithm: **pointer doubling** (the classic parallel
list-ranking/path-halving technique, same family as the alternating
star rounds in :mod:`crawler_spark.operators.components`). The mapping
``P(u) = (next, hops)`` starts as the raw edges (hops = 1) and each
round substitutes ``P(u) ← (P(P(u).next).next, hops₁+hops₂)`` where
defined — one self equi-join per round, so a chain of length L resolves
in ⌈log₂ L⌉ rounds instead of L sequential lookups. ``max_doublings=5``
covers 32 hops, past any real redirect policy. Rows still pointing at a
redirecting URL after the cap are ``unresolved=true`` with final/hops
NULL — cycle members, rho tails, or (only if a ladder exceeds the cap,
which no real redirect policy allows) capped straight chains. The
column is named for what the algorithm KNOWS (no terminal was reached
within the cap), not a cycle claim it cannot certify: discriminating a
true cycle from a >cap ladder needs chain-length accounting the
doubling join does not keep.

Scale shape: each round is one equi-join between two copies of the
mapping, shuffle-partitioned on the join key; lineage is truncated per
round with localCheckpoint (swap for reliable checkpoint on a cluster)
exactly like pagerank/components, so the plan depth stays O(1) per
round. Contract: one outgoing redirect per src (an HTTP snapshot has
one ``Location`` per URL); feed multi-capture stores through a
latest-capture pick (operators/asof.py) first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESOLVE_MAX_DOUBLINGS = 5  # resolves chains up to 2^5 = 32 hops


def resolve_redirects(
    edges: DataFrame, max_doublings: int = RESOLVE_MAX_DOUBLINGS
) -> DataFrame:
    """edges(src, dst) → (url, final_url, hops, unresolved) for every
    redirecting url. ``final_url``/``hops`` are NULL when unresolved."""
    p = (
        edges.select(
            F.col("src").alias("url"),
            F.col("dst").alias("nxt"),
            F.lit(1).cast("long").alias("hops"),
        )
        .localCheckpoint()
    )
    srcs = p.select(F.col("url").alias("_s")).distinct().localCheckpoint()
    for _ in range(max_doublings):
        b = p.select(
            F.col("url").alias("_bu"),
            F.col("nxt").alias("_bn"),
            F.col("hops").alias("_bh"),
        )
        p = (
            p.join(b, p["nxt"] == b["_bu"], "left")
            .select(
                "url",
                F.coalesce("_bn", "nxt").alias("nxt"),
                F.when(F.col("_bn").isNotNull(), F.col("hops") + F.col("_bh"))
                .otherwise(F.col("hops"))
                .alias("hops"),
            )
            .localCheckpoint()
        )
    resolved = p.join(srcs, p["nxt"] == srcs["_s"], "left")
    return resolved.select(
        "url",
        F.when(F.col("_s").isNull(), F.col("nxt")).alias("final_url"),
        F.when(F.col("_s").isNull(), F.col("hops")).alias("hops"),
        F.col("_s").isNotNull().alias("unresolved"),
    )


# Synthetic redirect graph (test/bench scaffolding): within each decade,
# u(d) → u(d-1) down to the terminal u(10k); per hundred, the 55↔57 pair
# forms a 2-cycle and 56/58/59 are rho-tails into it (all unresolved) —
# chains, terminals, cycles and rho shapes from one closed form both engines can derive.
def synth_redirect_edges(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    u = lambda c: F.concat(F.lit("https://r.example.com/u/"), c.cast("string"))  # noqa: E731
    dst_id = (
        F.when(d % 100 == 55, d + 2)
        .when(d % 100 == 57, d - 2)
        .otherwise(d - 1)
    )
    return docs.where(d % 10 != 0).select(
        u(d).alias("src"), u(dst_id).alias("dst")
    )


def redirects_over_documents(docs: DataFrame) -> DataFrame:
    """Driver query: resolve the synthetic redirect graph and roll up
    per (hops, unresolved) — chain-length histogram + unresolved census. The
    rollup keeps the output small and hash-stable while every resolved
    row feeds it."""
    res = resolve_redirects(synth_redirect_edges(docs))
    return res.groupBy("hops", "unresolved").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.count_distinct(F.col("final_url")).alias("n_targets"),
    )
