"""Anchor-text aggregation — what the link graph SAYS about a target.

Public-knowledge crawl-tier signal since Brin & Page 1998 (anchor terms
describe the *target* page better than its own text) and WWW2001's
anchor-text studies; production crawlers keep a link database with
anchor text per target (e.g. Nutch's anchor db, Common Crawl's link
anchors) and use the rollup for seed discovery, target-page description
of UNCRAWLED frontier URLs, and spam/nepotism detection (one repeated
anchor across thousands of sources).

Scale shape (10^10 edges): anchor tokenization + explode is a pure map
stage; the (dst, term) count is ONE partial-agg group-by (map-side
combine absorbs the per-source repetition that makes anchors spammy in
the first place); the per-target top-k window runs over the aggregated
(targets × distinct-terms) rows only — orders of magnitude smaller than
the edge list. No joins; composing with a doc→host dim join rolls it up
to host level exactly like linkgraph.host_link_summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.operators.linkgraph import synth_link_graph

ANCHOR_TOPK = 3

# Synthetic anchor vocabulary (test/bench scaffolding): two words per
# edge chosen by closed-form arithmetic on (src, dst) so both engines
# derive identical text — repetition across sources gives real term
# skew per target.
ANCHOR_VOCAB = [
    "news", "blog", "login", "about", "contact", "download",
    "index", "archive", "profile", "search", "docs", "home",
]


def anchor_terms_topk(edges: DataFrame, k: int = ANCHOR_TOPK) -> DataFrame:
    """edges(src, dst, anchor) → (dst, term, n_refs, rk): the k most
    frequent anchor terms pointing at each target. Ties break on term
    (asc) for cross-engine determinism."""
    terms = edges.select(
        "dst",
        F.explode(F.split(F.lower(F.col("anchor")), r"\s+")).alias("term"),
    ).where(F.length("term") > 0)
    agg = terms.groupBy("dst", "term").agg(F.count(F.lit(1)).alias("n_refs"))
    w = Window.partitionBy("dst").orderBy(F.desc("n_refs"), F.asc("term"))
    return (
        agg.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )


def synth_anchor_edges(docs: DataFrame, n_docs: int) -> DataFrame:
    """The arithmetic link graph with a two-word anchor per edge:
    ``vocab[(src+dst) % V] vocab[(dst*3+src) % V]``."""
    v = F.array(*[F.lit(w) for w in ANCHOR_VOCAB])
    nv = len(ANCHOR_VOCAB)
    e = synth_link_graph(docs, n_docs)
    a1 = F.element_at(v, ((F.col("src") + F.col("dst")) % nv).cast("int") + 1)
    a2 = F.element_at(v, ((F.col("dst") * 3 + F.col("src")) % nv).cast("int") + 1)
    return e.withColumn("anchor", F.concat_ws(" ", a1, a2))


def anchors_over_documents(docs: DataFrame) -> DataFrame:
    """Driver query: synthesize anchored edges over the documents table
    and roll up per-target top-k anchor terms. One bounded driver
    scalar (node count), like the other link-graph entries."""
    n = docs.count()
    return anchor_terms_topk(synth_anchor_edges(docs, n))
