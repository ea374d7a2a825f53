"""Winnowing fingerprint selection — guaranteed-detection local dedup.

Schleimer, Wilkerson, Aiken, "Winnowing: local algorithms for document
fingerprinting" (SIGMOD 2003, public — the MOSS algorithm): hash every
k-gram, slide a window of w consecutive hashes, and in each window
select the minimum hash (rightmost occurrence on ties). The selected
set is a LOCAL fingerprint: any shared substring of length ≥ w + k − 1
is guaranteed to contribute at least one common fingerprint — a
detection guarantee MinHash (a global random sample of shingles)
cannot make. For a web corpus this is the targeted tool for
quote/citation/license-block tracing: it finds WHERE the shared
passage sits (fingerprints carry positions), not just that two docs
are similar.

Scale shape: k-gram hashing and window selection are ONE map stage of
array expressions (transform/slice/array_min — JVM-evaluated, O(w²)
per window with w = 4, no Python); the cross-doc sharing count is one
partial-agg groupBy(fp) + an equi-join back — the same plan shape as
exact dedup. Fingerprint density is ~2/(w+1) per k-gram (paper §3), so
the shuffled volume is a fraction of the corpus token count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.textstats import word_ngrams

# k-gram width (words) and winnowing window (hashes).
WINNOW_K = 3
WINNOW_W = 4

# h64 of one k-gram, as a SQL fragment for use inside lambdas.
_H64 = "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """(doc_id, pos, fp, n_docs, shared) — the winnowed fingerprint set
    of every document plus how many distinct documents share each
    fingerprint value.

    ``pos`` is the 1-based k-gram index the fingerprint was selected
    at; ties inside a window select the RIGHTMOST minimal hash (the
    paper's rule, which minimizes selected-set size). Documents shorter
    than one full window winnow their single truncated window."""
    sub = f"slice(hs, s, {w})"
    sel_expr = (
        f"transform(sequence(1, greatest(size(hs) - {w} + 1, 1)),"
        f" s -> array_max(filter(transform(sequence(1, size({sub})),"
        f"   t -> IF(element_at({sub}, t) = array_min({sub}), s + t - 1, -1)),"
        f"  x -> x > 0)))"
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        word_ngrams(F.col(text_col), k).alias("ngs"),
    ).where(F.size("ngs") >= 1)
    h = d.select(
        "doc_id",
        F.expr("transform(ngs, g -> " + _H64.format(x="g") + ")").alias("hs"),
    )
    fps = (
        h.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform({sel_expr},"
                    f" j -> named_struct('pos', j, 'fp', element_at(hs, j)))"
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.pos").cast("int").alias("pos"), F.col("s.fp"))
        .distinct()
    )
    sharing = fps.groupBy("fp").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return fps.join(sharing, "fp").select(
        "doc_id", "pos", "fp", "n_docs", (F.col("n_docs") > 1).alias("shared")
    )
