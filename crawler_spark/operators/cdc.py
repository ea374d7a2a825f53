"""Content-defined chunking (CDC) — sub-document dedup at chunk grain.

Muthitacharoen, Chen, Mazières, "A low-bandwidth network file system"
(SOSP 2001, public) introduced content-defined chunk boundaries: cut
where a rolling hash of the CONTENT hits a modulus, so an insertion
early in a document shifts only the chunk it lands in — fixed-size
blocks would shift every later block and defeat dedup. Venti, rsync,
and every dedup storage system since use the same trick; for a web
corpus it is the grain BETWEEN span dedup (exact 50-gram runs,
operators/spandedup.py) and whole-doc MinHash: template sites repeat
paragraph-sized chunks (navboxes, legal footers, product blurbs)
that are neither long exact runs nor whole-doc near-dups.

Word-level variant here: the boundary predicate is h64(word) mod
CDC_DIV == 0 — content-defined (depends only on the word at the cut
point), deterministic, and engine-portable, with expected chunk length
CDC_DIV words. The final partial chunk is always emitted.

Scale shape: boundary detection and chunk slicing are ONE map stage of
array expressions (transform/filter/slice — JVM-evaluated, O(words)
per doc, no Python); corpus-wide copy counts are one partial-agg
groupBy(chunk_hash) + an equi-join back — the exact-dedup plan shape,
a 10^10-doc-safe single hash shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.texthash import h64

# Boundary modulus == expected chunk length in words.
CDC_DIV = 8

# h64 as a SQL fragment usable inside transform() lambdas.
_H64 = "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    div: int = CDC_DIV,
) -> DataFrame:
    """(doc_id, chunk_idx, n_words, chunk_hash, n_copies, is_dup) —
    content-defined chunks of every document plus the corpus-wide copy
    count of each chunk's content hash.

    ``n_copies`` counts occurrences of the chunk content anywhere in
    the corpus (including this one); ``is_dup`` marks chunks occurring
    more than once — the repeated-boilerplate mass a chunk-grain dedup
    pass would strip."""
    h_word = _H64.format(x="element_at(w, p)")
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("w")
    ).where(F.size("w") >= 1)
    d = d.withColumn(
        "bp",
        F.expr(
            f"filter(transform(sequence(1, size(w)),"
            f" p -> IF({h_word} % {div} = 0, p, 0)), p -> p > 0)"
        ),
    )
    # boundary positions always end with the last word (no empty tail)
    d = d.withColumn(
        "ends",
        F.expr(
            "IF(size(bp) > 0 AND element_at(bp, -1) = size(w),"
            " bp, concat(bp, array(size(w))))"
        ),
    )
    chunks = d.select(
        "doc_id",
        F.explode(
            F.expr(
                """
                transform(sequence(1, size(ends)), k -> named_struct(
                  'chunk_idx', k - 1,
                  'cw', slice(w,
                              IF(k = 1, 1, element_at(ends, k - 1) + 1),
                              element_at(ends, k)
                                - IF(k = 1, 0, element_at(ends, k - 1)))))
                """
            )
        ).alias("c"),
    ).select(
        "doc_id",
        F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
        F.size("c.cw").cast("long").alias("n_words"),
        h64(F.array_join("c.cw", " ")).alias("chunk_hash"),
    )
    copies = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    return chunks.join(copies, "chunk_hash").select(
        "doc_id",
        "chunk_idx",
        "n_words",
        "chunk_hash",
        "n_copies",
        (F.col("n_copies") > 1).alias("is_dup"),
    )
