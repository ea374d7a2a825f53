"""Sliding-window text chunking — the retrieval/embedding-pipeline
preprocessor (every RAG/embedding index chunks documents into
fixed-size overlapping windows before encoding; public practice in
e.g. the DPR paper's 100-word passages).

One doc → ``ceil(max(n_words - overlap, 1) / stride)`` chunks of
``window`` words with ``window - stride`` words of overlap, plus the
word-offset bookkeeping an index needs to map a hit back into the
source document. A short document yields exactly one (short) chunk.

Scale shape: a pure map stage — ``sequence`` + ``transform`` over the
split word array, then one ``posexplode``; no shuffle at all, chunk
rows inherit the parent's partitioning. The chunk id is
(doc_id, chunk_idx) so downstream grouping keys stay uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_WINDOW = 40  # words per chunk
CHUNK_STRIDE = 30  # step between chunk starts (overlap = window - stride)


def chunk_text(
    docs: DataFrame,
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, word_start, n_words, chunk): overlapping
    word windows over the space-delimited text. The last window is the
    final stride step that still contains unseen words; it may be
    shorter than ``window``."""
    if not (0 < stride <= window):
        raise ValueError("need 0 < stride <= window")
    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    # number of stride steps whose window adds at least one new word:
    # ceil(max(n - (window - stride), 1) / stride)
    overlap = window - stride
    n_chunks = F.ceil(F.greatest(n - F.lit(overlap), F.lit(1)) / F.lit(stride)).cast(
        "int"
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            (i * stride).alias("word_start"),
            F.slice(w, i * stride + 1, window).alias("_w"),
        ),
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "_c"),
    ).select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("_c.word_start").cast("int").alias("word_start"),
        F.size("_c._w").cast("int").alias("n_words"),
        F.array_join("_c._w", " ").alias("chunk"),
    )
