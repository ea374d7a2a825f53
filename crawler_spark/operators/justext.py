"""jusText-style main-content extraction: per-block density classing.

The published boilerplate-removal family (jusText, Pomikálek 2011;
boilerpipe, Kohlschütter 2010 — both public) classifies a page's text
BLOCKS by shallow features — stopword density, length, link density —
then applies a context rule so short blocks inherit their neighbors'
verdict. It complements :mod:`crawler_spark.operators.textclean`:
textclean strips lines that repeat ACROSS documents (a corpus-level
frequency pass); this module judges each block WITHIN its document, so
it works on a single page with no corpus statistics at all — the form
every extraction pipeline runs at fetch time.

Simplified feature set (no HTML markup in the corpus, so link density
is out of scope — the WARC path's ``<a>``-tag density would slot into
the same column): a block is ``short`` under LEN_LOW words, else
``good`` iff its integer per-mille stopword density clears the gate,
else ``bad``. The context rule is ONE lag/lead window per document:
short blocks are promoted to good iff an adjacent block is good —
jusText's near-good neighborhood rule in its minimal form.

Scale shape: segmentation + density are pure JVM map work
(transform/slice over the word array, posexplode); the context rule
and the reassembly are windows/aggregations PER DOCUMENT — partition
key doc_id, group size bounded by single-document length, never a
corpus-wide window. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BLOCK_WORDS = 10  # synthetic corpus has no newlines: fixed-size blocks
LEN_LOW = 6  # under this many words a block is 'short' (context rule)
GOOD_STOP_PM = 100_000  # >= 10% stopwords → content-like
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")


def _block_class(n_words, stop_pm):
    return (
        F.when(n_words < LEN_LOW, F.lit("short"))
        .when(stop_pm >= GOOD_STOP_PM, F.lit("good"))
        .otherwise(F.lit("bad"))
    )


def segment_blocks(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) → (doc_id, pos, block, n_words, stop_pm, cls):
    fixed BLOCK_WORDS-word blocks with per-block stopword density."""
    words = F.split(F.col(text_col), " ")
    nblocks = F.ceil(F.size(words) / F.lit(BLOCK_WORDS)).cast("int")
    blocks = F.transform(
        F.sequence(F.lit(0), nblocks - 1),
        lambda i: F.array_join(
            F.slice(words, i * BLOCK_WORDS + 1, BLOCK_WORDS), " "
        ),
    )
    b = docs.select("doc_id", F.posexplode(blocks).alias("pos", "block"))
    bw = F.split(F.col("block"), " ")
    n_words = F.size(bw)
    n_stop = F.size(F.filter(bw, lambda w: w.isin(*STOPWORDS)))
    stop_pm = F.expr(f"(_n_stop * 1000000) div _n_words")
    return (
        b.withColumn("_n_words", n_words)
        .withColumn("_n_stop", n_stop)
        .withColumn("stop_pm", stop_pm)
        .select(
            "doc_id",
            "pos",
            "block",
            F.col("_n_words").alias("n_words"),
            F.col("stop_pm"),
            _block_class(F.col("_n_words"), F.col("stop_pm")).alias("cls"),
        )
    )


def extract_main_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per document: block census after the context rule + the
    reassembled main text (good blocks in order). Columns:
    (doc_id, n_blocks, n_good, n_bad, n_promoted, main_text)."""
    b = segment_blocks(docs, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    ctx = b.withColumn(
        "final_cls",
        F.when(
            F.col("cls") == "short",
            F.when(
                (F.lag("cls").over(w) == "good") | (F.lead("cls").over(w) == "good"),
                F.lit("good"),
            ).otherwise(F.lit("bad")),
        ).otherwise(F.col("cls")),
    )
    return ctx.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum((F.col("final_cls") == "good").cast("long")).alias("n_good"),
        F.sum((F.col("final_cls") == "bad").cast("long")).alias("n_bad"),
        F.sum(
            ((F.col("cls") == "short") & (F.col("final_cls") == "good")).cast("long")
        ).alias("n_promoted"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("final_cls") == "good",
                            F.struct(F.col("pos"), F.col("block")),
                        )
                    )
                ),
                lambda s: s.getField("block"),
            ),
            " ",
        ).alias("main_text"),
    )
