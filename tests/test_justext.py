"""jusText-lite: block classing, neighbor promotion, reassembly."""

from __future__ import annotations

import pytest

from crawler_spark.operators.justext import extract_main_text, segment_blocks

# 10-word blocks: B0 dense (good), B1 no stopwords (bad), tail 3 words
# (short, adjacent to bad -> stays bad)
DOC_A = (
    "the cat sat on the mat and the dog too "       # good: 5/10 stop
    "cat dog bird fish lion tiger bear wolf fox elk "  # bad: 0/10
    "tail words here"                                # short (3 words)
)
# short tail adjacent to a GOOD block -> promoted
DOC_B = (
    "the cat sat on the mat and the dog too "
    "a tail is"                                      # short, neighbor good
)


@pytest.mark.spark
def test_block_classes_and_promotion(spark):
    docs = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B)], "doc_id long, text string"
    )
    cls = {
        (r["doc_id"], r["pos"]): r["cls"] for r in segment_blocks(docs).collect()
    }
    assert cls[(1, 0)] == "good" and cls[(1, 1)] == "bad" and cls[(1, 2)] == "short"
    assert cls[(2, 0)] == "good" and cls[(2, 1)] == "short"
    out = {r["doc_id"]: r for r in extract_main_text(docs).collect()}
    a, b = out[1], out[2]
    # doc A: short tail's only neighbor is bad -> demoted; main = block 0
    assert (a["n_blocks"], a["n_good"], a["n_bad"], a["n_promoted"]) == (3, 1, 2, 0)
    assert a["main_text"] == "the cat sat on the mat and the dog too"
    # doc B: short tail promoted by its good neighbor, kept in order
    assert (b["n_blocks"], b["n_good"], b["n_promoted"]) == (2, 2, 1)
    assert b["main_text"] == "the cat sat on the mat and the dog too a tail is"
