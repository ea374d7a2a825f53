"""TF-IDF top-terms operator vs a row-at-a-time Python twin."""

from __future__ import annotations

from collections import Counter

from crawler_spark.functions.textstats import STOPWORDS
from crawler_spark.operators.termstats import IDF_SCALE, tfidf_top_terms


def _py_tfidf_topk(rows, k):
    n_docs = len(rows)
    tf: Counter = Counter()
    df_docs: dict[str, set] = {}
    for doc_id, source, text in rows:
        for term in text.split(" "):
            if term in STOPWORDS or term == "":
                continue
            tf[(source, term)] += 1
            df_docs.setdefault(term, set()).add(doc_id)
    scored = {}
    for (source, term), f in tf.items():
        idf = (n_docs * IDF_SCALE) // len(df_docs[term])
        scored.setdefault(source, []).append(
            (term, f, len(df_docs[term]), idf, float(f) * float(idf))
        )
    out = set()
    for source, terms in scored.items():
        terms.sort(key=lambda t: (-t[4], t[0]))
        for term, f, df, idf, score in terms[:k]:
            out.add((source, term, f, df, idf, score))
    return out


def test_tfidf_matches_python_twin(spark):
    rows = [
        (0, "a", "spark shuffles the big corpus and spark wins"),
        (1, "a", "spark spark spark pipeline"),
        (2, "b", "the corpus of ducks quacks in rows"),
        (3, "b", "ducks ducks pipeline rows rows rows"),
        (4, "c", "a single unique zebra"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["source"], r["term"], r["tf"], r["df"], r["idf_ppm"], r["score"])
        for r in tfidf_top_terms(df, k=3).collect()
    }
    assert got == _py_tfidf_topk(rows, 3)
    # stopwords never surface
    assert not any(t[1] in STOPWORDS for t in got)
    # the source-unique term dominates its slice
    zebra = [t for t in got if t[0] == "c" and t[1] == "zebra"]
    assert zebra and zebra[0][3] == 1  # df = 1
