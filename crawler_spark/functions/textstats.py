"""Text-analysis functions for the training-data pipeline tier.

Language-ID (marker-word heuristic), quality scoring, token counting and
document fingerprinting over a ``documents(doc_id, text, ...)`` table.
Everything here is pure built-in column algebra (JVM-side, whole-stage
codegen — no Python in the hot path), and every operator has a matching
ANSI-SQL generator in :mod:`crawler_spark.oracle.sqlgen` for the DuckDB
oracle gate.

Design notes for 100 TB:
- all ops are per-row projections → no shuffle at all; they pipeline into
  whatever scan/filter stage precedes them and parquet column pruning
  keeps only ``text`` in flight;
- occurrence counting uses the replace-length trick instead of regex so
  the same expression is portable AND cheap (no NFA per row);
- the heuristics are deliberately simple, deterministic functions — the
  point at this tier is the *plumbing* (a real pipeline swaps in
  fastText/KenLM via a pandas UDF with the same column contract).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared constants — the SQL generators import these; change them here only.
STOPWORDS = ["the", "a", "of", "and", "in"]

# marker words per language, evaluated in sorted(lang) order with strict
# argmax (ties → alphabetically-first), all-zero → 'und'
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "und", "nicht"],
    "en": ["the", "a", "of"],
    "es": ["el", "los", "una"],
    "fr": ["le", "et", "les"],
    "tr": ["ve", "bir", "bu"],
}

# BPE-ish token regex: letter runs | digit runs | single non-alnum glyph.
# Kept to a subset that Java regex and RE2 (DuckDB) treat identically.
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

FINGERPRINT_NGRAM = 5  # rolling window width for the doc fingerprint


def _padded(text: Column) -> Column:
    return F.concat(F.lit(" "), text, F.lit(" "))


def occurrences(text: Column, word: str) -> Column:
    """# of non-overlapping ' word ' occurrences via the replace-length
    trick — identical semantics in Spark and DuckDB, no regex engine."""
    needle = f" {word} "
    padded = _padded(text)
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def word_count(text: Column) -> Column:
    """Whitespace token count (single-space-delimited corpus)."""
    return F.size(F.split(text, " ")).cast("long")


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish regex tokens (letters run / digits run / glyph)."""
    return F.regexp_count(text, F.lit(TOKEN_REGEX)).cast("long")


def stopword_count(text: Column) -> Column:
    out = F.lit(0).cast("long")
    for w in STOPWORDS:
        out = out + occurrences(text, w)
    return out


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring feature set + composite score and bucket.

    All-integer (per-mille) arithmetic — exact, boundary-proof across
    engines (float rounding rules differ between Spark's HALF_UP
    BigDecimal and DuckDB's decimal-repr rounding at half-boundaries),
    and cheaper than decimal math at 10^10 rows:

      awl_c    = ⌊100·avg_word_len⌋         (centi-chars)
      stop_pm  = ⌊1000·stopwords/words⌋     (per-mille)
      score_pm = min(4·words,400) + min(⌊2000·stop/words⌋,400)
                 + min(⌊awl_c/4⌋,200)        ∈ [0,1000]
      bucket: ≥700 high / ≥400 medium / else low.

    The ⌊·⌋ of a double quotient is safe: numerators stay ≤2^53 (exact)
    and non-divisible quotients sit ≥1/denominator away from integers.
    """
    n_chars = F.length(text).cast("long")
    n_words = word_count(text)
    n_stop = stopword_count(text)
    # single-space corpus: chars = Σ len(word) + (n_words - 1)
    awl_c = F.floor((n_chars - n_words + F.lit(1)) * F.lit(100) / n_words).cast("long")
    stop_pm = F.floor(n_stop * F.lit(1000) / n_words).cast("long")
    score = (
        F.least(n_words * 4, F.lit(400).cast("long"))
        + F.least(F.floor(n_stop * F.lit(2000) / n_words).cast("long"), F.lit(400).cast("long"))
        + F.least(F.floor(awl_c / F.lit(4)).cast("long"), F.lit(200).cast("long"))
    )
    bucket = (
        F.when(score >= 700, F.lit("high"))
        .when(score >= 400, F.lit("medium"))
        .otherwise(F.lit("low"))
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "awl_c": awl_c,
        "stop_pm": stop_pm,
        "quality_score_pm": score,
        "quality_bucket": bucket,
    }


def lang_scores(text: Column) -> dict[str, Column]:
    scores: dict[str, Column] = {}
    for lang in sorted(LANG_MARKERS):
        s = F.lit(0).cast("long")
        for w in LANG_MARKERS[lang]:
            s = s + occurrences(text, w)
        scores[lang] = s
    return scores


def lang_id(text: Column) -> Column:
    """Marker-word language guess: argmax score, ties → first lang in
    sorted order, all-zero → 'und'."""
    scores = lang_scores(text)
    langs = sorted(scores)
    best = F.greatest(*[scores[lang] for lang in langs]) if len(langs) > 1 else scores[langs[0]]
    out = F.lit("und")
    # build the when-chain in REVERSE sorted order so the first (sorted)
    # language with the max score wins the tie
    for lang in reversed(langs):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams as space-joined strings (array column). JVM-side
    higher-order functions — no UDF."""
    words = F.split(text, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    # sequence(1, k) DESCENDS for k < 1 — guard short docs to an empty array
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: min h64 over the rolling FINGERPRINT_NGRAM-word
    windows (a 1-hash MinHash — robust to local edits, unlike a full-text
    md5). Per-row, no shuffle."""
    from crawler_spark.functions.texthash import h64

    grams = word_ngrams(text, FINGERPRINT_NGRAM)
    return F.array_min(F.transform(grams, h64))


def content_md5(text: Column) -> Column:
    """Exact-dup key: md5 of the raw text."""
    return F.md5(text)
