"""URL path-template mining — DUST-style parametric-URL discovery.

Bar-Yossef, Keidar, Schonfeld, "Do not crawl in the DUST: different
URLs with similar text" (WWW 2007, public) mine rewrite rules from URL
collections; the operational core every production crawler ships
(Heritrix's queue budgets, Nutch's URL normalizers) is the cheaper
template census implemented here: normalize the variable parts of a
path (numeric ids, long hex session tokens) into placeholders, then
count URLs per (template). A parametric template backed by a huge URL
population is simultaneously

- a crawl-trap candidate (calendar pages, session-id explosions) for
  the frontier's demotion tier (operators/trapdetect.py), and
- a dedup prior: DUST rules say members of one template usually carry
  near-identical text, so template census feeds the MinHash verifier
  a cheap pre-filter.

Reference anchor: the reference crawler's per-domain page caps
(src/crawler.py max_pages_per_domain) are the blunt form of this —
template granularity is the refinement that distinguishes a deep site
from a parametric trap on the same host.

Scale shape: ONE regexp_replace projection (JVM codegen) + one
partial-agg groupBy(template). Output is bounded by distinct templates
(≪ URLs); no joins, no windows, no Python. The normalization regexes
are RE2-/Java-portable so the DuckDB twin applies the identical rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Hex runs first (a 16-digit run is also a hex run — both engines apply
# the same order so the rule is deterministic), then any digit run.
HEX_RUN = "[0-9a-f]{16,}"
NUM_RUN = "[0-9]+"
# A parametric template with at least this many member URLs is flagged
# as a trap candidate for the frontier's demotion tier.
TRAP_MIN_URLS = 100


def path_template(path: Column) -> Column:
    """Normalize the variable parts of a URL path into placeholders."""
    return F.regexp_replace(
        F.regexp_replace(path, HEX_RUN, "{X}"), NUM_RUN, "{N}"
    )


def url_templates(
    urls: DataFrame, url_col: str = "url", trap_min_urls: int = TRAP_MIN_URLS
) -> DataFrame:
    """(template, n_urls, n_hosts, sample_url, is_parametric, trap_flag)
    — the DUST-style template census over a URL collection.

    ``sample_url`` is min(url) (deterministic representative);
    ``is_parametric`` marks templates containing a placeholder;
    ``trap_flag`` marks parametric templates whose URL population is
    ``trap_min_urls`` or larger.
    """
    u = F.col(url_col)
    host = F.regexp_extract(u, r"^https?://([^/]+)", 1)
    raw_path = F.regexp_extract(u, r"^https?://[^/]*(/.*)?$", 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    t = urls.select(
        u.alias("url"), host.alias("host"), path_template(path).alias("template")
    )
    agg = t.groupBy("template").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("host").alias("n_hosts"),
        F.min("url").alias("sample_url"),
    )
    is_param = F.col("template").contains("{")
    return agg.select(
        "template",
        "n_urls",
        "n_hosts",
        "sample_url",
        is_param.alias("is_parametric"),
        (is_param & (F.col("n_urls") >= trap_min_urls)).alias("trap_flag"),
    )


def synth_urls(docs: DataFrame) -> DataFrame:
    """Deterministic URL collection from the documents table (same
    closed-form synthesis discipline as url_param_strip): five path
    shapes — two sharing the /product/{N} family, a 16-hex session
    token, a dated blog archive, and a static page."""
    ids = F.col("doc_id").cast("string")
    host = F.concat(F.lit("site"), (F.col("doc_id") % 37).cast("string"),
                    F.lit(".example.com"))
    tok = F.substring(F.md5(ids), 1, 16)
    m = F.col("doc_id") % 5
    path = (
        F.when(m == 0, F.concat(F.lit("/product/"), ids, F.lit("/view")))
        .when(m == 1, F.concat(F.lit("/product/"), ids, F.lit("/reviews")))
        .when(m == 2, F.concat(F.lit("/session/"), tok, F.lit("/cart")))
        .when(
            m == 3,
            F.concat(
                F.lit("/blog/"), (2020 + F.col("doc_id") % 5).cast("string"),
                F.lit("/"), (1 + F.col("doc_id") % 12).cast("string"),
                F.lit("/post-"), ids,
            ),
        )
        .otherwise(F.lit("/about"))
    )
    return docs.select(
        F.concat(F.lit("https://"), host, path).alias("url")
    )


def url_templates_over_documents(docs: DataFrame) -> DataFrame:
    """Driver query: template census over the synthesized collection."""
    return url_templates(synth_urls(docs))
