"""Tests for the round-4 batch: URL template mining (DUST census),
Broder containment pairs, and temperature-sampled language budgets."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from crawler_spark.operators.mixing import (
    TEMP_BUDGET,
    lang_temperature_allocation,
)
from crawler_spark.operators.textdedup import containment_pairs
from crawler_spark.operators.urlmining import url_templates


# ------------------------------------------------------------- templates --


def test_url_templates_census_and_trap_flag(spark):
    urls = (
        [f"https://a.com/product/{i}/view" for i in range(120)]
        + [f"https://b.com/product/{i}/view" for i in range(5)]
        + [
            "https://a.com/session/0123456789abcdef/cart",
            "https://a.com/about",
            "https://a.com/about",
        ]
    )
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = {r["template"]: r for r in url_templates(df, trap_min_urls=100).collect()}

    prod = rows["/product/{N}/view"]
    assert prod["n_urls"] == 125
    assert prod["n_hosts"] == 2
    assert prod["is_parametric"] and prod["trap_flag"]
    assert prod["sample_url"] == "https://a.com/product/0/view"

    sess = rows["/session/{X}/cart"]
    assert sess["n_urls"] == 1 and sess["is_parametric"] and not sess["trap_flag"]

    about = rows["/about"]
    assert about["n_urls"] == 2
    assert not about["is_parametric"] and not about["trap_flag"]


def test_url_templates_hex_rule_precedes_digit_rule(spark):
    # a 16-digit run is also a 16-hex run -> must become {X}, not {N}
    df = spark.createDataFrame(
        [("https://h.com/t/1234567890123456/x",), ("https://h.com/t/123/x",)],
        ["url"],
    )
    got = {r["template"] for r in url_templates(df).collect()}
    assert got == {"/t/{X}/x", "/t/{N}/x"}


def test_url_templates_root_path_normalizes_to_slash(spark):
    df = spark.createDataFrame([("https://h.com",), ("https://h.com/",)], ["url"])
    rows = url_templates(df).collect()
    assert len(rows) == 1 and rows[0]["template"] == "/"
    assert rows[0]["n_urls"] == 2


# ----------------------------------------------------------- containment --


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_containment_detects_partial_copy(spark):
    core = " ".join(f"w{i}" for i in range(40))
    hdr = " ".join(f"hdr{i}" for i in range(8))
    ftr = " ".join(f"ftr{i}" for i in range(8))
    wrapper = hdr + " " + core + " " + ftr
    other = " ".join(f"z{i}" for i in range(40))
    df = _mk_docs(spark, [core, wrapper, other])
    rows = containment_pairs(df, threshold_pm=800).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (0, 1)
    # every shingle of the core appears in the wrapper
    assert r["cont_a_pm"] == 1000
    assert r["cont_b_pm"] < 1000
    assert r["relation"] == "a_in_b"


def test_containment_symmetric_duplicate_classified_near_dup(spark):
    text = " ".join(f"t{i}" for i in range(30))
    df = _mk_docs(spark, [text, text])
    rows = containment_pairs(df).collect()
    assert len(rows) == 1
    assert rows[0]["relation"] == "near_dup"
    assert rows[0]["cont_a_pm"] == rows[0]["cont_b_pm"] == 1000


def test_containment_restricted_to_lsh_candidates(spark):
    # disjoint vocab -> no LSH candidates -> no pairs even to inspect
    a = " ".join(f"a{i}" for i in range(30))
    b = " ".join(f"b{i}" for i in range(30))
    df = _mk_docs(spark, [a, b])
    assert containment_pairs(df).count() == 0


# ------------------------------------------------------------ temperature --


def _alloc(spark, counts, budget=TEMP_BUDGET):
    rows = [(lang, i) for lang, n in counts.items() for i in range(n)]
    docs = spark.createDataFrame(rows, ["lang", "doc_id"])
    return {
        r["lang"]: r
        for r in lang_temperature_allocation(docs, budget=budget).collect()
    }


def test_temperature_budget_sums_exactly_and_flattens(spark):
    counts = {"en": 900, "de": 100, "sw": 9}
    got = _alloc(spark, counts)
    assert sum(r["budget_docs"] for r in got.values()) == TEMP_BUDGET
    for lang, n in counts.items():
        assert got[lang]["weight"] == math.isqrt(n)
        assert got[lang]["n_docs"] == n
    # α=1/2 flattens: head boosted below 1000pm, tail above
    assert got["en"]["boost_pm"] < 1000
    assert got["sw"]["boost_pm"] > 1000


def test_temperature_largest_remainder_determinism(spark):
    # weights 3,3,3 over budget 10: base 3 each, leftover 1 goes to the
    # lexicographically-first lang on the remainder tie
    got = _alloc(spark, {"aa": 9, "bb": 9, "cc": 9}, budget=10)
    assert [got[k]["budget_docs"] for k in ("aa", "bb", "cc")] == [4, 3, 3]


def test_temperature_isqrt_exact_at_perfect_squares(spark):
    got = _alloc(spark, {"x": 49, "y": 50, "z": 48}, budget=100)
    assert got["x"]["weight"] == 7
    assert got["y"]["weight"] == 7
    assert got["z"]["weight"] == 6
