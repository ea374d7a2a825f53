"""Seeded batch fuzz of the two north-rule-core parsers against
independent Python references — hundreds of generated cases evaluated
in ONE DataFrame each (no per-case Spark round trips).

- robots wildcard matching (functions/robots_parse.rfc9309_match) vs a
  regex-based Python implementation of RFC 9309 §2.2.2;
- RFC 3986 reference resolution (functions/links.resolve_ref) vs
  CPython's urllib.parse.urljoin (fragments stripped).

Deterministic: random.Random(fixed seed), so failures reproduce.
"""

from __future__ import annotations

import random
import re
from urllib.parse import urldefrag, urljoin

from pyspark.sql import functions as F

from crawler_spark.functions.links import resolve_ref
from crawler_spark.functions.robots_parse import parse_robots_rules, rfc9309_match


# ---------------------------------------------------------------- robots --

def _py_match(path: str, rules: list[tuple[str, bool]]) -> bool:
    """Independent RFC 9309 verdict: longest raw pattern wins, allow
    wins length ties, no match → allowed."""
    best = None  # (len, allow)
    for pattern, allow in rules:
        rx = "^" + re.escape(pattern).replace(r"\*", ".*")
        if rx.endswith(r"\$"):
            rx = rx[:-2] + "$"
        if re.match(rx, path):
            key = (len(pattern), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


def test_fuzz_robots_matching(spark):
    rng = random.Random(9309)
    segs = ["a", "b", "cc", "d1", "%", "_", "x.y"]

    def rand_pattern():
        parts = ["/"]
        for _ in range(rng.randint(0, 3)):
            parts.append(rng.choice(segs + ["*"]))
            if rng.random() < 0.4:
                parts.append("/")
        p = "".join(parts)
        if rng.random() < 0.3:
            p += "$"
        return p

    def rand_path():
        parts = ["/"]
        for _ in range(rng.randint(0, 4)):
            parts.append(rng.choice(segs))
            if rng.random() < 0.5:
                parts.append("/")
        return "".join(parts)

    cases = []
    for i in range(300):
        rules = [
            (rand_pattern(), rng.random() < 0.5)
            for _ in range(rng.randint(1, 5))
        ]
        body = "User-agent: *\n" + "\n".join(
            ("Allow: " if allow else "Disallow: ") + p for p, allow in rules
        )
        path = rand_path()
        cases.append((i, body, path, _py_match(path, rules)))

    df = spark.createDataFrame(
        cases, "i int, body string, path string, expected boolean"
    )
    v = rfc9309_match(F.col("path"), parse_robots_rules(F.col("body")))
    bad = df.where(v["allowed"] != F.col("expected")).collect()
    assert not bad, [(r["i"], r["body"], r["path"], r["expected"]) for r in bad[:3]]


# ------------------------------------------------------------ resolution --

def test_fuzz_reference_resolution(spark):
    rng = random.Random(3986)
    words = ["a", "bb", "c.d", "x%20y", "q_1"]

    def rand_ref():
        kind = rng.random()
        parts = []
        if kind < 0.15:
            parts.append("/")
        elif kind < 0.25:
            parts.append("//h2.example/")
        for _ in range(rng.randint(0, 4)):
            parts.append(rng.choice(words + ["..", "."]))
            parts.append("/")
        if parts and rng.random() < 0.5 and parts[-1] == "/":
            parts.pop()  # sometimes no trailing slash
        ref = "".join(parts)
        if rng.random() < 0.3:
            ref += "?" + rng.choice(words) + "=" + rng.choice(words)
        if rng.random() < 0.2:
            ref += "#frag"
        return ref

    bases = [
        "http://h.example/a/b/c?q=1",
        "https://h.example:8080/deep/path/",
        "https://h.example",
    ]
    cases = []
    for i in range(300):
        base = rng.choice(bases)
        ref = rand_ref()
        cases.append((i, base, ref, urldefrag(urljoin(base, ref))[0]))

    df = spark.createDataFrame(
        cases, "i int, base string, ref string, expected string"
    )
    out = resolve_ref(F.col("base"), F.col("ref"))
    bad = df.where(
        ~(out.eqNullSafe(F.col("expected")))
    ).select("i", "base", "ref", "expected", out.alias("got")).collect()
    assert not bad, [tuple(r) for r in bad[:5]]
