"""Seeded batch fuzz of the parser-heavy operators against independent
Python references — hundreds of generated cases evaluated in ONE
DataFrame each (no per-case Spark round trips).

- robots wildcard matching (functions/robots_parse.rfc9309_match) vs a
  regex-based Python implementation of RFC 9309 §2.2.2;
- RFC 3986 reference resolution (functions/links.resolve_ref) vs
  CPython's urllib.parse.urljoin (fragments stripped);
- tracking-parameter stripping vs a Python split/filter reference;
- sliding-window chunk arithmetic vs closed-form expectations;
- robots agent-group selection (rules AND crawl-delay from the SAME
  selected group) over multi-group bodies.

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


# ---------------------------------------------------------- param strip --

def test_fuzz_strip_tracking_params(spark):
    from crawler_spark.functions.url import TRACKING_PARAM_RX, strip_tracking_params

    rng = random.Random(77)
    track = ["utm_source=x", "utm_campaign=a%20b", "fbclid=1", "gclid=zz",
             "jsessionid=deadbeef", "mc_eid=7"]
    keep = ["id=7", "q=utm_source", "page=2", "a=1?b", "ref=branch", "sid=9",
            "UTM=shout", "x="]

    def expected(url):
        if "?" not in url:
            return url, 0
        base, q = url.split("?", 1)
        params = q.split("&")
        kept = [p for p in params if not re.match(TRACKING_PARAM_RX, p.lower())]
        out = base + ("?" + "&".join(kept) if kept else "")
        return out, len(params) - len(kept)

    cases = []
    for i in range(250):
        url = "https://h/p" + str(i)
        if rng.random() < 0.85:
            nparams = rng.randint(1, 6)
            url += "?" + "&".join(
                rng.choice(track if rng.random() < 0.5 else keep)
                for _ in range(nparams)
            )
        exp_url, exp_n = expected(url)
        cases.append((i, url, exp_url, exp_n))

    df = spark.createDataFrame(cases, "i int, u string, eu string, en int")
    s = strip_tracking_params(F.col("u"))
    bad = df.where(
        (s["url"] != F.col("eu")) | (s["n_stripped"] != F.col("en"))
    ).select("u", "eu", s["url"].alias("got")).collect()
    assert not bad, [tuple(r) for r in bad[:5]]


# ------------------------------------------------------------- chunking --

def test_fuzz_chunk_text(spark):
    from crawler_spark.operators.chunking import chunk_text

    rng = random.Random(40)
    window, stride = 7, 5

    def expected(nwords):
        n_chunks = max(-(-max(nwords - (window - stride), 1) // stride), 1)
        out = []
        for i in range(n_chunks):
            start = i * stride
            out.append((i, start, min(window, nwords - start)))
        return out

    rows = [(i, " ".join(f"w{j}" for j in range(rng.randint(1, 40))))
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, list] = {}
    for r in chunk_text(df, window, stride).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["word_start"], r["n_words"])
        )
    for doc_id, text in rows:
        exp = expected(len(text.split(" ")))
        assert sorted(got[doc_id]) == exp, (doc_id, text)


# ------------------------------------------------- robots group selection --

def test_fuzz_robots_group_selection(spark):
    """Multi-group bodies with agent-specific groups: rules AND
    crawl-delay must come from the selected group."""
    from crawler_spark.functions.robots_parse import parse_robots_group

    rng = random.Random(2231)
    agents = ["mybot", "otherbot", "*"]

    cases = []
    for i in range(150):
        groups = []
        for _ in range(rng.randint(1, 3)):
            ua = rng.choice(agents)
            nrules = rng.randint(0, 3)
            rules = [
                ("/p" + str(rng.randint(0, 9)), rng.random() < 0.5)
                for _ in range(nrules)
            ]
            delay = rng.choice([None, 1.5, 7.0])
            groups.append((ua, rules, delay))
        body_parts = []
        for ua, rules, delay in groups:
            body_parts.append(f"User-agent: {ua}")
            for p, allow in rules:
                body_parts.append(("Allow: " if allow else "Disallow: ") + p)
            if delay is not None:
                body_parts.append(f"Crawl-delay: {delay}")
            body_parts.append("x-sep: 1")  # rule-ish line terminates the header run
        body = "\n".join(body_parts)

        # python reference: exact 'mybot' groups if any, else '*' groups;
        # note consecutive UA headers merge (handled here by our
        # generator always terminating groups with a non-UA line)
        exact = [g for g in groups if g[0] == "mybot"]
        chosen = exact if exact else [g for g in groups if g[0] == "*"]
        exp_rules = [r for g in chosen for r in g[1]]
        exp_delay = None
        for g in chosen:
            if g[2] is not None:
                exp_delay = g[2]
        cases.append((i, body, exp_rules, exp_delay))

    df = spark.createDataFrame(
        [(i, b) for i, b, _, _ in cases], "i int, body string"
    )
    g = parse_robots_group(F.col("body"), agent="mybot")
    got = {
        r["i"]: (
            [(x["pattern"], x["allow"]) for x in r["rules"]],
            r["crawl_delay"],
        )
        for r in df.select("i", g["rules"].alias("rules"),
                           g["crawl_delay"].alias("crawl_delay")).collect()
    }
    for i, _, exp_rules, exp_delay in cases:
        assert got[i] == (exp_rules, exp_delay), (i, cases[i][1])
