"""robots.txt parsing — raw fetched body → rules row, fully JVM-side.

Completes the robots path: fetched robots.txt bodies become the
(host, disallow_prefixes, crawl_delay) table that
:func:`crawler_spark.operators.robots.gate_tag` consumes. (North-rule
component; the reference crawls only Common Crawl's own servers and
ships no robots handling.)

Semantics (RFC 9309, simplified to the wildcard agent — documented
subset, same as most large-crawl pipelines' first gate):
- groups are runs of ``User-agent:`` lines followed by rules; a group
  applies when ANY of its agent lines is ``*``;
- ``Disallow:`` with a non-empty value appends a prefix; empty
  ``Disallow:`` means allow-all (adds nothing);
- ``Crawl-delay:`` (non-standard but ubiquitous) — last applicable
  value wins; non-numeric values are ignored;
- comments (``#`` to end of line), blank lines, ``\\r`` and
  surrounding whitespace are tolerated; keys are case-insensitive;
- rules before any ``User-agent:`` line belong to no group (ignored).

Implementation: one ``F.aggregate`` fold over the split lines with a
struct accumulator — a per-row O(lines) JVM pass, no Python UDF, no
shuffle; parsing 10^8 robots bodies is a pure map stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _clean_lines(txt: Column) -> Column:
    """Lines with comments stripped and whitespace/CR trimmed.

    ``F.trim`` strips only spaces; robots bodies use CRLF endings, so
    trim the full whitespace class like Python's ``str.strip``.
    """
    return F.transform(
        F.split(txt, "\n"),
        lambda ln: F.regexp_replace(
            F.regexp_replace(ln, "#.*", ""), r"^\s+|\s+$", ""
        ),
    )


def _key(ln: Column) -> Column:
    """Lowercased record key (text before the first colon)."""
    return F.lower(F.trim(F.substring_index(ln, ":", 1)))


def _val(ln: Column) -> Column:
    """Record value: text after the FIRST colon (values may themselves
    contain colons, e.g. "Disallow: /a:b" or a sitemap URL)."""
    return F.trim(F.regexp_replace(ln, "^[^:]*:", ""))


def parse_robots(txt: Column) -> Column:
    """struct(disallow_prefixes array<string>, crawl_delay double) for
    the ``*`` agent. NULL input → empty rules (allow everything)."""
    key, val = _key, _val

    def step(acc, ln):
        k, v = key(ln), val(ln)
        is_ua = k == "user-agent"
        # a UA line after a rule line opens a NEW group header
        new_applies = F.when(
            is_ua & acc["in_header"], acc["applies"] | (v == "*")
        ).otherwise(v == "*")
        applies = F.when(is_ua, new_applies).otherwise(acc["applies"])
        in_header = is_ua
        add_prefix = (
            ~is_ua
            & acc["applies"]
            & (k == "disallow")
            & (F.length(v) > 0)
        )
        prefixes = F.when(
            add_prefix, F.array_append(acc["prefixes"], v)
        ).otherwise(acc["prefixes"])
        num = F.when(
            ~is_ua & acc["applies"] & (k == "crawl-delay"),
            v.try_cast("double"),
        )
        delay = F.coalesce(num, acc["delay"])
        return F.struct(
            in_header.alias("in_header"),
            applies.alias("applies"),
            prefixes.alias("prefixes"),
            delay.alias("delay"),
        )

    init = F.struct(
        F.lit(False).alias("in_header"),
        F.lit(False).alias("applies"),
        F.array().cast("array<string>").alias("prefixes"),
        F.lit(None).cast("double").alias("delay"),
    )
    folded = F.aggregate(
        F.filter(_clean_lines(F.coalesce(txt, F.lit(""))), lambda ln: F.length(ln) > 0),
        init,
        step,
        lambda acc: F.struct(
            acc["prefixes"].alias("disallow_prefixes"),
            acc["delay"].alias("crawl_delay"),
        ),
    )
    return folded


def robots_from_bodies(
    df: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """(host, disallow_prefixes, crawl_delay) — the exact shape
    operators/robots.gate_tag consumes."""
    parsed = parse_robots(F.col(body_col))
    return df.select(
        F.col(host_col).alias("host"),
        parsed["disallow_prefixes"].alias("disallow_prefixes"),
        parsed["crawl_delay"].alias("crawl_delay"),
    )


def parse_robots_group(txt: Column, agent: str | None = None) -> Column:
    """``struct(rules array<struct<pattern,allow>>, crawl_delay double)``
    — the Allow AND Disallow rules plus the crawl-delay of the group
    applying to ``agent``, in ONE fold (the full RFC 9309 rule set;
    :func:`parse_robots` stays the cheap prefix-only gate).

    Group selection per RFC 9309 §2.2.1: with ``agent`` given, groups
    whose ``User-agent`` token equals it case-insensitively are the
    MOST SPECIFIC match and, if ANY exists, only their rules AND
    crawl-delay apply — even when they contain no rules (an
    addressed-but-empty group means allow-all, NOT fall back to ``*``).
    Otherwise the ``*`` groups apply. ``agent=None`` selects the ``*``
    groups directly. Token matching is exact equality (the spec's
    product-token match; we do not implement Google's longest-prefix
    extension).

    Same line tolerance as :func:`parse_robots`; empty-value rules are
    ignored per the de-facto standard (an empty Disallow is allow-all,
    an empty Allow matches nothing); non-numeric Crawl-delay values are
    ignored, last applicable wins.
    """
    key, val = _key, _val
    agent_lc = agent.lower() if agent is not None else None

    def step(acc, ln):
        k, v = key(ln), val(ln)
        is_ua = k == "user-agent"
        star_hit = v == "*"
        exact_hit = (
            F.lit(False) if agent_lc is None else (F.lower(v) == agent_lc)
        )

        def applies(prev, hit):
            grown = F.when(is_ua & acc["in_header"], prev | hit).otherwise(hit)
            return F.when(is_ua, grown).otherwise(prev)

        ap_star = applies(acc["star_on"], star_hit)
        ap_exact = applies(acc["exact_on"], exact_hit)
        saw_exact = acc["saw_exact"] | (is_ua & exact_hit)

        is_rule = ~is_ua & (F.length(v) > 0) & ((k == "allow") | (k == "disallow"))
        entry = F.struct(v.alias("pattern"), (k == "allow").alias("allow"))
        num = v.try_cast("double")

        def collect(prev, on):
            return F.when(is_rule & on, F.array_append(prev, entry)).otherwise(prev)

        def delay(prev, on):
            return F.coalesce(
                F.when(~is_ua & on & (k == "crawl-delay"), num), prev
            )

        return F.struct(
            is_ua.alias("in_header"),
            ap_star.alias("star_on"),
            ap_exact.alias("exact_on"),
            saw_exact.alias("saw_exact"),
            collect(acc["star_rules"], acc["star_on"]).alias("star_rules"),
            collect(acc["exact_rules"], acc["exact_on"]).alias("exact_rules"),
            delay(acc["star_delay"], acc["star_on"]).alias("star_delay"),
            delay(acc["exact_delay"], acc["exact_on"]).alias("exact_delay"),
        )

    init = F.struct(
        F.lit(False).alias("in_header"),
        F.lit(False).alias("star_on"),
        F.lit(False).alias("exact_on"),
        F.lit(False).alias("saw_exact"),
        F.array().cast(RULES_TYPE).alias("star_rules"),
        F.array().cast(RULES_TYPE).alias("exact_rules"),
        F.lit(None).cast("double").alias("star_delay"),
        F.lit(None).cast("double").alias("exact_delay"),
    )
    return F.aggregate(
        F.filter(
            _clean_lines(F.coalesce(txt, F.lit(""))),
            lambda ln: F.length(ln) > 0,
        ),
        init,
        step,
        lambda acc: F.struct(
            F.when(acc["saw_exact"], acc["exact_rules"])
            .otherwise(acc["star_rules"])
            .alias("rules"),
            F.when(acc["saw_exact"], acc["exact_delay"])
            .otherwise(acc["star_delay"])
            .alias("crawl_delay"),
        ),
    )


def parse_robots_rules(txt: Column, agent: str | None = None) -> Column:
    """``array<struct<pattern string, allow boolean>>`` — the rules
    component of :func:`parse_robots_group` (see there for the group
    selection semantics)."""
    return parse_robots_group(txt, agent)["rules"]


RULES_TYPE = "array<struct<pattern:string,allow:boolean>>"

_ESCAPE = "\\"


def robots_like_pattern(p: Column) -> Column:
    """robots path pattern → SQL ``LIKE`` pattern (escape ``\\``).

    RFC 9309 special characters: ``*`` matches any character run
    (→ ``%``) and a trailing ``$`` anchors the end of the path
    (→ no trailing ``%``); everything else is literal, so LIKE's own
    metacharacters (``%`` ``_`` and the escape char) are escaped.
    Patterns match from the START of the path — exactly LIKE's
    full-string anchoring once the trailing ``%`` is appended.
    """
    esc = F.replace(p, F.lit(_ESCAPE), F.lit(_ESCAPE * 2))
    esc = F.replace(esc, F.lit("%"), F.lit(_ESCAPE + "%"))
    esc = F.replace(esc, F.lit("_"), F.lit(_ESCAPE + "_"))
    esc = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(
        p.endswith("$"), F.substring(esc, F.lit(1), F.length(esc) - 1)
    ).otherwise(F.concat(esc, F.lit("%")))


def rfc9309_match(path: Column, rules: Column) -> Column:
    """``struct(allowed boolean, rule string)`` — the RFC 9309 verdict
    for ``path`` under ``rules`` (parse_robots_rules output).

    Precedence (RFC 9309 §2.2.2, same as Google's robots.cc): the
    matching rule with the LONGEST raw pattern wins; a length tie goes
    to the least-restrictive rule (allow). No matching rule → allowed,
    NULL rule. The struct ``array_max`` encodes exactly that order:
    (pattern length, allow flag, pattern) compared field-by-field —
    the trailing pattern field only breaks same-length-same-verdict
    ties deterministically.
    """
    matched = F.filter(
        rules,
        lambda r: F.like(path, robots_like_pattern(r["pattern"]), F.lit(_ESCAPE)),
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                F.length(r["pattern"]).alias("l"),
                r["allow"].alias("allow"),
                r["pattern"].alias("pattern"),
            ),
        )
    )
    return F.struct(
        F.coalesce(best["allow"], F.lit(True)).alias("allowed"),
        best["pattern"].alias("rule"),
    )


def robots_rules_from_bodies(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    agent: str | None = None,
) -> DataFrame:
    """(host, rules) — the shape operators/robots.gate_rfc9309 consumes.
    ``agent`` selects the most-specific group (see parse_robots_rules)."""
    return df.select(
        F.col(host_col).alias("host"),
        parse_robots_rules(F.col(body_col), agent=agent).alias("rules"),
    )


def robots_rfc9309_from_bodies(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    agent: str | None = None,
) -> DataFrame:
    """(host, rules, crawl_delay) — the full-RFC robots table the
    frontier's ``robots_mode='rfc9309'`` consumes: wildcard Allow/
    Disallow rules for the gate plus the crawl-delay the politeness
    budget derives from. ONE fold per body, and both come from the SAME
    selected group — with ``agent`` given, an exact-agent group's
    crawl-delay applies, never the inapplicable ``*`` group's."""
    g = parse_robots_group(F.col(body_col), agent=agent)
    return df.select(
        F.col(host_col).alias("host"),
        g["rules"].alias("rules"),
        g["crawl_delay"].alias("crawl_delay"),
    )


def robots_sitemaps(txt: Column) -> Column:
    """``array<string>`` of ``Sitemap:`` URLs from a robots body — the
    discovery link into sources/sitemap.parse_sitemaps. Per
    sitemaps.org / RFC 9309 the record is standalone (independent of
    user-agent groups), so this is a pure filter+map over the cleaned
    lines — no fold. Case-insensitive key; values keep their own
    colons (https://...)."""
    lines = _clean_lines(F.coalesce(txt, F.lit("")))
    # the colon-present + non-empty-value guards mirror parse_robots's
    # Disallow handling: a bare 'sitemap' line or a valueless record
    # must not surface as a fetchable "URL"
    return F.transform(
        F.filter(
            lines,
            lambda ln: (F.instr(ln, ":") > 0)
            & (_key(ln) == "sitemap")
            & (F.length(_val(ln)) > 0),
        ),
        _val,
    )
