"""Robots gating (north-rule component; no reference counterpart —
the reference only crawls Common Crawl's own servers).

Candidates carry (host, path); the robots table is one row per host:
(host, disallow_prefixes array<string>, crawl_delay double). The gate is
a join + an ``exists`` over the prefix array — all JVM-side.

Scale: the robots table is one row per *host* (~10^7-10^8 rows at CC scale
— small next to a 10^10 frontier). It broadcasts when it fits, else the
join shuffles on host, which the politeness window reuses.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class GateResult:
    allowed: DataFrame
    blocked: DataFrame


def gate_tag(
    candidates: DataFrame,
    robots: DataFrame | None,
    host_col: str = "host",
    path_col: str = "path",
    broadcast: bool = True,
    flag_col: str = "_blocked",
) -> DataFrame:
    """Tag candidates with the robots verdict instead of splitting.

    One pass; the caller filters on ``flag_col`` (and typically caches the
    tagged frame so both branches read one materialization). Unknown hosts
    are allowed; ``crawl_delay`` rides along for the budget derivation.
    """
    if robots is None:
        return candidates.withColumns(
            {flag_col: F.lit(False), "crawl_delay": F.lit(None).cast("double")}
        )
    r = robots.select(
        F.col("host").alias("_r_host"),
        F.col("disallow_prefixes").alias("_r_prefixes"),
        F.col("crawl_delay").alias("crawl_delay"),
    )
    if broadcast:
        r = F.broadcast(r)
    joined = candidates.join(r, F.col(host_col) == F.col("_r_host"), "left")
    is_blocked = F.coalesce(
        F.exists(
            F.col("_r_prefixes"),
            lambda p: F.col(path_col).startswith(p),
        ),
        F.lit(False),
    )
    return joined.withColumn(flag_col, is_blocked).drop("_r_host", "_r_prefixes")


def gate(
    candidates: DataFrame,
    robots: DataFrame | None,
    host_col: str = "host",
    path_col: str = "path",
    broadcast: bool = True,
) -> GateResult:
    """Split candidates by robots rules; unknown hosts are allowed.

    The blocked side keeps a ``block_reason`` column for the failures
    table (lineage: which rule family dropped the row).
    """
    tagged = gate_tag(candidates, robots, host_col, path_col, broadcast)
    allowed = tagged.where(~F.col("_blocked")).drop("_blocked")
    blocked = (
        tagged.where(F.col("_blocked"))
        .drop("_blocked", "crawl_delay")
        .withColumn("block_reason", F.lit("robots_disallow"))
    )
    return GateResult(allowed=allowed, blocked=blocked)


def gate_rfc9309(
    candidates: DataFrame,
    rules_table: DataFrame | None,
    host_col: str = "host",
    path_col: str = "path",
    broadcast: bool = True,
) -> DataFrame:
    """Full-RFC 9309 robots verdict per candidate: wildcard (``*``) and
    end-anchor (``$``) patterns, Allow AND Disallow, longest-match
    precedence with allow winning length ties.

    ``rules_table`` is (host, rules) from
    functions/robots_parse.robots_rules_from_bodies. Adds ``allowed``
    (boolean) and ``rule`` (the winning pattern, NULL when no rule
    matched). Unknown hosts are allowed. Same join shape as
    :func:`gate_tag`: per-host rules broadcast when they fit, else a
    host-keyed shuffle the politeness window reuses; the match itself
    is a per-row JVM array fold — rules arrays are per-host and small,
    so the LIKE-per-rule cost is O(rules) per candidate, no UDF.
    """
    from crawler_spark.functions.robots_parse import RULES_TYPE, rfc9309_match

    if rules_table is None:
        return candidates.withColumns(
            {
                "allowed": F.lit(True),
                "rule": F.lit(None).cast("string"),
                "crawl_delay": F.lit(None).cast("double"),
            }
        )
    # crawl_delay rides along when the table carries it (the frontier's
    # rfc9309 mode derives the politeness budget from it, same as
    # gate_tag's contract). The '_r_' alias keeps the join unambiguous
    # even when the candidates already carry a crawl_delay column; the
    # gate's output column then REPLACES it (documented contract: the
    # gate owns crawl_delay, like gate_tag).
    has_delay = "crawl_delay" in rules_table.columns
    cols = [F.col("host").alias("_r_host"), F.col("rules").alias("_r_rules")]
    if has_delay:
        cols.append(F.col("crawl_delay").alias("_r_delay"))
    r = rules_table.select(*cols)
    if broadcast:
        r = F.broadcast(r)
    joined = candidates.join(r, F.col(host_col) == F.col("_r_host"), "left")
    delay = F.col("_r_delay") if has_delay else F.lit(None).cast("double")
    v = rfc9309_match(
        F.col(path_col),
        F.coalesce(F.col("_r_rules"), F.array().cast(RULES_TYPE)),
    )
    out = (
        joined.withColumn("allowed", v["allowed"])
        .withColumn("rule", v["rule"])
        .withColumn("crawl_delay", delay)
        .drop("_r_host", "_r_rules")
    )
    return out.drop("_r_delay") if has_delay else out


def budget_from_crawl_delay(df: DataFrame, round_duration_s: float, default_budget: int) -> DataFrame:
    """Derive a per-host budget column from robots crawl_delay:
    at most round_duration/delay fetches per round (≥1), else default."""
    return df.withColumn(
        "host_budget",
        F.when(
            F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") > 0),
            F.greatest(
                F.lit(1),
                F.floor(F.lit(round_duration_s) / F.col("crawl_delay")).cast("int"),
            ),
        ).otherwise(F.lit(default_budget)),
    )
