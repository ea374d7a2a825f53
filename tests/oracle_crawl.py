"""Pure-Python oracle of the frontier loop semantics.

Re-executes the exact contract of crawler_spark.frontier.FrontierCrawler —
same within-frontier dedupe order, same URL-seen policy, same robots gate,
same per-host budget and admission order, same retry policy — row at a
time over plain dicts/sets, so the distributed loop can be compared
round-by-round (admitted schedules) and at the end (URL-seen set)."""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, replace

from crawler_spark.functions.url import canonicalize_one


def rfc9309_allowed(path: str, rules: list[tuple[str, bool]]) -> bool:
    """Independent RFC 9309 §2.2.2 verdict (regex-based, no Spark):
    longest raw matching pattern wins, allow wins length ties, no match
    → allowed. Same reference logic as tests/test_fuzz_parsers._py_match
    (duplicated on purpose: the loop oracle must not import from another
    test module)."""
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


@dataclass(frozen=True)
class Row:
    url: str
    surt: str
    host: str
    path: str
    depth: int
    priority: float
    failure_count: int = 0


def canon_rows(urls_with_priority, depth):
    out = []
    for url, prio in urls_with_priority:
        c = canonicalize_one(url)
        if c["surt"] is None:
            continue
        out.append(Row(url, c["surt"], c["host"], c["path"], depth, float(prio)))
    return out


def oracle_crawl(
    seeds: list[tuple[int, str]],
    page_urls: set[str],
    links: dict[str, list[str]],
    robots: dict[str, tuple[list[str], float | None]],
    budget: int,
    max_attempts: int,
    rounds: int,
    round_duration_s: float = 30.0,
    robots_mode: str = "prefix",
):
    """Returns (admitted_schedule_per_round, final_seen_set, results_urls_any_fetch).

    robots_mode='prefix' (reference parity): ``robots`` maps host →
    (disallow_prefixes, crawl_delay). robots_mode='rfc9309': host →
    (rules, crawl_delay) with rules = [(pattern, allow), ...]; the gate
    is :func:`rfc9309_allowed` (wildcards, $-anchor, longest-match,
    allow-wins-ties) — the oracle twin of operators/robots.gate_rfc9309."""
    frontier = canon_rows([(u, -sid) for sid, u in seeds], 0)
    seen: set[str] = set()
    schedules: list[list[Row]] = []
    fetched_all: list[str] = []

    for r in range(1, rounds + 1):
        if not frontier:
            break
        # 1. within-frontier dedupe per surt: (priority desc, failure_count desc, url asc)
        best: dict[str, Row] = {}
        for row in sorted(frontier, key=lambda x: (-x.priority, -x.failure_count, x.url)):
            best.setdefault(row.surt, row)
        candidates = list(best.values())
        # 2. seen filter
        unseen = [c for c in candidates if c.surt not in seen]
        # 3. robots gate + crawl_delay budget
        allowed, budgets = [], {}
        for c in unseen:
            rules, delay = robots.get(c.host, ([], None))
            if robots_mode == "rfc9309":
                if not rfc9309_allowed(c.path, rules):
                    continue
            elif any(c.path.startswith(p) for p in rules):
                continue
            allowed.append(c)
            if delay is not None and delay > 0:
                budgets[c.host] = max(1, math.floor(round_duration_s / delay))
            else:
                budgets[c.host] = budget
        # 4. per-host admission: (priority desc, surt asc), top-budget
        by_host: dict[str, list[Row]] = {}
        for c in allowed:
            by_host.setdefault(c.host, []).append(c)
        admitted, deferred = [], []
        for h, items in by_host.items():
            items.sort(key=lambda x: (-x.priority, x.surt))
            b = budgets[h]
            admitted += items[:b]
            deferred += items[b:]
        schedules.append(sorted(admitted, key=lambda x: (-x.priority, x.host, x.surt)))
        # 5. fetch
        fetched = [c for c in admitted if c.url in page_urls]
        missing = [c for c in admitted if c.url not in page_urls]
        fetched_all += [c.url for c in fetched]
        # 7. retry policy
        retry = [
            replace(c, failure_count=c.failure_count + 1)
            for c in missing
            if c.failure_count + 1 < max_attempts
        ]
        retry_surts = {c.surt for c in retry}
        # 9. seen += admitted minus retryable
        seen |= {c.surt for c in admitted} - retry_surts
        # 8. next frontier
        dsts = sorted({d for c in fetched for d in links.get(c.url, [])})
        new_rows = canon_rows([(d, -1000.0 * (r + 1)) for d in dsts], r + 1)
        frontier = deferred + retry + new_rows

    return schedules, seen, fetched_all
