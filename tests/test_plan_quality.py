"""Plan-quality lock: no unplanned nested-loop joins in driver queries.

Every groupBy/join in the driver-query surface is supposed to be a hash
aggregate or a hash join (broadcast or shuffle). A BroadcastNestedLoopJoin
or CartesianProduct sneaking into a scale-path query is the classic
silent 100x regression — this meta-test freezes the current (audited)
plan shapes so a refactor cannot reintroduce one unnoticed.
"""

from __future__ import annotations

import contextlib
import io
import os

import pytest

# Audited exceptions — every entry is a deliberately tiny or documented
# non-scale side:
#   cosine_topk           broadcast of the constant query set (|Q| rows)
#   cosine_neardup_pairs  documented O(n^2) oracle baseline (VERDICT r2);
#                         LSH/IVF/semdedup are the scale routes
#   ann_ivf_topk          probe side: |queries| x ncells literal cross
#   quantize_embeddings   crossJoin(broadcast(1-row per-dim max vector))
#   mix_plan              crossJoin(broadcast(1-row weight total))
#   mix_execute           inherits mix_plan's 1-row weight-total cross
#   ann_recall            inherits cosine_topk's constant-query-set
#                         broadcast (the exact ground-truth side; at
#                         scale it runs on a query SAMPLE by design)
#   ngram_lm_counts       crossJoin(broadcast(1-row corpus token total))
#                         — the unigram backoff denominator
#   bm25_topk             crossJoin(broadcast(1-row sumdl/n_docs totals))
#   priority_sample       crossJoin(broadcast(1-row τ threshold))
#   fair_budget           crossJoin(broadcast(1-row host/demand totals))
ALLOWED_NESTED_LOOP = {
    "cosine_topk",
    "ann_recall",
    "cosine_neardup_pairs",
    "ann_ivf_topk",
    "quantize_embeddings",
    "mix_plan",
    "mix_execute",
    "ngram_lm_counts",
    "bm25_topk",
    "priority_sample",
    "fair_budget",
    # hits_scores: 2 × iterations 1-row L1-total broadcast crosses
    "hits_scores",
    # hll_union_rollup: 1-row exact/naive self-eval crosses
    "hll_union_rollup",
    # split_assign: 1-row doc-total cross for achieved_pm
    "split_assign",
    # bpe_merge_round: 1-row winning-merge broadcast cross
    "bpe_merge_round",
    # data_card: 1-row corpus-totals broadcast cross
    "data_card",
    # fetch_shard_plan: 1-row grand-total-load broadcast cross
    "fetch_shard_plan",
    # lang_temperature_mix: 1-row weight/doc-total + leftover crosses
    "lang_temperature_mix",
    # collocation_topk: 1-row corpus-token-total broadcast cross
    "collocation_topk",
}


# Audited global (unpartitioned) windows — every entry is a documented
# ≤K-row frame where K is a CONSTANT (not corpus-, host- or
# vocab-bounded), so one window task is the right plan. Anything
# data-bounded must go through operators/rankdist.distributed_rank
# (vocab_coverage and fetch_shard_plan were converted in round 5).
# The per-query justification lives next to each key.
ALLOWED_GLOBAL_WINDOW: dict[str, str] = {
    # largest-remainder seat assignment ranks the per-LANGUAGE remainder
    # table — |languages| rows (≤ a few hundred on the whole web)
    "lang_temperature_mix": "window over the ≤|languages|-row remainder table",
    # cumulative sums over the HEAPS_BUCKETS(=20)-row prefix curve
    "heaps_curve": "window over the constant HEAPS_BUCKETS-row curve",
}


def _plan_lines(df) -> list[str]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue().splitlines()


def _unpartitioned_windows(lines: list[str]) -> list[str]:
    """Window plan nodes with only 2 top-level bracket groups —
    [functions], [order] — i.e. no partition spec."""
    out = []
    for line in lines:
        if "Window [" not in line:
            continue
        depth = 0
        groups = 0
        for ch in line:
            if ch == "[":
                if depth == 0:
                    groups += 1
                depth += 1
            elif ch == "]":
                depth -= 1
        if groups == 2:
            out.append(line.strip()[:120])
    return out


@pytest.mark.spark
def test_no_unplanned_nested_loop_joins(spark):
    import __spark_entry__ as E

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"testdata dir {sf_dir} not present")
    nl_violations = {}
    win_violations = {}
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        lines = _plan_lines(df)
        plan = "\n".join(lines)
        hits = [
            k
            for k in ("BroadcastNestedLoopJoin", "CartesianProduct")
            if k in plan
        ]
        if hits and name not in ALLOWED_NESTED_LOOP:
            nl_violations[name] = hits
        wins = _unpartitioned_windows(lines)
        if wins and name not in ALLOWED_GLOBAL_WINDOW:
            win_violations[name] = wins[0]
    assert not nl_violations, f"unplanned nested-loop joins: {nl_violations}"
    assert not win_violations, (
        "unpartitioned (single-task) windows on scale-path queries — use "
        f"operators/rankdist.distributed_rank or whitelist with a bounded-K "
        f"justification: {win_violations}"
    )
