"""Sequence-packing layout vs a row-at-a-time Python twin."""

from __future__ import annotations

import re

from crawler_spark.functions.textstats import TOKEN_REGEX
from crawler_spark.operators.packing import (
    PACK_SHARDS,
    pack_layout,
    shard_stats,
)

BUDGET = 7  # tiny budget so straddles are common


def _py_layout(rows, budget):
    shards: dict[int, list[tuple[int, int]]] = {}
    for doc_id, text in rows:
        n_tok = len(re.findall(TOKEN_REGEX, text)) + 1
        shards.setdefault(doc_id % PACK_SHARDS, []).append((doc_id, n_tok))
    out = {}
    for shard, docs in shards.items():
        off = 0
        for doc_id, n_tok in sorted(docs):
            first = off // budget
            last = (off + n_tok - 1) // budget
            out[doc_id] = (shard, n_tok, off, first, last - first + 1, last > first)
            off += n_tok
    return out


def test_pack_layout_matches_python_twin(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(1 + i % 9))) for i in range(64)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["shard"], r["n_tokens"], r["start_offset"],
            r["first_chunk"], r["n_chunks"], r["straddles"],
        )
        for r in pack_layout(df, budget=BUDGET).collect()
    }
    assert got == _py_layout(rows, BUDGET)


def test_pack_stream_is_gapless_and_stats_consistent(spark):
    rows = [(i, " ".join("tok" for _ in range(1 + i % 5))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lay = pack_layout(df, budget=BUDGET)
    per_shard = {}
    for r in lay.collect():
        per_shard.setdefault(r["shard"], []).append(r)
    for docs in per_shard.values():
        docs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in docs:
            assert r["start_offset"] == off  # no gaps, no overlap
            off += r["n_tokens"]
    stats = {r["shard"]: r for r in shard_stats(lay, budget=BUDGET).collect()}
    for shard, docs in per_shard.items():
        s = stats[shard]
        assert s["n_docs"] == len(docs)
        assert s["n_tokens"] == sum(r["n_tokens"] for r in docs)
        assert s["n_straddling"] == sum(1 for r in docs if r["straddles"])
        assert s["tail_tokens"] == s["n_tokens"] % BUDGET
