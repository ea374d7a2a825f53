"""Benchmark harness — prints ONE JSON line for the driver.

Default run:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Headline numbers:
- ``corpus_classify``: the flagship EP2 plan (scan → Arrow detector →
  gate → per-WARC dedupe) over a pre-materialized synthetic crawl corpus
  → pages classified / second (BASELINE.md: reference does 10-20
  WARC/min ≈ 50-100 pages/s single-node).
- ``frontier_rounds``: BFS frontier expansion (anti-join URL-seen with
  Bloom pre-pass, robots gate, politeness budget window) → frontier URLs
  expanded+deduped / second (the BASELINE.json north metric).
- one timing per SQL-verifiable operator family from __spark_entry__.

Scaling evidence (north rule: ≥0.8 efficiency N→4N executors, evidenced
in-sandbox as local[8] vs local[32] per the driver's instruction):
    python bench.py --scaling          # runs both levels in subprocesses,
                                       # prints JSON + rewrites BENCH.md
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CORPUS_PAGES = int(os.environ.get("SPARK_GRAFT_CORPUS_PAGES", "120000"))
FRONTIER_PAGES = int(os.environ.get("SPARK_GRAFT_FRONTIER_PAGES", "20000"))
FRONTIER_SEEDS = 400
FRONTIER_BUDGET = 50
FRONTIER_ROUNDS = 3

# operator queries worth timing at sf0.1 (subset of __spark_entry__.queries
# that stresses distinct physical shapes: agg, window, join, explode+join,
# HOF fold, Arrow UDF)
BENCH_QUERIES = [
    "pricing_summary",
    "headk_per_group",
    "broadcast_join_parts",
    "anti_join_unseen",
    "first_event_per_user",
    "token_stats",
    "quality_score",
    "lang_id",
    "dedup_exact",
    "simhash_fingerprints",
    "minhash_lsh_candidates",
    "ngram_jaccard_neardups",
    "cosine_topk",
    "ann_lsh_neardups",
    "flagship_classify",
]


def _noop_run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_bench(cpus: int, include_queries: bool = True) -> dict:
    from crawler_spark.session import get_spark

    spark = get_spark(app_name=f"bench-{cpus}", cores=cpus, shuffle_partitions=cpus)
    timings: dict[str, float] = {}
    throughput: dict[str, float] = {}

    # Warm the Python UDF workers (one per core) before any timed run —
    # worker spawn + module import is a fixed local-mode cost that a real
    # cluster pays once per executor, not per query.
    from pyspark.sql import functions as F

    from crawler_spark.functions.detector import detect_udf
    from crawler_spark.functions.url import canonicalize_udf

    warm = spark.range(0, cpus * 4, numPartitions=cpus * 4).selectExpr(
        "'https://warm.example.com/p' || id as url", "'<html>warm</html>' as text"
    )
    warm.select(detect_udf("text"), canonicalize_udf("url")).write.format("noop").mode(
        "overwrite"
    ).save()

    with tempfile.TemporaryDirectory(prefix="bench_corpus_") as tmp:
        # ---- materialize the synthetic crawl corpus (not timed: ingest) --
        from crawler_spark.sources.corpus import (
            generate_links,
            generate_pages,
            generate_robots,
            generate_seeds,
        )

        corpus_path = f"{tmp}/pages"
        generate_pages(spark, CORPUS_PAGES, partitions=cpus * 2).write.parquet(corpus_path)
        pages = spark.read.parquet(corpus_path)

        # ---------------------------------------- flagship classification --
        from crawler_spark.plans.flagship import classify_bulk

        t0 = time.time()
        _noop_run(classify_bulk(pages, min_confidence="medium"))
        dt = time.time() - t0
        timings["corpus_classify"] = round(dt, 2)
        throughput["pages_classified_per_sec"] = round(CORPUS_PAGES / dt, 1)

        # -------------------------------------------------- frontier BFS --
        from crawler_spark.frontier import FrontierCrawler
        from crawler_spark.sources.tables import SnapshotStore

        fp = f"{tmp}/fpages"
        lp = f"{tmp}/flinks"
        generate_pages(spark, FRONTIER_PAGES, partitions=cpus).write.parquet(fp)
        generate_links(spark, FRONTIER_PAGES, avg_fanout=8, partitions=cpus).write.parquet(lp)
        fpages = spark.read.parquet(fp)
        flinks = spark.read.parquet(lp)
        fseeds = generate_seeds(spark, FRONTIER_SEEDS, FRONTIER_PAGES)
        frobots = generate_robots(spark, fpages)

        store = SnapshotStore(f"{tmp}/store")
        crawler = FrontierCrawler(
            spark, store, fpages, links=flinks, robots=frobots, budget=FRONTIER_BUDGET
        )
        crawler.init_from_seeds(fseeds)
        t0 = time.time()
        metrics = crawler.run(FRONTIER_ROUNDS, from_round=0)
        dt = time.time() - t0
        expanded = sum(m.candidates for m in metrics)
        timings["frontier_rounds"] = round(dt, 2)
        throughput["frontier_urls_expanded_deduped_per_sec"] = round(expanded / dt, 1)
        throughput["frontier_urls_expanded_total"] = expanded

        # -------------------------------------------- operator queries --
        if include_queries:
            import __spark_entry__ as E

            qs = E.queries()
            for name in BENCH_QUERIES:
                t0 = time.time()
                _noop_run(qs[name](spark, SF_DIR))
                timings[name] = round(time.time() - t0, 2)

    spark.stop()
    return {"timings": timings, "throughput": throughput}


def _scaling(levels=(8, 32)) -> dict:
    """Run the SAME job at two parallelism levels in fresh JVMs and report
    scaling efficiency (the in-sandbox stand-in for N vs 4N executors)."""
    results = {}
    for cpus in levels:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, __file__, "--one-shot"],
            env=env, capture_output=True, text=True, check=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    lo, hi = levels
    ratio = hi / lo
    eff = {}
    for key in ("pages_classified_per_sec", "frontier_urls_expanded_deduped_per_sec"):
        a = results[lo]["throughput"][key]
        b = results[hi]["throughput"][key]
        eff[key] = {
            f"local[{lo}]": a,
            f"local[{hi}]": b,
            "speedup": round(b / a, 2),
            "efficiency": round(b / a / ratio, 3),
        }
    return {"levels": list(levels), "per_level": results, "efficiency": eff}


def main() -> None:
    if "--scaling" in sys.argv:
        sc = _scaling()
        _write_bench_md(sc)
        print(json.dumps({"metric": "scaling", **sc["efficiency"]}))
        return

    one_shot = "--one-shot" in sys.argv
    res = run_bench(CPUS, include_queries=not one_shot)
    out = {
        "metric": "headline query wall time (flagship classify + frontier BFS + operator suite)",
        "value": round(sum(res["timings"].values()), 2),
        "unit": "sec",
        "queries": res["timings"],
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": CPUS,
        "corpus_pages": CORPUS_PAGES,
        "throughput": res["throughput"],
    }
    print(json.dumps(out))


def _write_bench_md(sc: dict) -> None:
    lines = [
        "# BENCH — two-parallelism scaling evidence",
        "",
        "North rule: frontier-expansion throughput scaling efficiency ≥0.8",
        "from N to 4N executors. No real cluster in this sandbox, so the",
        "same job runs at two local parallelism levels (fresh JVM each):",
        "",
        f"- corpus: {CORPUS_PAGES} synthetic pages (flagship classify),",
        f"  {FRONTIER_PAGES} pages / {FRONTIER_SEEDS} seeds / budget",
        f"  {FRONTIER_BUDGET} × {FRONTIER_ROUNDS} BFS rounds (frontier)",
        "",
        "| metric | " + " | ".join(f"local[{c}]" for c in sc["levels"]) + " | speedup | efficiency |",
        "|---|" + "---|" * (len(sc["levels"]) + 2),
    ]
    for key, row in sc["efficiency"].items():
        cells = [str(row[f"local[{c}]"]) for c in sc["levels"]]
        lines.append(
            f"| {key} | " + " | ".join(cells) + f" | {row['speedup']}x | {row['efficiency']} |"
        )
    lines += [
        "",
        "Efficiency = speedup / (core ratio). Generated by `python bench.py --scaling`.",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
