"""The BFS frontier crawler — the north-rule system.

Reproduces the reference's crawl semantics (seed-order scheduling, global
URL-seen dedupe, politeness budget, retry-with-failure-tracking, resume)
as an iterative batch loop over snapshot tables. All "fetches" are reads
of the materialized ``pages`` table (the crawl is simulated over the
corpus); the reference's HTTP stages map as in SURVEY §3.

Per round (each step one declarative DataFrame op, shuffles noted):

  1. candidates  = frontier, first-wins deduped by surt        [shuffle: surt]
  2. unseen      = Bloom-prefiltered exact anti-join vs seen   [shuffle: bucket, positives only]
  3. allowed     = robots gate (broadcast join) + crawl_delay budgets
  4. admitted/deferred = per-host politeness window, skew-salted [shuffle: host(+salt)]
  5. fetched/missing   = join pages on url                     [shuffle: url; AQE may broadcast the admitted side]
  6. results    += detector over fetched (one Arrow stage)
  7. failures   += missing (retry ≤ max_attempts, then permanent)
  8. frontier'   = deferred ∪ out-links of fetched (anti-joined next round) ∪ retryable failures
  9. url_seen   += admitted∖retryable; blooms rebuilt; metrics row appended
 10. atomic round commit (state.json) — kill anywhere before it and resume
     replays the round; after it, the round is durable.

Scheduling-order contract (SURVEY §3 EP1 caveat): the reference's emitted
order is thread-nondeterministic; the *scheduled* order is deterministic.
Ours is (round, priority desc, host, surt) — stored on every admitted row,
so any two runs (or a run and the oracle) compare as ordered sequences.

Failure semantics follow the reference's RetryHandler
(src/utils/retry_handler.py:206-299): a failed unit of work is recorded
with a reason and retried up to max_attempts rounds (the 300 s
inter-attempt sleep is politeness-vestigial and not reproduced); only a
permanently-failed URL stops being scheduled.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.config import DEFAULT, EngineConfig
from crawler_spark.functions.detector import confidence_rank, detect_udf
from crawler_spark.functions.url import canonicalize_udf
from crawler_spark.operators.bloom import build_blooms
from crawler_spark.operators.dedup import filter_unseen, first_wins
from crawler_spark.operators.politeness import admit_per_host, default_order
from crawler_spark.operators.robots import budget_from_crawl_delay, gate
from crawler_spark.sources.tables import SnapshotStore

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("surt", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("failure_count", T.IntegerType()),
    ]
)


@dataclass
class RoundMetrics:
    round: int
    candidates: int = 0
    unseen: int = 0
    admitted: int = 0
    deferred: int = 0
    blocked: int = 0
    fetched: int = 0
    missing: int = 0
    results: int = 0
    new_links: int = 0
    seconds: float = 0.0

    def row(self) -> tuple:
        return (
            self.round, self.candidates, self.unseen, self.admitted, self.deferred,
            self.blocked, self.fetched, self.missing, self.results, self.new_links,
            float(self.seconds),
        )


METRICS_SCHEMA = (
    "round int, candidates long, unseen long, admitted long, deferred long, "
    "blocked long, fetched long, missing long, results long, new_links long, seconds double"
)


class FrontierCrawler:
    """Iterative BFS crawl over snapshot tables. Resumable."""

    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        pages: DataFrame,
        links: DataFrame | None = None,
        robots: DataFrame | None = None,
        cfg: EngineConfig = DEFAULT,
        budget: int | None = None,
        min_confidence: str = "medium",
    ):
        self.spark = spark
        self.store = store
        self.pages = pages
        self.links = links
        self.robots = robots
        self.cfg = cfg
        self.budget = budget if budget is not None else cfg.politeness.budget_per_round
        self.min_confidence = min_confidence
        # One fetchable copy per URL: the corpus plants ~5% cross-WARC
        # duplicates; a crawl fetches a URL once, deterministically the
        # first copy in file order. (At production scale this dedupe
        # happens once at ingest, not per round.)
        self._page_lookup = first_wins(
            pages.select(F.col("url").alias("p_url"), "text", "warc_source", "warc_offset"),
            ["p_url"],
            [F.col("warc_offset").asc()],
        )

    # ------------------------------------------------------------ setup --
    def _canonical_frontier(self, urls: DataFrame, depth_col, priority_col) -> DataFrame:
        """urls(url[, ...]) → frontier rows with canonical keys."""
        return (
            urls.withColumn("c", canonicalize_udf("url"))
            .select(
                "url",
                F.col("c.surt").alias("surt"),
                F.col("c.host").alias("host"),
                F.col("c.path").alias("path"),
                depth_col.cast("int").alias("depth"),
                priority_col.cast("double").alias("priority"),
                F.lit(0).alias("failure_count"),
            )
            .where(F.col("surt").isNotNull())
        )

    def init_from_seeds(self, seeds: DataFrame) -> None:
        """Round-0 frontier from the seed list. Priority encodes the
        reference's deterministic submission order (stream order,
        src/crawler.py:103-106): earlier seed ⇒ higher priority."""
        frontier = self._canonical_frontier(
            seeds, F.lit(0), -F.col("seed_id").cast("double")
        )
        empty_seen = self.spark.createDataFrame(
            [], "surt string, url string, host string, round int"
        )
        self.store.write("frontier", frontier, meta={"round": 0})
        self.store.write("url_seen", empty_seen, meta={"round": 0})
        self.store.write("blooms", build_blooms(empty_seen, cfg=self.cfg), meta={"round": 0})
        self.store.commit_state(
            {
                "round": 0,
                "tables": {t: self.store.current_version(t) for t in ("frontier", "url_seen", "blooms")},
            }
        )

    def resume(self) -> int:
        """Roll back to the last durable round; returns its number."""
        state = self.store.restore_state()
        if state is None:
            raise RuntimeError("no committed state to resume from (run init_from_seeds)")
        return int(state["round"])

    # ------------------------------------------------------------ round --
    def run_round(self, round_no: int, measure: bool = True) -> RoundMetrics:
        t0 = time.time()
        m = RoundMetrics(round=round_no)
        spark, store, cfg = self.spark, self.store, self.cfg

        frontier = store.read(spark, "frontier")
        seen = store.read(spark, "url_seen")
        blooms = store.read(spark, "blooms")

        # 1. within-frontier dedupe: one candidate per surt. Order is fully
        #    deterministic: priority, then failure_count desc (a retrying
        #    row must beat a fresh link with the same surt so its attempt
        #    count survives), then url as the total tie-break.
        candidates = first_wins(
            frontier,
            ["surt"],
            [F.col("priority").desc(), F.col("failure_count").desc(), F.col("url").asc()],
        )

        # 2. URL-seen anti-join (Bloom prefilter + exact confirm).
        #    Cached: the Bloom cogroup probe is the round's most expensive
        #    pre-fetch stage and every downstream branch (gate, admit,
        #    metrics counts) re-reads it.
        unseen = filter_unseen(candidates, seen, blooms, cfg=cfg).cache()

        # 3. robots gate + per-host budgets from crawl_delay
        g = gate(unseen, self.robots)
        allowed = budget_from_crawl_delay(
            g.allowed, cfg.politeness.round_duration_s, self.budget
        )

        # 4. politeness admission
        adm = admit_per_host(allowed, budget_col="host_budget", cfg=cfg)
        admitted = adm.admitted.drop("host_budget", "crawl_delay").cache()
        deferred = adm.deferred.drop("host_budget", "crawl_delay")

        # 5. "fetch": join the pages corpus on url. Cached: both branches
        #    (fetched/missing) and the failure+link stages reuse it, and
        #    the page-lookup side is itself a window over the corpus.
        page_cols = self._page_lookup
        fetch = admitted.join(
            page_cols, admitted["url"] == page_cols["p_url"], "left"
        ).drop("p_url").cache()
        fetched = fetch.where(F.col("text").isNotNull())
        missing = fetch.where(F.col("text").isNull()).select(
            "url", "surt", "host", "path", "depth", "priority", "failure_count"
        )

        # 6. classify fetched pages (one Arrow stage), gate, append results
        from crawler_spark.patterns import CONFIDENCE_ORDER

        det = fetched.withColumn("d", detect_udf(F.col("text")))
        results = det.where(
            F.col("d.is_nextjs")
            & (
                confidence_rank(F.col("d.confidence"))
                >= F.lit(CONFIDENCE_ORDER.get(self.min_confidence, 2))
            )
        ).select(
            F.lit(round_no).alias("round"),
            "priority",
            "host",
            "surt",
            "url",
            F.col("d.confidence").alias("confidence"),
            F.col("d.indicators").alias("indicators"),
            F.col("d.build_id").alias("build_id"),
            F.col("d.version").alias("version"),
            "warc_source",
            F.spark_partition_id().alias("partition_id"),
        )

        # 7. failures: missing pages retry up to max_attempts
        fail_rows = missing.withColumn("failure_count", F.col("failure_count") + 1)
        retryable = fail_rows.where(F.col("failure_count") < cfg.max_retry_attempts)
        permanent = fail_rows.where(F.col("failure_count") >= cfg.max_retry_attempts)
        failures_log = fail_rows.select(
            "url",
            F.lit("connection_error").alias("failure_reason"),
            "failure_count",
            F.lit(round_no).alias("round"),
            (F.col("failure_count") >= cfg.max_retry_attempts).alias("is_permanent"),
        )

        # 8. next frontier: deferred ∪ new out-links ∪ retryable failures.
        #    (next round's step 2 anti-joins the fresh seen set, so links
        #    back to scheduled URLs terminate — planted cycles included.)
        parts = [deferred, retryable]
        if self.links is not None:
            link_dst = (
                fetched.select(F.col("url").alias("src_url"))
                .join(self.links, "src_url")
                .select(F.col("dst_url").alias("url"))
                .distinct()
            )
            new_links = self._canonical_frontier(
                link_dst, F.lit(round_no + 1), F.lit(-1000.0) * (round_no + 1)
            ).cache()
            parts.append(new_links)
            if measure:
                m.new_links = new_links.count()
        next_frontier = parts[0]
        for p in parts[1:]:
            next_frontier = next_frontier.unionByName(p)

        # 9. seen += scheduled URLs this round (admitted minus the missing
        #    ones that will retry; permanently-failed URLs are sealed too).
        newly_seen = (
            admitted.join(retryable.select("surt"), "surt", "left_anti")
            .select("surt", "url", "host")
            .withColumn("round", F.lit(round_no))
        )

        if measure:
            m.candidates = candidates.count()
            m.unseen = unseen.count()
            m.deferred = deferred.count()
            m.blocked = g.blocked.count()
            m.missing = missing.count()
        m.admitted = admitted.count()
        m.fetched = fetched.count()

        # ---- commit (deltas only; state swap last = snapshot isolation) --
        store.write("frontier", next_frontier, meta={"round": round_no})
        store.write("url_seen", newly_seen, meta={"round": round_no}, append=True)
        seen_all = store.read(spark, "url_seen")
        store.write("blooms", build_blooms(seen_all, cfg=cfg), meta={"round": round_no})
        store.write("results", results, meta={"round": round_no}, append=True)
        store.write("failures", failures_log, meta={"round": round_no}, append=True)
        m.results = store.read(spark, "results").where(F.col("round") == round_no).count()
        m.seconds = time.time() - t0
        metrics_df = self.spark.createDataFrame([m.row()], METRICS_SCHEMA)
        store.write("metrics", metrics_df, meta={"round": round_no}, append=True)
        store.commit_state(
            {
                "round": round_no,
                "tables": {
                    t: self.store.current_version(t)
                    for t in ("frontier", "url_seen", "blooms", "results", "failures", "metrics")
                },
            }
        )
        admitted.unpersist()
        fetch.unpersist()
        unseen.unpersist()
        if self.links is not None:
            new_links.unpersist()
        return m

    def run(self, max_rounds: int, from_round: int | None = None) -> list[RoundMetrics]:
        """Run rounds until the frontier drains or max_rounds."""
        start = (from_round if from_round is not None else self.resume()) + 1
        out = []
        for r in range(start, start + max_rounds):
            if self.store.read(self.spark, "frontier").limit(1).count() == 0:
                break
            out.append(self.run_round(r))
        return out
