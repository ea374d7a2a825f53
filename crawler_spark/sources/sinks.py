"""Result / failure sinks and the resume source (SURVEY §2.2).

Reference semantics:
- JSON results: ``json.dump(results, indent=2)`` to a timestamped file
  (/root/reference/src/crawler.py:244-261; src/warc_processor.py:467-485);
- CSV results: fixed column order with header row
  (src/crawler.py:267-292 cols :275-278; src/warc_processor.py:488-505
  cols :491-493);
- failure sink: session-stamped JSON with reasons + a bare-path TXT for
  easy resume (src/utils/retry_handler.py:89-124);
- failure source: reload either form as the next run's work list
  (src/utils/retry_handler.py:126-154; wired src/warc_processor.py:397-402).

Spark-first: the durable store is the SnapshotStore/Iceberg table; these
exports are the interop surface (a reference user's downstream jq/CSV
tooling keeps working). Distributed writes (one file per partition) —
``single_file=True`` coalesces for small result sets only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# reference CSV column orders
CSV_COLS_CDX = [  # src/crawler.py:275-278 (EP1 result rows, R7)
    "domain", "url", "schema", "detected_at", "crawl_date",
    "confidence", "indicators", "build_id", "version",
]
CSV_COLS_BULK = [  # src/warc_processor.py:491-493 (EP2 result rows, R8)
    "domain", "url", "schema", "confidence", "indicators",
    "build_id", "warc_source",
]


def _maybe_single(df: DataFrame, single_file: bool) -> DataFrame:
    return df.coalesce(1) if single_file else df


def write_results_json(
    results: DataFrame, path: str, single_file: bool = False
) -> None:
    """JSON-lines export (the distributed analog of the reference's one
    JSON array; ``jq -s`` reassembles the array form)."""
    _maybe_single(results, single_file).write.mode("overwrite").json(path)


def write_results_csv(
    results: DataFrame, path: str, cols: list[str] | None = None, single_file: bool = False
) -> None:
    """CSV with the reference's column order; array columns joined with
    ',' inside a quoted field exactly like csv.writer renders a list-free
    string (the reference writes ``'; '.join(indicators)`` — kept)."""
    cols = cols or [c for c in CSV_COLS_BULK if c in results.columns]
    df = results
    if "indicators" in cols and "indicators" in df.columns:
        df = df.withColumn("indicators", F.array_join("indicators", "; "))
    df = df.select(*cols)
    _maybe_single(df, single_file).write.mode("overwrite").csv(path, header=True)


def write_failures(
    failures: DataFrame, json_path: str, txt_path: str, single_file: bool = False
) -> None:
    """Failure list in both reference forms: JSON rows with reasons, and
    the bare work-unit TXT used for quick resume."""
    _maybe_single(failures, single_file).write.mode("overwrite").json(json_path)
    bare = failures.select(F.col("url").alias("value"))
    _maybe_single(bare, single_file).write.mode("overwrite").text(txt_path)


def load_failures(spark: SparkSession, path: str) -> DataFrame:
    """Resume source: load a failure export (JSON dir or TXT dir) back into
    a work list with a ``url`` column (reference load_failures accepts
    both forms, src/utils/retry_handler.py:126-154)."""
    if path.rstrip("/").endswith(".txt") or _looks_like_text(spark, path):
        return spark.read.text(path).select(F.col("value").alias("url")).where(
            F.length(F.trim("url")) > 0
        )
    df = spark.read.json(path)
    col = "url" if "url" in df.columns else "warc_path"
    return df.select(F.col(col).alias("url")).where(F.col("url").isNotNull())


def _looks_like_text(spark: SparkSession, path: str) -> bool:
    try:
        first = spark.read.text(path).limit(1).collect()
        return bool(first) and not first[0][0].lstrip().startswith("{")
    except Exception:
        return False
