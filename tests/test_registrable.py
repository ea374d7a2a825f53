"""PSL-lite registrable-domain extraction: politeness grouping key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.url import registrable_domain


@pytest.mark.spark
def test_registrable_domain_cases(spark):
    cases = {
        "a.b.site.co.uk": "site.co.uk",
        "site.co.uk": "site.co.uk",
        "www.site.com": "site.com",
        "site.com": "site.com",
        "deep.sub.host.example.org": "example.org",
        "shop.example.com.au": "example.com.au",
        "co.uk": "co.uk",  # bare suffix: the host itself
        "localhost": "localhost",  # single label: the host itself
        "x.blog.ne.jp": "blog.ne.jp",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: r["reg"]
        for r in df.select("host", registrable_domain(F.col("host")).alias("reg")).collect()
    }
    assert got == cases
