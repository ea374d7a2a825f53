"""operators/trapdetect.py — URL template explosion."""

from pyspark.sql import functions as F

from crawler_spark.operators.trapdetect import (
    synth_trap_urls,
    trap_detect,
    url_template,
)


def test_url_template_collapses(spark):
    df = spark.createDataFrame(
        [
            ("https://h.com/calendar/2026/3/day-17?sess=abc",),
            ("https://h.com/calendar/2026/11/day-40",),
            ("http://h.com/x/deadbeef01234567/y",),  # long hex -> H
            ("https://h.com/plain/path",),
        ],
        "url string",
    )
    got = [r["t"] for r in df.select(url_template(F.col("url")).alias("t")).collect()]
    assert got[0] == "/calendar/N/N/day-N"  # query stripped, digits collapsed
    assert got[0] == got[1]  # same template despite different numbers
    assert got[2] == "/x/H/y"
    assert got[3] == "/plain/path"


def test_trap_flagged_normal_not(spark):
    # trap host: 40 calendar urls + 10 one-off pages; normal host: 5
    # sections x 10 urls (uniform -> ratio 1x)
    rows = []
    for i in range(40):
        rows.append((f"https://trap.com/cal/2026/{i}/d", "trap.com"))
    for i in range(10):
        rows.append((f"https://trap.com/about-{'abcdefghij'[i]}", "trap.com"))
    for s in "abcde":
        for i in range(10):
            rows.append((f"https://ok.com/sec-{s}/p{i}", "ok.com"))
    pages = spark.createDataFrame(rows, "url string, host string")
    got = trap_detect(pages).collect()
    traps = {(r["host"], r["template"]) for r in got if r["is_trap"]}
    assert traps == {("trap.com", "/cal/N/N/d")}
    # trap host mean = 50 div 11 = 4 -> ratio 10x
    trap_row = [r for r in got if r["is_trap"]][0]
    assert trap_row["n_urls"] == 40 and trap_row["mean_n"] == 4
    assert all(not r["is_trap"] for r in got if r["host"] == "ok.com")


def test_synth_plants_traps_at_sf(spark):
    docs = spark.range(500).selectExpr(
        "id AS doc_id", "concat('src', id % 20) AS source"
    )
    got = trap_detect(synth_trap_urls(docs)).collect()
    flagged_hosts = {r["host"] for r in got if r["is_trap"]}
    assert flagged_hosts == {
        "src0.example.com", "src5.example.com",
        "src10.example.com", "src15.example.com",
    }
    assert all("calendar" in r["template"] for r in got if r["is_trap"])
