"""crawler_spark — a from-scratch, PySpark-native crawl-frontier +
page-classification engine with the query/data-processing capabilities of
the reference single-node pipeline (ilkmuratkr/Crawler, studied read-only at
/root/reference — see SURVEY.md for the full operator inventory with
file:line citations).

Layout
------
- ``patterns``          — the detection pattern bank + scoring constants
                          (semantics of /root/reference/src/detectors/nextjs.py:22-58).
- ``oracle``            — row-at-a-time pure-Python re-execution of the
                          reference logic; the correctness oracle the
                          vectorized Spark path is tested against.
- ``functions``         — vectorized pandas/Arrow UDFs + built-in-function
                          expression builders (detector, decode, URL
                          canonicalize/SURT, text analysis).
- ``operators``         — composed DataFrame operators: URL-seen dedupe with
                          partitioned Bloom prefilter, per-host politeness
                          budget with skew salting, robots gating, top-k,
                          similarity / near-dup (MinHash-LSH, SimHash,
                          n-gram Jaccard, embedding ANN).
- ``sources``           — deterministic synthetic corpus generator (T1-T6 of
                          FIXTURES.md) + the parquet-backed snapshot table
                          store (Iceberg-shaped: versioned snapshots,
                          partition lineage; swaps to real Iceberg when the
                          runtime jar is on the classpath).
- ``plans``             — end-to-end query plans mirroring the reference's
                          three entry points (EP1 CDX search, EP2 bulk WARC
                          classify — the flagship, EP3 sampling survey).
- ``frontier``          — the BFS frontier driver loop: canonicalize →
                          anti-join URL-seen → robots gate → politeness
                          budget → classify → checkpoint, resumable.
"""

__version__ = "0.1.0"
