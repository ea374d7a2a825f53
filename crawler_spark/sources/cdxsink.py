"""CDX index writer: globally range-sorted shards + a shard-level
secondary index (the public ZipNum / Common-Crawl cdx-index layout).

A CDX index is only useful sorted: every reader (prefix scan, binary
search, the reference's matchType family — src/cdx/client.py:88-101)
assumes lines ordered by (urlkey, ts). At corpus scale that is exactly
Spark's ``repartitionByRange`` + ``sortWithinPartitions``: the range
exchange samples key boundaries, so shard *i* holds a contiguous,
disjoint key range and each shard file is internally sorted — a total
global order across files without any single-node sort.

The companion ``cluster.idx`` (one row per shard: first key, shard
file) is the index-of-indexes a lookup reads FIRST: binary-search the
~n_shards-row cluster index, open only the 1-2 shards whose range can
contain the query — the same two-level access path pywb's ZipNum uses,
and the reason a 10^10-record index answers a prefix query without
touching 99.9% of its files.

Scale shape: one range shuffle (sampled boundaries, AQE-skew aware) +
embarrassingly-parallel sorted writes; the cluster index reads the
FIRST LINE of each shard (the shard is sorted, so that is its min key)
— O(n_shards) single-line reads, no dataset rescan (on an object
store, a ranged GET of each file's head).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CDX_LINE_COLS = ("urlkey", "ts", "url", "digest", "length", "filename", "offset")


def write_cdx_index(cdx: DataFrame, path: str, n_shards: int = 8) -> None:
    """Write ``path/shards`` (range-sorted CDX text shards) and
    ``path/cluster.idx`` (tab-separated ``first_key<TAB>shard_file``,
    itself sorted)."""
    line = F.concat_ws(
        " ", *[F.col(c).cast("string") for c in CDX_LINE_COLS]
    ).alias("value")
    (
        cdx.select(*CDX_LINE_COLS)
        .repartitionByRange(n_shards, "urlkey", "ts")
        .sortWithinPartitions("urlkey", "ts")
        .select(line)
        .write.mode("overwrite")
        .text(f"{path}/shards")
    )
    # each shard is internally sorted, so its first_key is literally its
    # first line: O(n_shards) single-line reads, no dataset rescan
    shard_dir = f"{path}/shards"
    idx = []
    for name in os.listdir(shard_dir):
        if not name.startswith("part-"):
            continue
        with open(os.path.join(shard_dir, name), encoding="utf-8") as f:
            first = f.readline()
        if first:
            idx.append((first.split(" ", 1)[0], name))
    idx.sort()
    with open(f"{path}/cluster.idx", "w", encoding="utf-8") as f:
        for first_key, shard in idx:
            f.write(f"{first_key}\t{shard}\n")


def read_cluster_idx(path: str) -> list[tuple[str, str]]:
    """[(first_key, shard_file)] sorted by first_key."""
    out = []
    with open(f"{path}/cluster.idx", encoding="utf-8") as f:
        for ln in f:
            k, s = ln.rstrip("\n").split("\t")
            out.append((k, s))
    return out


def shards_for_prefix(idx: list[tuple[str, str]], prefix: str) -> list[str]:
    """The shard files a prefix scan must open: every shard whose key
    range [first_key_i, first_key_{i+1}) can intersect ``prefix*`` —
    the driver-side binary-search step of the two-level lookup."""
    import bisect

    keys = [k for k, _ in idx]
    # last shard whose first_key <= prefix could still contain it
    lo = max(bisect.bisect_right(keys, prefix) - 1, 0)
    # append U+10FFFF (the MAXIMUM code point — not U+FFFF, which sorts
    # below supplementary-plane chars) to upper-bound every key with
    # this prefix
    hi = bisect.bisect_right(keys, prefix + "\U0010FFFF")
    return [s for _, s in idx[lo:hi]]


def scan_prefix(
    spark: SparkSession, path: str, prefix: str
) -> DataFrame:
    """Two-level prefix lookup: cluster.idx → only the matching shard
    FILES are listed for the scan (partition pruning by construction);
    the line filter then applies the exact prefix."""
    shards = shards_for_prefix(read_cluster_idx(path), prefix)
    if not shards:
        return spark.createDataFrame([], "value string")
    files = [os.path.join(path, "shards", s) for s in shards]
    return spark.read.text(files).where(
        F.substring_index(F.col("value"), " ", 1).startswith(prefix)
    )
