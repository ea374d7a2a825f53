"""Partitioned Bloom filter for the URL-seen structure.

The reference's URL-seen is an in-memory ``set`` (O(1) membership,
/root/reference/src/crawler.py:54-55,181-186) — fine for one process,
impossible at a 10^10-URL frontier. The north rule's replacement:

- ``url_seen`` rows live in a table hash-partitioned by
  ``bucket = pmod(xxhash64(surt), B)`` (the Iceberg ``bucket(B, surt)``
  transform);
- each bucket carries a serialized Bloom sidecar, rebuilt/merged per BFS
  round and persisted via SnapshotStore (rebuildable from the exact table
  on resume);
- candidate membership runs as: cogrouped Bloom probe per bucket (no
  per-row blob duplication, no broadcast of the full filter set) →
  *definitely-new* rows skip the expensive exact anti-join entirely;
  *maybe-seen* rows (Bloom positives) are confirmed by an exact
  ``left_anti`` join against only their buckets — Bloom false positives
  can therefore never drop a URL, and the final seen-set is exact
  (north rule demands set equality with the reference).

Hashing: two independent 64-bit hashes computed JVM-side
(``xxhash64(key, seed)``), combined inside the probe/build kernels by
double hashing ``h_i = h1 + i·h2 (mod m)`` (Kirsch–Mitzenmacher), so the
Python side never hashes strings — it only does vectorized numpy bit math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.config import DEFAULT, EngineConfig

BLOOM_SCHEMA = "bucket int, m long, n long, bits binary"


def _hash_cols(df: DataFrame, key_col: str, num_buckets: int) -> DataFrame:
    return df.withColumns(
        {
            "_bucket": F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int"),
            "_h1": F.xxhash64(F.col(key_col), F.lit(1)),
            "_h2": F.xxhash64(F.col(key_col), F.lit(2)),
        }
    )


def bucket_of(key_col: str, cfg: EngineConfig = DEFAULT):
    """The bucket expression (JVM-side) — the Iceberg ``bucket(B, key)``
    transform analog; url_seen rows carry it so the exact confirm join can
    prune to Bloom-positive buckets only."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(cfg.num_host_buckets)).cast("int")


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) bit positions via double hashing; all uint64 math."""
    i = np.arange(k, dtype=np.uint64)[None, :]
    return (
        h1.astype(np.uint64)[:, None] + i * h2.astype(np.uint64)[:, None]
    ) % np.uint64(m)


def build_blooms(
    seen: DataFrame,
    key_col: str = "surt",
    cfg: EngineConfig = DEFAULT,
    headroom: int = 1,
) -> DataFrame:
    """Build one Bloom row per bucket from the exact seen table.

    m is sized per bucket from its actual key count (bits_per_key ×
    headroom), so skewed buckets keep their false-positive rate. Pass
    headroom > 1 when the filter will be incrementally updated in place
    (update_blooms): keys can then be OR-ed in without resizing until the
    bucket holds headroom× its build-time count.
    """
    k = cfg.bloom_num_hashes
    bpk = cfg.bloom_bits_per_key

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        m = max(256, bpk * headroom * n)
        m = (m + 7) // 8 * 8
        bits = np.zeros(m // 8, dtype=np.uint8)
        pos = _positions(pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), k, m).ravel()
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64), (1 << (pos & np.uint64(7))).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["_bucket"].iat[0])],
                "m": [m],
                "n": [n],
                "bits": [bits.tobytes()],
            }
        )

    hashed = _hash_cols(seen.select(key_col), key_col, cfg.num_host_buckets)
    return hashed.groupBy("_bucket").applyInPandas(per_bucket, BLOOM_SCHEMA)


def update_blooms(
    blooms: DataFrame,
    new_keys: DataFrame,
    key_col: str = "surt",
    cfg: EngineConfig = DEFAULT,
    headroom: int = 4,
) -> DataFrame:
    """Incrementally fold a round's key *delta* into the per-bucket blooms.

    Cost is O(|delta| + total bloom bytes) per round instead of the
    O(|seen|) full rebuild — at a 10^10-row seen table re-hashing every
    key every round is the difference between a bloom maintenance stage
    and a second crawl.

    Per bucket (cogroup):
    - bucket unknown → fresh filter sized ``bpk × headroom × n`` (headroom
      lets future rounds OR in without resizing);
    - delta fits (``(n_old + n_new) · bpk ≤ m``) → OR the new positions
      into the existing blob (positions depend only on (h1, h2, m));
    - would overflow past the target FP rate → emit the row with
      ``bits = NULL``: the caller rebuilds those buckets from the exact
      seen table (crawler does this; overflow is amortized-rare because
      capacity doubles-ish each rebuild). A NULL-bits bucket is never
      probed optimistically — probe treats it as all-maybe, so
      correctness never depends on the rebuild happening.
    """
    k = cfg.bloom_num_hashes
    bpk = cfg.bloom_bits_per_key

    def per_bucket(new_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(bloom_pdf) == 0:  # fresh bucket
            n = len(new_pdf)
            m = max(256, bpk * headroom * n)
            m = (m + 7) // 8 * 8
            bits = np.zeros(m // 8, dtype=np.uint8)
            bkt = int(new_pdf["_bucket"].iat[0])
        else:
            m = int(bloom_pdf["m"].iat[0])
            n_old = int(bloom_pdf["n"].iat[0])
            n = n_old + len(new_pdf)
            bkt = int(bloom_pdf["bucket"].iat[0])
            if len(new_pdf) == 0:  # untouched bucket passes through
                return bloom_pdf[["bucket", "m", "n", "bits"]]
            if bloom_pdf["bits"].iat[0] is None or n * bpk > m:
                return pd.DataFrame(
                    {"bucket": [bkt], "m": [m], "n": [n], "bits": [None]}
                )
            bits = np.frombuffer(bloom_pdf["bits"].iat[0], dtype=np.uint8).copy()
        pos = _positions(new_pdf["_h1"].to_numpy(), new_pdf["_h2"].to_numpy(), k, m).ravel()
        np.bitwise_or.at(
            bits,
            (pos >> np.uint64(3)).astype(np.int64),
            (1 << (pos & np.uint64(7))).astype(np.uint8),
        )
        return pd.DataFrame({"bucket": [bkt], "m": [m], "n": [n], "bits": [bits.tobytes()]})

    hashed = _hash_cols(new_keys.select(key_col), key_col, cfg.num_host_buckets)
    return (
        hashed.groupBy("_bucket")
        .cogroup(blooms.groupBy("bucket"))
        .applyInPandas(per_bucket, BLOOM_SCHEMA)
    )


def merge_blooms(
    old_keys: DataFrame, new_keys: DataFrame, key_col: str = "surt", cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """Blooms covering old ∪ new keys.

    Rebuilt from raw keys rather than OR-ing blobs because per-bucket m
    grows with the key count (constant false-positive rate); a production
    variant would OR in place while m is unchanged and rebuild only
    overflowing buckets (per-bucket n is stored for exactly that check).
    """
    return build_blooms(
        old_keys.select(key_col).unionByName(new_keys.select(key_col)), key_col, cfg
    )


def probe_blooms(
    candidates: DataFrame,
    blooms: DataFrame,
    key_col: str = "surt",
    cfg: EngineConfig = DEFAULT,
    out_col: str = "_maybe_seen",
    bucket_out: str | None = None,
) -> DataFrame:
    """Tag each candidate with Bloom membership (False ⇒ definitely new).

    Cogrouped per bucket: the bloom blob crosses the wire once per bucket,
    not once per row; candidates shuffle only by bucket (same partitioning
    the exact confirm join reuses). A bucket with NULL bits (deferred
    overflow rebuild, see update_blooms) degrades to all-maybe — the exact
    confirm join still decides, so correctness is bloom-independent.

    bucket_out: when set, the bucket id survives in the output under that
    name (the confirm join uses it to prune the seen side).
    """
    k = cfg.bloom_num_hashes
    cand_cols = candidates.columns
    hashed = _hash_cols(candidates, key_col, cfg.num_host_buckets)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in hashed.schema.fields
    ) + f", {out_col} boolean"

    def per_bucket(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand_pdf) == 0:
            return cand_pdf.assign(**{out_col: pd.Series([], dtype=bool)})
        if len(bloom_pdf) == 0:
            return cand_pdf.assign(**{out_col: False})
        if bloom_pdf["bits"].iat[0] is None:
            return cand_pdf.assign(**{out_col: True})
        m = int(bloom_pdf["m"].iat[0])
        bits = np.frombuffer(bloom_pdf["bits"].iat[0], dtype=np.uint8)
        pos = _positions(cand_pdf["_h1"].to_numpy(), cand_pdf["_h2"].to_numpy(), k, m)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        mask = (1 << (pos & np.uint64(7))).astype(np.uint8)
        hit = (bits[byte_idx] & mask) == mask
        return cand_pdf.assign(**{out_col: hit.all(axis=1)})

    probed = (
        hashed.groupBy("_bucket")
        .cogroup(blooms.groupBy("bucket"))
        .applyInPandas(per_bucket, out_schema)
    )
    keep = [*cand_cols, out_col]
    if bucket_out:
        probed = probed.withColumnRenamed("_bucket", bucket_out)
        keep.append(bucket_out)
    return probed.select(*keep)
