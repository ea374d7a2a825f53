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


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) bit positions via double hashing; all uint64 math."""
    i = np.arange(k, dtype=np.uint64)[None, :]
    return (
        h1.astype(np.uint64)[:, None] + i * h2.astype(np.uint64)[:, None]
    ) % np.uint64(m)


def build_blooms(
    seen: DataFrame, key_col: str = "surt", cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """Build one Bloom row per bucket from the exact seen table.

    m is sized per bucket from its actual key count (bits_per_key), so
    skewed buckets keep their false-positive rate.
    """
    k = cfg.bloom_num_hashes
    bpk = cfg.bloom_bits_per_key

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        m = max(256, bpk * n)
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
) -> DataFrame:
    """Tag each candidate with Bloom membership (False ⇒ definitely new).

    Cogrouped per bucket: the bloom blob crosses the wire once per bucket,
    not once per row; candidates shuffle only by bucket (same partitioning
    the exact confirm join reuses).
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
    return probed.select(*cand_cols, out_col)
