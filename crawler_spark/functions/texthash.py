"""Portable deterministic 64-bit hashing (Spark column + ANSI-SQL form).

Every dedup/LSH operator in this engine (exact dedup, MinHash, SimHash,
LSH bands, sign-hyperplane buckets) keys off ONE hash definition:

    h64(s) = int64( first 15 hex chars of md5(s) )   # 60 bits, never negative

Why md5-prefix instead of ``xxhash64``: the driver's correctness gate
re-executes every query in DuckDB, and md5 is the only 64-bit-capable
hash both engines compute bit-identically. 60 bits is plenty for
MinHash/SimHash/banding collision behavior, and the JVM evaluates md5
inside whole-stage codegen (no Python in the hot path). At the
10^10-row tier md5 costs ~2x xxhash64 per call — swap `h64` for
``F.xxhash64`` in production and only the oracle changes.

Seeded family: ``h64_seeded(s, j) = h64('s<j>:' || s)`` — the standard
"salt the input" construction for k independent MinHash permutations.

The SQL generators here are the single source of truth for
``__spark_entry__.oracle_sql()`` — Spark and SQL forms live side by side
so they cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ------------------------------------------------------------- Spark side --


def h64(col: Column) -> Column:
    """Deterministic non-negative int64 hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h64_seeded(col: Column, seed: int) -> Column:
    """j-th member of the hash family (independent MinHash permutation)."""
    return h64(F.concat(F.lit(f"s{seed}:"), col))


# --------------------------------------------------------------- SQL side --


def sql_h64(expr: str) -> str:
    """DuckDB-executable ANSI form of :func:`h64` (bit-identical)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def sql_h64_seeded(expr: str, seed: int) -> str:
    return sql_h64(f"('s{seed}:' || {expr})")


# ---- portable (Spark ∧ DuckDB) seeded md5 keys ------------------------
#
# xxhash64 has no DuckDB twin, so cross-engine randomness derives from
# md5(seed || ':' || id): `seeded_md5_key` is the string key (order by
# it for deterministic shuffles), `hex_prefix_value` decodes its first
# n hex digits into a uniform integer in [0, 16^n) with pure instr
# arithmetic — both engines bit-identical. Shared by shardshuffle
# (1-digit shard map) and mixing (6-digit tail-sample rate test).

HEX_DIGITS = "0123456789abcdef"


def seeded_md5_key(seed: str, id_col: Column) -> Column:
    return F.md5(F.concat(F.lit(str(seed)), F.lit(":"), id_col.cast("string")))


def hex_prefix_value(key: Column, ndigits: int) -> Column:
    v = F.lit(0)
    for i in range(ndigits):
        v = v * 16 + (F.instr(F.lit(HEX_DIGITS), F.substring(key, i + 1, 1)) - 1)
    return v.cast("long")
