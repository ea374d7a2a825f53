"""Mimic the DRIVER's result canonicalization, not the local gate's.

The driver harness (see CORRECTNESS_r04.json's quantize_embeddings
traceback) canonicalizes each result with pandas:
``df[sorted(cols)].sort_values(by=sorted(cols))`` — which *crashes* on
any list-typed column (``Categorical`` factorize → "unhashable type:
'list'") and is sensitive to mixed-type object columns in ways the
local gate's tuple-normalizing compare (tools/check_oracle.py) is not.

This tool runs every ``queries()`` entry plus its DuckDB twin through
that exact canonicalization and diffs the frames, so a driver-side
crash or mismatch is caught BEFORE the round's CORRECTNESS window.

Usage: python tools/check_canon.py [sf_dir] [first_n] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols)  # driver does this: crashes on lists
    return df.reset_index(drop=True)


def _cell_eq(a, b) -> bool:
    na_a = not isinstance(a, (list, tuple)) and pd.isna(a)
    na_b = not isinstance(b, (list, tuple)) and pd.isna(b)
    if na_a or na_b:
        return na_a and na_b  # None/NaN/NaT on both sides (driver parity)
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    first_n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    only = set(sys.argv[3:])

    import __spark_entry__ as E
    from crawler_spark.session import get_spark

    spark = get_spark(app_name="check-canon", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    if only:
        # explicitly-named queries bypass the first_n window — a name
        # outside the window must be checked, not silently skipped
        unknown = only - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 2
        keys = [k for k in qs if k in only]
    else:
        keys = list(qs)[: first_n or len(qs)]
    if not keys:
        print("no queries selected")
        return 2

    bad = 0
    for k in keys:
        try:
            sp = _canon(qs[k](spark, sf_dir).toPandas())
            if k not in oracles:
                print(f"rows  {k}: {len(sp)} rows (no SQL twin; driver does rows-only)")
                continue
            du = _canon(con.execute(oracles[k]).fetchdf())
        except Exception as ex:  # the quantize_embeddings failure mode
            print(f"CRASH {k}: {type(ex).__name__}: {str(ex)[:160]}")
            bad += 1
            continue
        if list(sp.columns) != list(du.columns):
            print(f"FAIL  {k}: columns {list(sp.columns)} vs {list(du.columns)}")
            bad += 1
            continue
        if len(sp) != len(du):
            print(f"FAIL  {k}: rows {len(sp)} vs {len(du)}")
            bad += 1
            continue
        mism = None
        for c in sp.columns:
            av, bv = sp[c].tolist(), du[c].tolist()
            for i, (a, b) in enumerate(zip(av, bv)):
                if not _cell_eq(a, b):
                    mism = (c, i, a, b)
                    break
            if mism:
                break
        if mism:
            print(f"FAIL  {k}: col={mism[0]} row={mism[1]}: {mism[2]!r} vs {mism[3]!r}")
            bad += 1
        else:
            print(f"ok    {k}: {len(sp)} rows canon-match")

    print(f"\n{len(keys) - bad}/{len(keys)} ok")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
