"""Arrow-schema parity between every (queries, oracle_sql) pair.

The driver's value-hash is type-sensitive: DuckDB widens ``sum(BIGINT)``
to HUGEINT, which its Arrow export types as ``decimal128(38,0)``; Spark's
``sum(long)`` is ``int64``.  Identical values then hash differently (this
failed ``media_type_stats`` in rounds 1-2).  tools/check_oracle.py
normalizes values before comparing, so it can never see this class of
bug — this test closes the gap by asserting the DuckDB Arrow schema maps
1:1 onto the Spark DataFrame schema for every oracled query, and by
rejecting any decimal128 the Spark side doesn't also declare.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pytest
from pyspark.sql import types as T

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _compatible(pa_type: pa.DataType, s_type: T.DataType) -> bool:
    """Does the DuckDB Arrow type hash-match the Spark type in the
    driver's typed compare?  (int64<->long, double<->double, ...)"""
    if pa.types.is_decimal(pa_type):
        # decimal128 only matches an explicitly-declared Spark decimal of
        # the same precision/scale; anything else is the hugeint trap.
        return (
            isinstance(s_type, T.DecimalType)
            and s_type.precision == pa_type.precision
            and s_type.scale == pa_type.scale
        )
    if pa.types.is_int64(pa_type):
        return isinstance(s_type, T.LongType)
    if pa.types.is_int32(pa_type):
        return isinstance(s_type, (T.IntegerType,))
    if pa.types.is_int16(pa_type):
        return isinstance(s_type, T.ShortType)
    if pa.types.is_int8(pa_type):
        return isinstance(s_type, T.ByteType)
    if pa.types.is_float64(pa_type):
        return isinstance(s_type, T.DoubleType)
    if pa.types.is_float32(pa_type):
        return isinstance(s_type, T.FloatType)
    if pa.types.is_string(pa_type) or pa.types.is_large_string(pa_type):
        return isinstance(s_type, T.StringType)
    if pa.types.is_boolean(pa_type):
        return isinstance(s_type, T.BooleanType)
    if pa.types.is_timestamp(pa_type):
        return isinstance(s_type, (T.TimestampType, T.TimestampNTZType))
    if pa.types.is_date(pa_type):
        return isinstance(s_type, T.DateType)
    if pa.types.is_binary(pa_type) or pa.types.is_large_binary(pa_type):
        return isinstance(s_type, T.BinaryType)
    if pa.types.is_list(pa_type) or pa.types.is_large_list(pa_type):
        return isinstance(s_type, T.ArrayType) and _compatible(
            pa_type.value_type, s_type.elementType
        )
    return False


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _pairs():
    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    return [(name, qs[name], oracles[name]) for name in qs if name in oracles]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=lambda p: p if isinstance(p, str) else "")
def test_arrow_schema_parity(spark, duck, name, fn, sql):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"testdata missing: {SF_DIR}")
    s_schema = {f.name: f.dataType for f in fn(spark, SF_DIR).schema.fields}
    a_schema = duck.execute(sql).arrow().schema
    a_fields = {a_schema.field(i).name: a_schema.field(i).type for i in range(len(a_schema))}

    assert sorted(s_schema) == sorted(a_fields), (
        f"{name}: column names differ: spark={sorted(s_schema)} duck={sorted(a_fields)}"
    )
    bad = [
        (col, str(a_fields[col]), s_schema[col].simpleString())
        for col in s_schema
        if not _compatible(a_fields[col], s_schema[col])
    ]
    assert not bad, (
        f"{name}: Arrow/Spark type mismatch (driver value-hash WILL differ): {bad}"
        " — cast the oracle (e.g. CAST(sum(x) AS BIGINT)) or the Spark column"
    )


def test_detects_uncast_hugeint(duck):
    """Self-check: an un-cast DuckDB sum(BIGINT) must be flagged."""
    t = duck.execute(
        "SELECT sum(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)"
    ).arrow()
    assert not _compatible(t.schema.field(0).type, T.LongType()), (
        "checker failed to flag decimal128 vs long"
    )
    ok = duck.execute(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)"
    ).arrow()
    assert _compatible(ok.schema.field(0).type, T.LongType())
