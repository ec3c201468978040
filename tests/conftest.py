"""Shared Spark session + DuckDB oracle helpers for the test suite."""

from __future__ import annotations

import os

import duckdb
import pytest

from pytrousse_spark.session import get_spark

SF_DIR = os.environ.get("PYTROUSSE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    extra = {}
    if os.environ.get("SPARK_GRAFT_TEST_NO_AQE") == "1":
        extra["spark.sql.adaptive.enabled"] = "false"
    s = get_spark(
        app_name="pytrousse-tests", shuffle_partitions=8, extra_conf=extra
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _duck_type_to_spark(t: str) -> str:
    """Normalize a DuckDB declared type to Spark's simpleString form.

    HUGEINT deliberately maps to a non-Spark marker: DuckDB widens integer
    window/aggregate sums to INT128, which serializes differently from
    Spark's LONG at the driver even when values are equal (the q11/q68 bug
    class) — any oracle emitting it must CAST to BIGINT."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return f"array<{_duck_type_to_spark(t[:-2])}>"
    m = {
        "TINYINT": "tinyint",
        "SMALLINT": "smallint",
        "INTEGER": "int",
        "BIGINT": "bigint",
        "HUGEINT": "hugeint!cast-oracle-to-BIGINT",
        "UTINYINT": "hugeint!cast-oracle-to-BIGINT",
        "USMALLINT": "hugeint!cast-oracle-to-BIGINT",
        "UINTEGER": "hugeint!cast-oracle-to-BIGINT",
        "UBIGINT": "hugeint!cast-oracle-to-BIGINT",
        "FLOAT": "float",
        "REAL": "float",
        "DOUBLE": "double",
        "VARCHAR": "string",
        "BOOLEAN": "boolean",
        "DATE": "date",
        "TIMESTAMP": "timestamp",
        "TIMESTAMP WITH TIME ZONE": "timestamp",
        "BLOB": "binary",
    }
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    return m.get(t, t.lower())


def assert_types_match_sql(spark_df, duck_con, sql):
    """Declared-type parity: every output column must have the SAME type in
    Spark and in the DuckDB oracle. Values-only comparison let two HUGEINT
    widenings (q11 r1-r2, q68 r3) pass locally and hash-red at the driver;
    this closes that gap for good."""
    duck_rel = duck_con.sql(sql)
    dtypes = {
        c: _duck_type_to_spark(str(t))
        for c, t in zip(duck_rel.columns, duck_rel.types)
    }
    stypes = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    mismatches = {
        c: (stypes.get(c), dtypes.get(c))
        for c in set(stypes) | set(dtypes)
        if stypes.get(c) != dtypes.get(c)
    }
    assert not mismatches, (
        "oracle/spark declared types differ (spark, duckdb): " + repr(mismatches)
    )


def assert_df_matches_sql(spark_df, duck_con, sql, float_round=6, check_types=True):
    """Order-insensitive comparison of a Spark DataFrame vs DuckDB SQL result,
    mirroring the driver's row-count + schema + value-hash check, plus a
    declared-type parity check (serialization-faithful, see
    assert_types_match_sql).

    ARRAY/MAP/STRUCT outputs are REJECTED, not normalized: the driver's
    canonicalizer is a plain pandas sort_values, which crashes on list
    cells (`TypeError: unhashable type: 'list'` — the q294 r9 red row).
    This harness must be at least as strict as the driver so local green
    implies driver green; flatten complex outputs to scalar columns."""
    import math

    from pyspark.sql import types as _T

    complex_cols = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (_T.ArrayType, _T.MapType, _T.StructType))
    ]
    assert not complex_cols, (
        "array/map/struct output columns are not driver-canonicalizable "
        f"(pandas sort_values crashes on list cells): {complex_cols}; "
        "flatten to scalar columns in BOTH engines"
    )
    if check_types:
        assert_types_match_sql(spark_df, duck_con, sql)
    sdata = spark_df.collect()
    scols = sorted(spark_df.columns)
    duck_rel = duck_con.sql(sql)
    dcols = sorted(duck_rel.columns)
    assert scols == dcols, f"columns differ: {scols} vs {dcols}"
    ddata = duck_rel.fetchall()
    assert len(sdata) == len(ddata), f"row counts differ: {len(sdata)} vs {len(ddata)}"

    def norm(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, float_round)
        if isinstance(v, (list, tuple, dict, set)):
            raise AssertionError(
                "list/map cell reached the canon — the driver's pandas "
                f"sort_values cannot handle it: {v!r}"
            )
        return v

    def key(values):
        # None-safe, type-stable sort key
        return tuple((v is None, str(type(v).__name__), v if v is not None else 0) for v in values)

    snorm = [tuple(norm(r.asDict()[c]) for c in scols) for r in sdata]
    dname = duck_rel.columns
    dnorm = [tuple(norm(dict(zip(dname, r))[c]) for c in scols) for r in ddata]
    srows = sorted(snorm, key=key)
    drows = sorted(dnorm, key=key)
    assert srows == drows, (
        f"values differ; first spark={srows[:3]} duck={drows[:3]}"
    )
