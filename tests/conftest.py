"""Shared Spark session + DuckDB oracle helpers for the test suite."""

from __future__ import annotations

import os

import duckdb
import pytest

from pytrousse_spark.session import get_spark

SF_DIR = os.environ.get("PYTROUSSE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytrousse-tests", shuffle_partitions=8)
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


def assert_df_matches_sql(spark_df, duck_con, sql, float_round=6):
    """Order-insensitive comparison of a Spark DataFrame vs DuckDB SQL result,
    mirroring the driver's row-count + schema + value-hash check."""
    import math

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
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
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
