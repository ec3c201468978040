"""Property-based cross-engine parity (hypothesis).

Generates adversarial string inputs and checks that the Spark expression and
its DuckDB SQL twin agree — the strongest guard for the correctness gate,
beyond the fixed-value tables.

Strategy note: one Spark job per hypothesis example would be minutes-slow, so
each property draws a LIST of values and runs one batched comparison, with
example counts kept small.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pytrousse_spark.functions.numeric_repair import repair_expr, repair_sql
from pytrousse_spark.functions import text as tx
from pytrousse_spark.functions.hashing import h60, h60_sql

# printable-ish strings incl. the repair cascade's special characters
dirty_chars = st.sampled_from(
    list("0123456789.,<>%°-+eE xX") + ["NV", "---", "None"]
)
dirty_string = st.lists(dirty_chars, min_size=0, max_size=8).map("".join)

text_string = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs", "Po")),
    max_size=60,
)


def _both(spark, values, spark_expr, sql_expr):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r["o"] for r in df.select(spark_expr(F.col("v")).alias("o")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(values)))
    exp = [r[0] for r in con.sql(f"SELECT {sql_expr('v')} FROM t ORDER BY i").fetchall()]
    con.close()
    return got, exp


def _num_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and (math.isnan(a) or math.isnan(b)):
        return math.isnan(a) and math.isnan(b)
    return a == pytest.approx(b, abs=1e-9)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(dirty_string, min_size=1, max_size=30))
def test_repair_cascade_parity(spark, values):
    got, exp = _both(spark, values, repair_expr, repair_sql)
    for v, g, e in zip(values, got, exp):
        assert _num_eq(g, e), f"repair({v!r}): spark={g} duck={e}"


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(text_string, min_size=1, max_size=20))
def test_h60_and_tokens_parity(spark, values):
    got, exp = _both(spark, values, h60, h60_sql)
    assert got == exp
    got_t, exp_t = _both(
        spark,
        values,
        lambda c: tx.token_count(c),
        lambda e: f"CAST(len({tx.tokens_sql(e)}) AS BIGINT)",
    )
    assert got_t == exp_t


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(text_string, min_size=1, max_size=15))
def test_fingerprint_parity(spark, values):
    got, exp = _both(spark, values, tx.fingerprint, tx.fingerprint_sql)
    assert got == exp
