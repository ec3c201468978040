"""Kaplan-Meier product-limit laws (operators/survival.py)."""

from __future__ import annotations

import pytest

from pytrousse_spark.operators.survival import kaplan_meier, kaplan_meier_sql


def test_km_textbook_example(spark):
    """Classic hand example: durations 1,2+,3,4+,5 (+ = censored).
    Risk sets 5,3,1; S(1)=4/5, S(3)=4/5*2/3=8/15, S(5)=0 (d==n)."""
    rows = [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0), (5.0, 1)]
    df = spark.createDataFrame(rows, "dur double, e int")
    out = {r["t"]: r for r in kaplan_meier(df, "dur", "e").collect()}
    assert set(out) == {1.0, 3.0, 5.0}
    assert out[1.0]["n_risk"] == 5 and out[1.0]["survival"] == 0.8
    assert out[3.0]["n_risk"] == 3
    assert abs(out[3.0]["survival"] - 8 / 15) < 1e-6
    assert out[5.0]["n_risk"] == 1 and out[5.0]["survival"] == 0.0


def test_km_no_censoring_equals_tail_fraction(spark):
    """With zero censoring, KM reduces to the empirical survivor
    function (n - cum_events) / n — the estimator's sanity anchor."""
    durs = [1.0] * 3 + [2.0] * 5 + [4.0] * 2
    df = spark.createDataFrame([(d, 1) for d in durs], "dur double, e int")
    out = {r["t"]: r["survival"] for r in kaplan_meier(df, "dur", "e").collect()}
    assert abs(out[1.0] - 7 / 10) < 1e-6
    assert abs(out[2.0] - 2 / 10) < 1e-6
    assert out[4.0] == 0.0
    # monotone non-increasing
    curve = [out[t] for t in sorted(out)]
    assert curve == sorted(curve, reverse=True)


def test_km_all_censored_and_nulls(spark):
    df = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (None, 1), (3.0, None)], "dur double, e int"
    )
    assert kaplan_meier(df, "dur", "e").count() == 0


def test_km_sql_twin(spark):
    import duckdb

    from tests.conftest import assert_df_matches_sql

    rows = [(float(i % 7), i % 3 != 0) for i in range(200)]
    df = spark.createDataFrame(
        [(d, int(e)) for d, e in rows], "dur double, e int"
    )
    pdf = df.toPandas()  # noqa: F841
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM pdf")
    assert_df_matches_sql(
        kaplan_meier(df, "dur", "e"),
        con,
        kaplan_meier_sql("SELECT * FROM t", "dur", "e"),
    )
    con.close()


def test_nelson_aalen_companion(spark):
    """Nelson-Aalen cumulative hazard: sum of d/n at event times, and
    exp(-H) tracks the KM survival (small-hazard approximation)."""
    rows = [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0), (5.0, 1)]
    df = spark.createDataFrame(rows, "dur double, e int")
    out = {r["t"]: r for r in kaplan_meier(df, "dur", "e").collect()}
    assert abs(out[1.0]["na_cumhazard"] - 1 / 5) < 1e-6
    assert abs(out[3.0]["na_cumhazard"] - (1 / 5 + 1 / 3)) < 1e-6
    assert abs(out[5.0]["na_cumhazard"] - (1 / 5 + 1 / 3 + 1.0)) < 1e-6
    # monotone non-decreasing
    hs = [out[t]["na_cumhazard"] for t in sorted(out)]
    assert hs == sorted(hs)
    # small-hazard regime: exp(-H) ~ KM survival within 2% relative
    import math

    many = spark.createDataFrame(
        [(float(i % 50), 1 if i % 7 else 0) for i in range(3000)],
        "dur double, e int",
    )
    for r in kaplan_meier(many, "dur", "e").collect()[:20]:
        if r["survival"] > 0.5:
            assert abs(math.exp(-r["na_cumhazard"]) - r["survival"]) < 0.02
