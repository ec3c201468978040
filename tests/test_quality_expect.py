"""Laws for the declarative expectations operator (operators/quality.py)."""

from __future__ import annotations

import pytest

from pytrousse_spark.operators.quality import expect


def test_expect_null_condition_is_violation(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (-2.0,)], "v double"
    )
    out = {r["rule"]: r for r in expect(df, {"v_pos": "v > 0"}).collect()}
    r = out["v_pos"]
    assert r["n_rows"] == 3
    assert r["n_violations"] == 2  # NULL counts as violation
    assert r["violation_rate"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["passed"] is False


def test_expect_uniqueness_rule(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 2), (2, 1)], "a bigint, b bigint"
    )
    out = {
        r["rule"]: r
        for r in expect(
            df, {"a_pos": "a > 0"}, unique={"ab_unique": ["a", "b"]}
        ).collect()
    }
    assert out["ab_unique"]["n_violations"] == 1
    assert out["a_pos"]["passed"] is True


def test_expect_rejects_empty_and_duplicate_names(spark):
    df = spark.createDataFrame([(1,)], "a bigint")
    with pytest.raises(ValueError):
        expect(df, {})
    with pytest.raises(ValueError):
        expect(df, {"r": "a > 0"}, unique={"r": ["a"]})
