"""Mergeable-partial rollup laws (operators/incremental.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pytrousse_spark.io import read_parquet_df
from pytrousse_spark.operators.incremental import (
    merge_rollups,
    partial_rollup,
    rollup_view,
)
from tests.conftest import SF_DIR

KEYS = ["o_orderpriority", "o_orderstatus"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_equals_direct(spark):
    """Defining law: merge(partial(A), partial(B)) == partial(A ∪ B)
    bit-for-bit — holds because sums ride integer micro-units."""
    o = read_parquet_df(spark, f"{SF_DIR}/orders.parquet")
    a = o.where(F.col("o_orderkey") % 3 == 0)
    b = o.where(F.col("o_orderkey") % 3 != 0)
    merged = merge_rollups(
        [partial_rollup(a, KEYS, "o_totalprice"),
         partial_rollup(b, KEYS, "o_totalprice")],
        KEYS,
    )
    direct = partial_rollup(o, KEYS, "o_totalprice")
    assert _rows(merged) == _rows(direct)


def test_merge_many_way_and_view(spark):
    """Ten-way shard merge == direct, and the read-time view derives the
    exact decimal sum."""
    o = read_parquet_df(spark, f"{SF_DIR}/orders.parquet")
    shards = [
        partial_rollup(
            o.where(F.col("o_orderkey") % 10 == i), KEYS, "o_totalprice"
        )
        for i in range(10)
    ]
    merged = merge_rollups(shards, KEYS)
    assert _rows(merged) == _rows(partial_rollup(o, KEYS, "o_totalprice"))
    v = rollup_view(merged, KEYS)
    r = v.where(
        (F.col(KEYS[0]) == v.select(KEYS[0]).first()[0])
    ).first()
    assert abs(r["sum_value"] - r["avg_value"] * r["n_rows"]) < 1e-3
    assert r["min_value"] <= r["max_value"]


def test_null_values_excluded(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.5), ("a", "x", None), ("a", "y", 2.0)],
        ["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )
    got = {
        (r[0], r[1]): (r["n_rows"], r["sum_micro"])
        for r in partial_rollup(df, KEYS, "o_totalprice").collect()
    }
    assert got == {("a", "x"): (1, 1_500_000), ("a", "y"): (1, 2_000_000)}
