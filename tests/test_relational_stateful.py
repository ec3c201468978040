"""Skew-salted joins, partitioned/bucketed sinks, stateful streaming."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pytrousse_spark import read_parquet_df
from pytrousse_spark.operators.relational import (
    salted_join,
    write_bucketed,
    write_partitioned,
)
from pytrousse_spark.streaming.events import read_events_stream, run_stream_to_memory
from pytrousse_spark.streaming.stateful import running_user_stats
from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        ["k", "v"],
    )
    right = spark.createDataFrame([("hot", "H"), ("cold", "C")], ["k", "tag"])
    plain = salted_join(left, right, "k")
    got = sorted((r["k"], r["v"], r["tag"]) for r in plain.collect())
    expect = sorted(
        (r["k"], r["v"], r["tag"]) for r in left.join(right, "k").collect()
    )
    assert got == expect
    assert len(got) == 505


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    right = spark.createDataFrame([("a", "A")], ["k", "tag"])
    got = {(r["k"], r["tag"]) for r in salted_join(left, right, "k", how="left").collect()}
    assert got == {("a", "A"), ("b", None)}


def test_write_partitioned_prunes(spark, tmp_path):
    df = read_parquet_df(spark, f"{SF_DIR}/documents.parquet")
    path = os.path.join(tmp_path, "by_lang")
    write_partitioned(df, path, ["lang"])
    langs = {d.split("=")[1] for d in os.listdir(path) if d.startswith("lang=")}
    assert len(langs) >= 2
    back = spark.read.parquet(path).where(F.col("lang") == sorted(langs)[0])
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert back.count() == df.where(F.col("lang") == sorted(langs)[0]).count()


def test_write_bucketed_avoids_shuffle(spark, tmp_path):
    df = read_parquet_df(spark, f"{SF_DIR}/orders.parquet")
    write_bucketed(df, "orders_b", "o_custkey", 4, sort_by="o_custkey")
    t = spark.table("orders_b")
    joined = t.alias("a").join(t.alias("b"), on="o_custkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # bucketed self-join on the bucket key: no shuffle exchange
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_stateful_running_stats_stream_vs_batch(spark, tmp_path_factory):
    import shutil

    d = tmp_path_factory.mktemp("ev")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    stream = read_events_stream(spark, str(d))
    stats = running_user_stats(stream)
    run_stream_to_memory(stats, "user_stats", timeout_sec=180, output_mode="update")
    # update mode emits one row per user per micro-batch; with one input file
    # there is exactly one batch -> final rows
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"])
        for r in spark.sql("SELECT * FROM user_stats").collect()
    }
    batch = read_parquet_df(spark, f"{SF_DIR}/events.parquet")
    expect = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"])
        for r in running_user_stats(batch).collect()
    }
    assert set(got) == set(expect)
    for u in expect:
        assert got[u][0] == expect[u][0]
        assert got[u][1] == pytest.approx(expect[u][1], abs=1e-3)
        assert got[u][2] == pytest.approx(expect[u][2])
