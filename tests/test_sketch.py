"""Count-Min sketch laws: never undercounts, mergeable, bounded grid."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pytrousse_spark import read_parquet_df
from pytrousse_spark.functions.text import tokens
from pytrousse_spark.operators import sketch as sk
from tests.conftest import SF_DIR

W, D = 1 << 14, 4


@pytest.fixture(scope="module")
def toks(spark):
    docs = read_parquet_df(spark, f"{SF_DIR}/documents.parquet")
    return (
        docs.where(F.col("text").isNotNull())
        .select(F.explode(tokens(F.col("text"))).alias("token"))
        .persist()
    )


def test_never_undercounts_any_token(toks):
    grid = sk.count_min_build(toks, "token", w=W, d=D)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    est = sk.count_min_estimate(exact, "token", grid, w=W, d=D)
    bad = est.where(F.col("cm_estimate") < F.col("exact_n")).count()
    assert bad == 0
    # and the total overcount is small relative to the corpus at this w
    tot = est.agg(
        F.sum("exact_n").alias("n"), F.sum(F.col("cm_estimate") - F.col("exact_n")).alias("over")
    ).first()
    assert tot["over"] <= 0.05 * tot["n"]


def test_grid_bounded_and_mass_preserved(toks):
    grid = sk.count_min_build(toks, "token", w=W, d=D)
    n_tokens = toks.count()
    rows = grid.collect()
    assert len(rows) <= W * D
    # every one of the d rows carries the full token mass
    per_row = {}
    for r in rows:
        per_row[r["j"]] = per_row.get(r["j"], 0) + r["c"]
    assert set(per_row) == set(range(D))
    assert all(v == n_tokens for v in per_row.values())


def test_sketches_merge_by_cellwise_sum(toks, spark):
    a = toks.where(F.length("token") % 2 == 0)
    b = toks.where(F.length("token") % 2 == 1)
    ga = sk.count_min_build(a, "token", w=256, d=2)
    gb = sk.count_min_build(b, "token", w=256, d=2)
    merged = (
        ga.unionByName(gb)
        .groupBy("j", "pos")
        .agg(F.sum("c").alias("c"))
    )
    whole = sk.count_min_build(toks, "token", w=256, d=2)
    got = {(r["j"], r["pos"]): r["c"] for r in merged.collect()}
    want = {(r["j"], r["pos"]): r["c"] for r in whole.collect()}
    assert got == want


def test_unseen_key_estimates_zero_with_wide_grid(toks, spark):
    grid = sk.count_min_build(toks, "token", w=1 << 20, d=D)
    probe = spark.createDataFrame(
        [("zzz-never-a-token-9c41f",)], ["token"]
    )
    est = sk.count_min_estimate(probe, "token", grid, w=1 << 20, d=D)
    assert est.first()["cm_estimate"] == 0


def test_xxhash_tier_runs(toks):
    grid = sk.count_min_build(toks, "token", w=W, d=D, hash_fn="xxhash64")
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n")).limit(20)
    est = sk.count_min_estimate(exact, "token", grid, w=W, d=D, hash_fn="xxhash64")
    assert est.where(F.col("cm_estimate") < F.col("exact_n")).count() == 0
