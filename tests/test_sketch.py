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


def test_hll_estimate_accuracy(spark):
    """HLL at p=12 must land within a few percent on a multi-thousand
    distinct set (theoretical rse ~1.6%)."""
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.sketch import hll_estimate_row, hll_registers

    df = spark.range(0, 20000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    regs = hll_registers(df, "k", p=12)
    est = hll_estimate_row([(r["bucket"], r["r"]) for r in regs.collect()], p=12)
    assert abs(est["estimate"] - 20000) / 20000 < 0.05


def test_hll_registers_merge_by_max(spark):
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.sketch import hll_registers

    df = spark.range(0, 5000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    a = df.where("id % 2 = 0")
    b = df.where("id % 2 = 1")
    ra = hll_registers(a, "k", p=8)
    rb = hll_registers(b, "k", p=8)
    merged = (
        ra.unionByName(rb).groupBy("bucket").agg(F.max("r").alias("r"))
    )
    whole = hll_registers(df, "k", p=8)
    got = {(r["bucket"], r["r"]) for r in merged.collect()}
    want = {(r["bucket"], r["r"]) for r in whole.collect()}
    assert got == want


def test_hll_insensitive_to_duplicates(spark):
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.sketch import hll_estimate_row, hll_registers

    base = spark.range(0, 1000).select(
        F.concat(F.lit("d"), F.col("id")).alias("k")
    )
    dup = base.unionByName(base).unionByName(base)
    r1 = hll_registers(base, "k", p=10).collect()
    r3 = hll_registers(dup, "k", p=10).collect()
    assert {(r["bucket"], r["r"]) for r in r1} == {(r["bucket"], r["r"]) for r in r3}


def test_histogram_quantiles_close_to_exact(spark):
    from pytrousse_spark.operators.sketch import histogram_quantile_estimates

    df = spark.range(0, 50000).select((F.col("id") * 3.5 + 7.0).alias("x"))
    ests = {e["q"]: e["estimate"] for e in histogram_quantile_estimates(df, "x", [0.1, 0.5, 0.9], 4096)}
    exact = df.selectExpr(
        "percentile(x, 0.1) p10", "percentile(x, 0.5) p50", "percentile(x, 0.9) p90"
    ).first()
    for q, ex in [(0.1, exact["p10"]), (0.5, exact["p50"]), (0.9, exact["p90"])]:
        assert abs(ests[q] - ex) / ex < 0.01, (q, ests[q], ex)


def test_histogram_quantiles_constant_column(spark):
    from pytrousse_spark.operators.sketch import histogram_quantile_estimates

    df = spark.range(0, 100).select(F.lit(42.0).alias("x"))
    ests = histogram_quantile_estimates(df, "x", [0.5])
    assert ests == [{"q": 0.5, "estimate": 42.0}]


def test_hll_merge_equals_whole_corpus_sketch(spark):
    """Mergeability law: bucket-wise max of per-group registers must equal
    the registers built over the whole corpus in one pass — merge(sketch(A),
    sketch(B)) == sketch(A ∪ B), the property that lets a 100 TB run build
    registers per shard and combine them without re-reading data."""
    from pytrousse_spark.operators.sketch import (
        hll_estimate_row,
        hll_merge_registers,
        hll_registers,
        hll_registers_grouped,
    )

    df = spark.range(0, 3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("k"), (F.col("id") % 700)).alias("k"),
    )
    grouped = hll_registers_grouped(df, "g", "k", p=10)
    merged = {
        (r["bucket"], r["r"]) for r in hll_merge_registers(grouped).collect()
    }
    direct = {
        (r["bucket"], r["r"]) for r in hll_registers(df, "k", p=10).collect()
    }
    assert merged == direct
    e_m = hll_estimate_row(sorted(merged), p=10)
    e_d = hll_estimate_row(sorted(direct), p=10)
    assert e_m == e_d


def test_histogram_quantiles_null_rows_excluded(spark):
    """ADVICE r3: NULL rows must not inflate the quantile target n — the
    estimate over a column with NULLs equals the estimate over the
    pre-filtered column."""
    from pytrousse_spark.operators.sketch import histogram_quantile_estimates

    clean = spark.range(0, 5000).select((F.col("id") * 1.0).alias("x"))
    dirty = spark.range(0, 5000).select(
        F.when(F.col("id") % 5 != 0, F.col("id") * 1.0).alias("x")
    )
    clean_only = clean.where("x % 5 != 0")
    e_dirty = histogram_quantile_estimates(dirty, "x", [0.5, 0.9], 1024)
    e_clean = histogram_quantile_estimates(clean_only, "x", [0.5, 0.9], 1024)
    assert e_dirty == e_clean


def test_hll_trailing_accuracy_and_totalwindow(spark):
    """Trailing-window HLL: every day's estimate within 10% of the exact
    trailing distinct, and a window covering all days reproduces a
    whole-corpus single sketch (mergeability across the time axis)."""
    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.sketch import (
        hll_estimate_row,
        hll_registers,
        hll_trailing_distinct,
    )
    from tests.conftest import SF_DIR

    ev = read_parquet_df(spark, f"{SF_DIR}/events.parquet")
    rows = hll_trailing_distinct(ev, "ts", "user_id", 7, p=9).collect()
    import duckdb

    con = duckdb.connect()
    exact = dict(
        con.execute(
            f"""
            WITH d AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE)
                       AS day FROM '{SF_DIR}/events.parquet')
            SELECT d.day, count(DISTINCT e.user_id)
            FROM d JOIN '{SF_DIR}/events.parquet' e
              ON CAST(date_trunc('day', e.ts) AS DATE)
                 BETWEEN d.day - 6 AND d.day
            GROUP BY d.day
            """
        ).fetchall()
    )
    assert len(rows) == len(exact)
    for r in rows:
        assert abs(r["estimate"] - exact[r["day"]]) / exact[r["day"]] < 0.10
    # all-days window == one whole-corpus sketch, day by day for the
    # final day (the union of everything)
    wide = {
        r["day"]: r["estimate"]
        for r in hll_trailing_distinct(ev, "ts", "user_id", 365, p=9).collect()
    }
    whole = hll_estimate_row(
        [(r["bucket"], r["r"]) for r in hll_registers(ev, "user_id", p=9).collect()],
        p=9,
    )["estimate"]
    assert wide[max(wide)] == whole


def test_cm_join_size_never_undercounts(spark):
    """CM inner-product join-size estimate >= exact F2, and tightens as
    the grid widens (fewer collisions)."""
    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.sketch import count_min_self_join_size
    from tests.conftest import SF_DIR

    li = read_parquet_df(spark, f"{SF_DIR}/lineitem.parquet")
    narrow = count_min_self_join_size(li, "l_partkey", w=1 << 10).first()
    wide = count_min_self_join_size(li, "l_partkey", w=1 << 14).first()
    assert narrow["cm_estimate"] >= narrow["exact_f2"]
    assert wide["cm_estimate"] >= wide["exact_f2"]
    assert wide["ratio"] <= narrow["ratio"]
    assert wide["ratio"] < 1.2


def test_grouped_quantiles_accuracy_and_constant_group(spark):
    """Grouped histogram quantiles within 1% of exact per group; a
    constant group estimates its constant exactly."""
    from pyspark.sql import functions as F

    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.sketch import histogram_quantiles_grouped
    from tests.conftest import SF_DIR

    li = read_parquet_df(spark, f"{SF_DIR}/lineitem.parquet")
    got = {
        (r["l_returnflag"], r["q"]): r["estimate"]
        for r in histogram_quantiles_grouped(
            li, "l_returnflag", "l_extendedprice", [0.5, 0.95], 1024
        ).collect()
    }
    exact = {
        (r["l_returnflag"], q): r["e"]
        for q in (0.5, 0.95)
        for r in li.groupBy("l_returnflag")
        .agg(F.expr(f"percentile(l_extendedprice, {q})").alias("e"))
        .collect()
    }
    assert set(got) == set(exact)
    for k in got:
        assert abs(got[k] - exact[k]) / exact[k] < 0.01
    cdf = spark.createDataFrame(
        [("c", 5.0)] * 10 + [("v", 1.0), ("v", 2.0), ("v", 3.0)], ["g", "x"]
    )
    cg = {
        (r["g"], r["q"]): r["estimate"]
        for r in histogram_quantiles_grouped(cdf, "g", "x", [0.5], 64).collect()
    }
    assert cg[("c", 0.5)] == 5.0


def test_hll_set_ops_accuracy(spark):
    from pytrousse_spark.operators.sketch import hll_set_ops

    a = spark.range(0, 1000).selectExpr("CAST(id AS STRING) AS k")
    b = spark.range(500, 1500).selectExpr("CAST(id AS STRING) AS k")
    (r,) = hll_set_ops(a, b, "k", p=10).collect()
    # p=10 -> ~3.25% std err per sketch; generous 10% bands, I-E wider
    assert abs(r["est_a"] - 1000) / 1000 < 0.10
    assert abs(r["est_b"] - 1000) / 1000 < 0.10
    assert abs(r["est_union"] - 1500) / 1500 < 0.10
    assert abs(r["est_intersection"] - 500) / 500 < 0.30


def test_hll_set_ops_disjoint_clamps_at_zero(spark):
    from pytrousse_spark.operators.sketch import hll_set_ops

    a = spark.range(0, 300).selectExpr("CAST(id AS STRING) AS k")
    b = spark.range(10_000, 10_300).selectExpr("CAST(id AS STRING) AS k")
    (r,) = hll_set_ops(a, b, "k", p=10).collect()
    assert r["est_intersection"] >= 0.0
    assert r["est_intersection"] < 0.15 * 300
