"""B1-B5 binning/combination semantics (feature_fix.py + breed bin parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pytrousse_spark import from_df
from pytrousse_spark.operators.binning import (
    add_group_specific_bin_id,
    attach_bin_intervals,
    bins_from_thresholds,
    combine_categorical_columns_to_one,
    explode_overlapping_bins,
    increasing_thresholds,
    interval_expr,
    make_categorical_columns_multiple_combinations,
    split_continuous_column_into_bins,
)


def test_b1_threshold_binning(spark):
    ds = from_df(
        spark.createDataFrame([(float(i),) for i in range(10)] + [(None,)], "x double")
    )
    out = split_continuous_column_into_bins(ds, "x", [3, 6])
    got = {r["x"]: r["x_bin_id"] for r in out.df.collect()}
    # threshold value lands in the HIGHER bin (feature_fix.py:74-83)
    assert got[2.0] == 0 and got[3.0] == 1 and got[5.0] == 1
    assert got[6.0] == 2 and got[9.0] == 2
    assert got[None] is None
    m = out.history[-1].details["encoded_values_map"]
    assert m[0] == [-1.0, 3.0] and m[1] == [3.0, 6.0] and m[2] == [6.0, 9.0]
    assert dict(out.df.dtypes)["x_bin_id"] == "smallint"  # Int16 parity


def test_interval_struct_ingestion(spark):
    """Interval columns (pandas Interval parity): constructed as
    struct<lower,upper>, classified numerical by the profiler, and
    materializable from a binning history record."""
    ds = from_df(
        spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    )
    binned = split_continuous_column_into_bins(ds, "x", [3, 6])
    out = attach_bin_intervals(binned, "x_bin_id")
    rows = {r["x"]: r["x_bin_id_interval"] for r in out.df.collect()}
    assert rows[2.0].asDict() == {"lower": -1.0, "upper": 3.0}
    assert rows[5.0].asDict() == {"lower": 3.0, "upper": 6.0}
    assert rows[9.0].asDict() == {"lower": 6.0, "upper": 9.0}
    # profiler parity: interval structs are numerical (dataset.py:334)
    assert "x_bin_id_interval" in out.profile.numerical_cols
    # raw constructor accepts columns or literals
    lit_df = ds.df.withColumn("iv", interval_expr(0, F.col("x")))
    got = lit_df.collect()[3]["iv"].asDict()
    assert got == {"lower": 0.0, "upper": 3.0}
    with pytest.raises(ValueError):
        attach_bin_intervals(ds, "x")  # no binning history for this column


def test_b2_combo_encoding(spark):
    ds = from_df(
        spark.createDataFrame(
            [("M", "I"), ("F", "NI"), ("M", "NI"), (None, "I")], ["sex", "status"]
        )
    )
    out, name = combine_categorical_columns_to_one(ds, ("sex", "status"))
    assert name == "sex-status_enc"
    got = {(r["sex"], r["status"]): r[name] for r in out.df.collect()}
    # itertools.product order over sorted vocabs: (F,I)=0 (F,NI)=1 (M,I)=2 (M,NI)=3
    assert got[("M", "I")] == 2 and got[("F", "NI")] == 1 and got[("M", "NI")] == 3
    assert got[(None, "I")] is None  # no combo matches → NULL
    m = out.history[-1].details["encoded_values_map"]
    assert m[0] == ("F", "I") and m[3] == ("M", "NI")


def test_b2_skip_if_exists(spark):
    # column already present → no-op (feature_fix.py:130-136)
    ds = from_df(spark.createDataFrame([("a", "b", 9)], ["c", "x", "c-x_enc"]))
    out, name = combine_categorical_columns_to_one(ds, ("c", "x"))
    assert name == "c-x_enc"
    assert out.df.collect()[0][name] == 9
    assert len(out.history) == 0


def test_b3_prefix_combos(spark):
    ds = from_df(
        spark.createDataFrame([("M", "I"), ("F", "NI")], ["sex", "status"])
    )
    out, cols = make_categorical_columns_multiple_combinations(ds, ["sex", "status"])
    assert cols == ["sex_enc", "sex-status_enc"]
    assert set(cols) <= set(out.columns)


def test_b4_group_binning_fallback_and_nulls(spark):
    rows = (
        [("MONGREL", float(i)) for i in range(30)]
        + [("RARE", 5.0), ("RARE", 7.0)]
        + [(None, 3.0), ("MONGREL", None)]
    )
    ds = from_df(spark.createDataFrame(rows, ["BREED", "AGE"]))
    out, binmap = add_group_specific_bin_id(
        ds, "AGE", "BREED", "MONGREL", bin_count=5, sample_count_threshold=20
    )
    rowsout = out.df.collect()
    assert len(rowsout) == len(rows)  # no rows lost (NaN-group re-insertion parity)
    bybreed = {}
    for r in rowsout:
        bybreed.setdefault(r["BREED"], []).append((r["AGE"], r["AGE_bin_group_specific"]))
    # small group RARE uses MONGREL's bins
    assert binmap["RARE"] == binmap["MONGREL"]
    # NULL group / NULL value → NULL bin
    assert [b for _, b in bybreed[None]] == [None]
    assert (None, None) in bybreed["MONGREL"]
    # monotone bins on the big group
    mong = sorted((a, b) for a, b in bybreed["MONGREL"] if a is not None)
    assert mong[0][1] == 0 and mong[-1][1] == 4


def test_b4_geometric_thresholds_math():
    th = increasing_thresholds(0, 100, 1.1, 5)
    # bin sizes increase by 1.1x and cover the range
    sizes = [th[i + 1] - th[i] for i in range(len(th) - 1)]
    for a, b in zip(sizes, sizes[1:]):
        assert b == pytest.approx(a * 1.1, rel=1e-9)
    assert th[-1] == 100
    # uniform mode
    th2 = increasing_thresholds(10, 20, 1, 4)
    assert th2[1:] == pytest.approx([12.5, 15.0, 17.5, 20.0])


def test_b4_bins_from_thresholds_last_bin_extended():
    bins = bins_from_thresholds([0.0, 1.0, 2.0])
    assert bins == [(0.0, 1.0), (1.0, 3.0)]  # last hi = 2 + 1


def test_b5_overlapping_bins_explode(spark):
    ds = from_df(spark.createDataFrame([(1.0,), (4.5,), (9.0,), (99.0,)], "x double"))
    out = explode_overlapping_bins(ds, "x", [(0, 5), (4, 10)], "bin")
    got = sorted((r["x"], r["bin"]) for r in out.df.collect())
    # 4.5 matches both bins → duplicated; 99 matches none → dropped
    assert got == [(1.0, 0), (4.5, 0), (4.5, 1), (9.0, 1)]


def test_quantile_bins_equi_depth(spark):
    """Equi-depth contract: sketch-boundary bins hold near-equal mass
    (within the histogram's bin-width error), NULLs stay NULL, and bin
    ids cover exactly 0..num_bins-1."""
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.binning import quantile_bins

    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 100 != 0, (F.col("id") * 7.3) % 1000.0)
        .alias("x")
    )
    binned, thresholds = quantile_bins(df, "x", num_bins=4)
    assert len(thresholds) == 3 and thresholds == sorted(thresholds)
    counts = {
        r["__qbin"]: r["c"]
        for r in binned.groupBy("__qbin").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert counts.pop(None) == 200  # NULL input -> NULL bin
    assert set(counts) == {0, 1, 2, 3}
    n = sum(counts.values())
    for b, c in counts.items():
        assert abs(c - n / 4) / (n / 4) < 0.05, (b, c, n)
