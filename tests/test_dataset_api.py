"""Dataset relational passthroughs (SURVEY §2.2 P1-P6), S5/S6 sinks,
B9 map utility, remaining §2.10 properties."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pytrousse_spark import from_df, read_parquet_df, write_csv
from pytrousse_spark.dataset import copy_dataset_with_new_df
from pytrousse_spark.operators.binning import convert_maps_from_tuple_to_str
from pytrousse_spark.operators.transforms import OrdinalEncoder
from tests.conftest import SF_DIR


@pytest.fixture
def ds(spark):
    return from_df(
        spark.createDataFrame(
            [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "x"), ("a", 4, "z")],
            ["k", "v", "tag"],
        ),
        metadata_cols=("tag",),
    )


def test_select_filter_drop(ds):
    out = ds.select("k", "v").filter(F.col("v") > 1)
    assert out.columns == ["k", "v"]
    assert out.df.count() == 3
    assert ds.drop("tag").columns == ["k", "v"]


def test_order_limit_union(ds):
    top = ds.order_by(F.col("v").desc()).limit(2)
    assert [r["v"] for r in top.df.collect()] == [4, 3]
    both = ds.union(ds)
    assert both.df.count() == 8


def test_join_and_group_by(ds, spark):
    dim = spark.createDataFrame([("a", "A"), ("b", "B")], ["k", "big"])
    joined = ds.join(dim, on="k", how="inner")
    assert joined.df.count() == 3
    grouped = ds.group_by("k").agg(F.sum("v").alias("s"))
    assert {r["k"]: r["s"] for r in grouped.collect()} == {"a": 5, "b": 2, "c": 3}


def test_feature_cols_default_and_explicit(ds):
    assert ds.feature_cols == {"k", "v"}  # all − metadata
    from pytrousse_spark.dataset import Dataset

    explicit = Dataset(ds.df, metadata_cols=("tag",), feature_cols=("v",))
    assert explicit.feature_cols == {"v"}


def test_str_summary(ds):
    s = str(ds)
    assert "metadata=['tag']" in s and "numerical=1" in s


def test_to_be_encoded_cat_cols(spark):
    df = spark.createDataFrame([("a", "x")] * 10 + [("b", "y")] * 10, ["c1", "c2"])
    d = from_df(df)
    assert d.to_be_encoded_cat_cols == {"c1", "c2"}
    encoded = OrdinalEncoder(["c1"], derived_columns=["c1_enc"])(d)
    assert encoded.to_be_encoded_cat_cols == {"c2"}


def test_copy_dataset_with_new_df_warns_on_lost_columns(ds):
    import warnings

    new_df = ds.df.drop("v")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = copy_dataset_with_new_df(ds, new_df)
    assert any("Columns lost" in str(x.message) for x in w)
    assert out.metadata_cols == {"tag"}


def test_write_csv_sink(spark, tmp_path):
    df = read_parquet_df(spark, f"{SF_DIR}/region.parquet")
    path = os.path.join(tmp_path, "csvout")
    write_csv(df, path)
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)


def test_convert_maps_from_tuple_to_str():
    assert convert_maps_from_tuple_to_str({0: ("a", "b"), 1: (1, 2)}) == {
        0: "a-b", 1: "1-2",
    }


def test_column_names_by_index(ds):
    assert ds.column_names_by_index([0, 2]) == ["k", "tag"]
