"""Golden tests for T1-T6, mirroring the reference's expectation CSVs
(FIXTURES.md §1: generic / generic-na fixtures)."""

from __future__ import annotations

import pytest

from pytrousse_spark import from_df
from pytrousse_spark.operators.base import Pipeline
from pytrousse_spark.operators.transforms import (
    FillNA,
    OneHotEncoder,
    OrdinalEncoder,
    ReplaceStrings,
    ReplaceSubstrings,
)


@pytest.fixture
def generic(spark):
    return from_df(
        spark.createDataFrame(
            [
                ("c", "b", "e", "abc"),
                ("d", "b", "c", "abc"),
                ("d", "b", "c", "abr"),
                ("a", "b", "c", "abc"),
            ],
            ["col0", "col1", "col2", "col3"],
        )
    )


@pytest.fixture
def generic_na(spark):
    return from_df(
        spark.createDataFrame(
            [("a", "a"), ("d", "a"), (None, None), ("e", "e")], ["col4", "col5"]
        )
    )


def test_replace_strings_in_place(generic):
    out = ReplaceStrings(["col0"], {"d": "a"})(generic)
    assert [r["col0"] for r in out.df.collect()] == ["c", "a", "a", "a"]


def test_replace_strings_derived(generic):
    out = ReplaceStrings(["col0"], {"d": "a"}, derived_columns=["col4"])(generic)
    rows = out.df.collect()
    assert [r["col0"] for r in rows] == ["c", "d", "d", "a"]
    assert [r["col4"] for r in rows] == ["c", "a", "a", "a"]
    assert out.derived_columns == {"col4"}


def test_replace_substrings(generic):
    out = ReplaceSubstrings(["col3"], {"r": "c"})(generic)
    assert [r["col3"] for r in out.df.collect()] == ["abc", "abc", "abc", "abc"]


def test_replace_substrings_cascade(spark):
    ds = from_df(spark.createDataFrame([("aab",)], ["c"]))
    out = ReplaceSubstrings(["c"], {"a": "b", "b": "z"})(ds)
    # sequential cascade: aab -> bbb -> zzz (documented spec, SURVEY §2.5 T2)
    assert out.df.collect()[0]["c"] == "zzz"


def test_ordinal_encoder_golden(generic):
    # golden: abc→0, abr→1 (generic-ordinal-encoded-col3-inplace.csv)
    out = OrdinalEncoder(["col3"], derived_columns=["col3_enc"])(generic)
    got = [(r["col3"], r["col3_enc"]) for r in out.df.collect()]
    assert got == [("abc", 0), ("abc", 0), ("abr", 1), ("abc", 0)]


def test_ordinal_encoder_null(spark):
    ds = from_df(spark.createDataFrame([("b",), (None,), ("a",)], ["c"]))
    out = OrdinalEncoder(["c"], derived_columns=["e"])(ds)
    assert [(r["c"], r["e"]) for r in out.df.collect()] == [
        ("b", 1), (None, None), ("a", 0),
    ]


def test_one_hot_golden(generic):
    out = OneHotEncoder(["col3"])(generic)
    assert set(out.derived_columns) == {"col3_abc_enc", "col3_abr_enc"}
    got = [(r["col3_abc_enc"], r["col3_abr_enc"]) for r in out.df.collect()]
    assert got == [(True, False), (True, False), (False, True), (True, False)]


def test_one_hot_null_row_all_null(generic_na):
    # golden: generic-na-one-hot-encoded-col4-enc.csv — NULL row → NULL in all
    out = OneHotEncoder(["col4"])(generic_na)
    assert set(out.derived_columns) == {
        "col4_a_enc", "col4_d_enc", "col4_e_enc",
    }
    null_row = [r for r in out.df.collect() if r["col4"] is None][0]
    assert null_row["col4_a_enc"] is None
    assert null_row["col4_d_enc"] is None
    assert null_row["col4_e_enc"] is None


def test_one_hot_instance_reusable_across_datasets(spark, generic):
    """Applying an encoder must not mutate the instance: identity/_eq_fields
    stay stable and a second dataset with different categories encodes
    correctly with the SAME operator object."""
    enc = OneHotEncoder(["col3"])
    fields_before = enc._eq_fields()
    out1 = enc(generic)
    assert enc._eq_fields() == fields_before
    assert enc.derived_columns is None          # no state written by _apply
    ds2 = from_df(spark.createDataFrame([("x",), ("y",)], ["col3"]))
    out2 = enc(ds2)
    assert set(out2.derived_columns) == {"col3_x_enc", "col3_y_enc"}
    assert set(out1.derived_columns) == {"col3_abc_enc", "col3_abr_enc"}


def test_fillna_in_place_and_derived(generic_na):
    out = FillNA(["col4"], "filled")(generic_na)
    assert [r["col4"] for r in out.df.collect()] == ["a", "d", "filled", "e"]
    out2 = FillNA(["col4"], "x", derived_columns=["col6"])(generic_na)
    rows = out2.df.collect()
    assert [r["col4"] for r in rows] == ["a", "d", None, "e"]
    assert [r["col6"] for r in rows] == ["a", "d", "x", "e"]


def test_validation_errors():
    with pytest.raises(ValueError):
        FillNA(["a", "b"], 0)
    with pytest.raises(ValueError):
        FillNA(["a"], 0, derived_columns=["x", "y"])
    with pytest.raises(ValueError):
        ReplaceStrings(["a"], {})


def test_pipeline_composes_one_plan(generic):
    pipe = Pipeline(
        ReplaceStrings(["col0"], {"d": "a"}),
        OrdinalEncoder(["col0"], derived_columns=["col0_enc"]),
        FillNA(["col2"], "zz"),
    )
    out = pipe(generic)
    assert [op.name for op in out.history] == [
        "ReplaceStrings", "OrdinalEncoder", "FillNA",
    ]
    assert [r["col0_enc"] for r in out.df.collect()] == [1, 0, 0, 0]


def test_operator_equality():
    assert FillNA(["a"], 0) == FillNA(["a"], 0)
    assert FillNA(["a"], 0) != FillNA(["a"], 1)
    assert ReplaceStrings(["a"], {"x": "y"}) == ReplaceStrings(["a"], {"x": "y"})
    assert OrdinalEncoder(["a"]) != OneHotEncoder(["a"])


def test_history_metadata_propagation(spark):
    ds = from_df(
        spark.createDataFrame([("a", 1)], ["meta", "feat"]),
        metadata_cols=("meta",),
    )
    out = FillNA(["meta"], "x", derived_columns=["meta2"])(ds)
    # derived col of all-metadata parents becomes metadata (dataset.py:642-666)
    assert "meta2" in out.metadata_cols
    out2 = FillNA(["feat"], 0, derived_columns=["feat2"])(ds)
    assert "feat2" not in out2.metadata_cols


def test_percent_rank_transform_laws(spark):
    from pytrousse_spark.operators.transforms import percent_rank_transform

    rows = [
        ("g", 10.0), ("g", 20.0), ("g", 20.0), ("g", 30.0), ("g", None),
        ("h", 5.0),
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = percent_rank_transform(df, "grp", "v").collect()
    got = {}
    for r in out:
        got.setdefault(r["grp"], []).append((r["v"], r["pct_rank"]))
    g = dict((v, p) for v, p in got["g"])
    # 4 non-null values: ranks 0, 1/3 (tie), 1/3 (tie), 1
    assert g[10.0] == 0.0
    assert g[20.0] == round(1 / 3, 6)
    assert g[30.0] == 1.0
    assert g[None] is None        # NULL passes through, excluded from frame
    # singleton group ranks 0
    assert got["h"] == [(5.0, 0.0)]


def test_percent_rank_approx_matches_exact_within_1e3(spark):
    """The r4 VERDICT's scale fix: the histogram-CDF rank transform must
    track the exact per-group percent_rank within 1e-3 at B=4096 on the
    q156 gate column at sf0.01 (the verdict's pin; measured 2.45e-4 —
    the bound is granularity-driven, O(max bin count / n), so the
    smaller sf0.001 slice is NOT representative and sits near 1.3e-3)."""
    from pyspark.sql import functions as F

    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.transforms import (
        percent_rank_transform,
        percent_rank_transform_approx,
    )

    li = read_parquet_df(spark, "/root/testdata/sf0.01/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    )
    ex = percent_rank_transform(
        li, "l_returnflag", "l_extendedprice", "r_ex"
    ).distinct()
    ap = percent_rank_transform_approx(
        li, "l_returnflag", "l_extendedprice", "r_ap"
    ).distinct()
    j = ex.join(ap, ["l_returnflag", "l_extendedprice"])
    row = j.agg(
        F.max(F.abs(F.col("r_ex") - F.col("r_ap"))).alias("e"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert row["n"] > 100
    assert row["e"] <= 1e-3, f"approx rank error {row['e']} > 1e-3"


def test_percent_rank_approx_laws(spark):
    """Same contract as the exact operator: NULL passthrough, singleton
    and constant groups rank 0, ties share a rank, output in [0, 1],
    monotone in the value within each group."""
    from pytrousse_spark.operators.transforms import (
        percent_rank_transform_approx,
    )

    rows = [
        ("g", 10.0), ("g", 20.0), ("g", 20.0), ("g", 30.0), ("g", None),
        ("h", 5.0),
        ("c", 7.0), ("c", 7.0), ("c", 7.0),
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = percent_rank_transform_approx(df, "grp", "v").collect()
    got = {}
    for r in out:
        got.setdefault(r["grp"], []).append((r["v"], r["pct_rank"]))
    g = dict((v, p) for v, p in got["g"])
    assert g[None] is None
    assert g[10.0] == 0.0
    assert g[10.0] < g[20.0] < g[30.0] <= 1.0
    assert len([p for v, p in got["g"] if v == 20.0]) == 2
    assert len(set(p for v, p in got["g"] if v == 20.0)) == 1  # ties share
    assert got["h"] == [(5.0, 0.0)]
    assert all(p == 0.0 for _, p in got["c"])  # constant group

    # cross-engine twin on the same frame
    import duckdb

    from pytrousse_spark.operators.transforms import (
        percent_rank_transform_approx_sql,
    )
    from tests.conftest import assert_df_matches_sql

    pdf = df.toPandas()  # noqa: F841 — registered by name below
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM pdf")
    assert_df_matches_sql(
        percent_rank_transform_approx(df, "grp", "v"),
        con,
        percent_rank_transform_approx_sql("t", "grp", "v"),
    )
    con.close()


def test_quantile_normalize_matches_pooled_distribution(spark):
    """The point of the transform: after normalization every group's
    quantiles approximate the POOLED originals — groups with shifted
    distributions land on a common marginal."""
    import random

    from pyspark.sql import functions as F

    from pytrousse_spark.operators.transforms import quantile_normalize

    rng = random.Random(7)
    rows = [("a", rng.uniform(0, 100)) for _ in range(800)] + [
        ("b", rng.uniform(500, 600)) for _ in range(800)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = quantile_normalize(df, "g", "v").collect()
    by = {"a": [], "b": []}
    for r in out:
        by[r["g"]].append(r["qn_value"])
    pooled = sorted(v for _, v in rows)
    import bisect

    def q(vals, p):
        s = sorted(vals)
        return s[int(p * (len(s) - 1))]

    def pooled_rank(x):
        return bisect.bisect_right(pooled, x) / len(pooled)

    # compare in RANK space (value space is meaningless at CDF jumps —
    # this pooled distribution has a [100, 500] gap where both edges are
    # "the median"): each group's p-quantile must sit at pooled rank ~p
    for p in (0.1, 0.25, 0.5, 0.75, 0.9):
        for g in ("a", "b"):
            assert abs(pooled_rank(q(by[g], p)) - p) < 0.03
    # and both groups share a marginal: their deciles agree in rank
    for p in (0.25, 0.5, 0.75):
        assert (
            abs(pooled_rank(q(by["a"], p)) - pooled_rank(q(by["b"], p)))
            < 0.03
        )


def test_quantile_normalize_edges_and_nulls(spark):
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.transforms import quantile_normalize

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", None)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {(r["g"], r["v"]): r["qn_value"] for r in quantile_normalize(df, "g", "v").collect()}
    # NULL passes through NULL
    assert out[("b", None)] is None
    # group minimum (rank 0) maps to the global minimum
    assert out[("a", 1.0)] == 1.0
    # singleton group b: rank 0 -> global minimum too
    assert out[("b", 10.0)] == 1.0
    # outputs stay inside the global range
    assert all(
        v is None or 1.0 <= v <= 10.0 for v in out.values()
    )


def test_percent_rank_approx_keeps_null_groups(spark):
    """r5 ADVICE regression: a NULL GROUP KEY is a partition in the
    exact window, so the approx path must keep those rows too (the old
    inner equality join silently dropped them: 5 rows in -> 3 out)."""
    from pytrousse_spark.operators.transforms import (
        percent_rank_transform,
        percent_rank_transform_approx,
        quantile_normalize,
    )

    rows = [(None, 1.0), (None, 2.0), (None, 3.0), ("g", 5.0), ("g", None)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = percent_rank_transform_approx(df, "grp", "v").collect()
    assert len(out) == 5  # no row loss
    nulls = sorted(
        (r["v"], r["pct_rank"]) for r in out if r["grp"] is None
    )
    exact = percent_rank_transform(df, "grp", "v").collect()
    exact_nulls = sorted(
        (r["v"], r["pct_rank"]) for r in exact if r["grp"] is None
    )
    assert [v for v, _ in nulls] == [1.0, 2.0, 3.0]
    # approx matches exact on the NULL group within sketch tolerance
    for (v1, p1), (v2, p2) in zip(nulls, exact_nulls):
        assert v1 == v2 and abs(p1 - p2) <= 1e-3
    # quantile_normalize inherits the fix: row count preserved
    assert quantile_normalize(df, "grp", "v").count() == 5

    # cross-engine twin (IS NOT DISTINCT FROM) on the same frame
    import duckdb

    from pytrousse_spark.operators.transforms import (
        percent_rank_transform_approx_sql,
    )
    from tests.conftest import assert_df_matches_sql

    pdf = df.toPandas()  # noqa: F841 — registered by name below
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM pdf")
    assert_df_matches_sql(
        percent_rank_transform_approx(df, "grp", "v"),
        con,
        percent_rank_transform_approx_sql("t", "grp", "v"),
    )
    con.close()


def test_percent_rank_auto_routing(spark):
    """r5 VERDICT item 5: strategy='auto' profiles the largest group and
    routes — a giant low-cardinality key takes the sketch path (no
    per-group Sort over fact rows), a high-cardinality key takes the
    exact window. Pinned via the physical plan."""
    import pytest as _pytest

    from pytrousse_spark.operators.transforms import percent_rank_transform

    rows = [("g" if i % 3 else "h", float(i)) for i in range(300)]
    low_card = spark.createDataFrame(rows, "grp string, v double")
    # budget 50 < max group (200) -> sketch: no Window percent_rank,
    # histogram helper columns appear in the plan
    sk = percent_rank_transform(
        low_card, "grp", "v", strategy="auto", exact_max_group_rows=50
    )
    plan_sk = sk._jdf.queryExecution().executedPlan().toString()
    assert "percent_rank" not in plan_sk
    # budget 1000 > max group -> exact window path
    ex = percent_rank_transform(
        low_card, "grp", "v", strategy="auto", exact_max_group_rows=1000
    )
    plan_ex = ex._jdf.queryExecution().executedPlan().toString()
    assert "percent_rank" in plan_ex
    # high-cardinality key (every group size 1) -> exact even at budget 50
    uniq = spark.createDataFrame(
        [(f"k{i}", float(i)) for i in range(200)], "grp string, v double"
    )
    ex2 = percent_rank_transform(
        uniq, "grp", "v", strategy="auto", exact_max_group_rows=50
    )
    assert "percent_rank" in ex2._jdf.queryExecution().executedPlan().toString()
    # explicit strategies still honored; junk rejected
    assert "percent_rank" not in percent_rank_transform(
        low_card, "grp", "v", strategy="sketch"
    )._jdf.queryExecution().executedPlan().toString()
    with _pytest.raises(ValueError):
        percent_rank_transform(low_card, "grp", "v", strategy="nope")
    # sketch route stays within its per-bin interpolation bound of the
    # exact ranks: ~1/(min group n - 1) at this tiny n (the 1e-3 pin is
    # the large-n gate column's, tests above)
    got = {
        (r["grp"], r["v"]): r["pct_rank"]
        for r in percent_rank_transform(
            low_card, "grp", "v", strategy="auto", exact_max_group_rows=50
        ).collect()
    }
    exact = {
        (r["grp"], r["v"]): r["pct_rank"]
        for r in percent_rank_transform(low_card, "grp", "v").collect()
    }
    assert max(abs(got[k] - exact[k]) for k in exact) <= 1.5 / 99
