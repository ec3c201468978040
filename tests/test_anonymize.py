"""N1-N4 anonymization parity (anonymize_database.py semantics +
df_with_private_info expectations, FIXTURES.md §2)."""

from __future__ import annotations

from pytrousse_spark import from_df
from pytrousse_spark.operators.anonymize import (
    anonymize_data,
    create_private_info_df,
    id_owner_sql,
)


def _private_ds(spark):
    # FIXTURES.md df_with_private_info: rows 3 and 4 share private identity
    rows = [
        ("name_0", "addr_0", 0),
        ("name_1", "addr_1", 1),
        ("name_2", "addr_2", 2),
        ("name_3", "addr_3", 3),
        ("name_3", "addr_3", 4),
    ]
    return from_df(spark.createDataFrame(rows, ["NAME", "ADDRESS", "data_col"]))


def test_private_table_dedup(spark):
    ds = _private_ds(spark)
    priv = create_private_info_df(ds.df, ["NAME", "ADDRESS"], salt="s")
    rows = priv.collect()
    assert len(rows) == 4  # 5 rows → 4 identities
    assert len({r["ID_OWNER"] for r in rows}) == 4
    assert all(len(r["ID_OWNER"]) == 64 for r in rows)


def test_anonymize_shared_identity(spark):
    ds = _private_ds(spark)
    out, priv = anonymize_data(ds, ["NAME", "ADDRESS"], ["NAME", "ADDRESS"], salt="s")
    rows = out.df.collect()
    assert set(out.columns) == {"data_col", "ID_OWNER"}
    ids = {r["data_col"]: r["ID_OWNER"] for r in rows}
    assert ids[3] == ids[4]           # shared identity
    assert len(set(ids.values())) == 4
    # join back reconstructs the private info
    joined = out.df.join(priv, on="ID_OWNER", how="inner")
    assert joined.count() == 5


def test_null_private_values_filled(spark):
    rows = [("a", None, 0), (None, None, 1), ("a", None, 2)]
    ds = from_df(spark.createDataFrame(rows, "NAME string, ADDRESS string, d int"))
    out, priv = anonymize_data(ds, ["NAME"], ["NAME", "ADDRESS"], salt="s")
    assert priv.count() == 2  # (a,----) and (----,----)
    ids = {r["d"]: r["ID_OWNER"] for r in out.df.collect()}
    assert ids[0] == ids[2] != ids[1]


def test_id_owner_sql_twin(spark, duck):
    ds = _private_ds(spark)
    out, _ = anonymize_data(ds, [], ["NAME", "ADDRESS"], salt="z9")
    spark_ids = sorted(
        (r["data_col"], r["ID_OWNER"]) for r in out.df.collect()
    )
    values = ", ".join(
        f"('name_{i}', 'addr_{i}', {d})" for i, d in [(0, 0), (1, 1), (2, 2), (3, 3), (3, 4)]
    )
    duck_ids = sorted(
        duck.sql(
            f"SELECT data_col, {id_owner_sql(['NAME', 'ADDRESS'], 'z9')} AS id "
            f"FROM (VALUES {values}) t(NAME, ADDRESS, data_col)"
        ).fetchall()
    )
    assert [(d, i) for d, i in spark_ids] == duck_ids


def test_k_anonymity_census_laws(spark):
    from pytrousse_spark.operators.anonymize import k_anonymity_census

    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("c", 6)]
    df = spark.createDataFrame(rows, ["qi", "x"])
    out = k_anonymity_census(df, ["qi"], [2, 3, 4]).collect()
    by_k = {r["k"]: r for r in out}
    # class sizes: a=3, b=2, c=1 -> anonymity level 1
    assert all(r["anonymity_level"] == 1 for r in out)
    assert all(r["n_groups"] == 3 and r["n_rows"] == 6 for r in out)
    assert (by_k[2]["groups_below"], by_k[2]["rows_below"]) == (1, 1)
    assert (by_k[3]["groups_below"], by_k[3]["rows_below"]) == (2, 3)
    assert (by_k[4]["groups_below"], by_k[4]["rows_below"]) == (3, 6)
    # monotone in k
    ks = [r["k"] for r in out]
    assert ks == sorted(ks)
    rb = [r["rows_below"] for r in out]
    assert rb == sorted(rb)


def test_k_anonymity_census_suppression_fixpoint(spark):
    """Suppressing the below-k classes yields a census that reports the
    table as k-anonymous (the generalize/suppress loop's exit test)."""
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.anonymize import k_anonymity_census

    rows = [("a", i) for i in range(5)] + [("b", i) for i in range(2)] + [("c", 0)]
    df = spark.createDataFrame(rows, ["qi", "x"])
    sizes = df.groupBy("qi").count()
    kept = df.join(sizes.where(F.col("count") >= 3).select("qi"), "qi", "semi")
    out = k_anonymity_census(kept, ["qi"], [3]).collect()
    assert out[0]["rows_below"] == 0
    assert out[0]["anonymity_level"] >= 3


def test_k_anonymity_census_rejects_bad_thresholds(spark):
    import pytest as _pytest

    from pytrousse_spark.operators.anonymize import k_anonymity_census

    df = spark.createDataFrame([("a", 1)], ["qi", "x"])
    with _pytest.raises(ValueError):
        k_anonymity_census(df, ["qi"], [])
    with _pytest.raises(ValueError):
        k_anonymity_census(df, ["qi"], [1, 5])


def test_enforce_k_anonymity_fixpoint(spark):
    from pytrousse_spark.operators.anonymize import (
        enforce_k_anonymity,
        k_anonymity_census,
    )

    rows = [("a", i) for i in range(5)] + [("b", i) for i in range(2)] + [("c", 0)]
    df = spark.createDataFrame(rows, ["qi", "x"])
    fixed = enforce_k_anonymity(df, ["qi"], 3)
    assert fixed.count() == 5  # only class a survives
    out = k_anonymity_census(fixed, ["qi"], [3]).collect()
    assert out[0]["rows_below"] == 0 and out[0]["anonymity_level"] >= 3
    # idempotent
    assert enforce_k_anonymity(fixed, ["qi"], 3).count() == 5
    import pytest as _pytest

    with _pytest.raises(ValueError):
        enforce_k_anonymity(df, ["qi"], 1)


def test_l_diversity_census_laws(spark):
    from pytrousse_spark.operators.anonymize import l_diversity_census

    rows = [
        # class a: size 4, 1 distinct sensitive (homogeneous — the attack)
        ("a", "flu"), ("a", "flu"), ("a", "flu"), ("a", "flu"),
        # class b: size 3, 3 distinct
        ("b", "flu"), ("b", "cold"), ("b", "cough"),
        # class c: size 2, 2 distinct with a NULL (NULLs drop from
        # count-distinct in both engines)
        ("c", "flu"), ("c", None),
    ]
    df = spark.createDataFrame(rows, ["qi", "dx"])
    out = {r["l"]: r for r in l_diversity_census(df, ["qi"], "dx", [2, 3]).collect()}
    # diversity: a=1, b=3, c=1 (NULL dropped)
    assert all(r["diversity_level"] == 1 for r in out.values())
    assert (out[2]["groups_below"], out[2]["rows_below"]) == (2, 6)
    # b is exactly 3-diverse, so it does NOT fall below l=3
    assert (out[3]["groups_below"], out[3]["rows_below"]) == (2, 6)
    assert out[2]["n_rows"] == 9
    # a large-but-homogeneous class is invisible to k-anonymity at k<=4:
    from pytrousse_spark.operators.anonymize import k_anonymity_census

    k_out = k_anonymity_census(df, ["qi"], [3]).collect()[0]
    assert k_out["rows_below"] == 2  # only class c (size 2) is below k=3
    # ...class a (size 4) passes k-anonymity yet l-diversity flags it


def test_enforce_k_anonymity_null_qi_class_survives(spark):
    """r5 ADVICE regression: NULL quasi-identifier values form their own
    equivalence class (exactly as k_anonymity_census counts them), so a
    NULL class with >= k members must SURVIVE enforcement — the old
    null-rejecting semi join deleted it wholesale."""
    from pytrousse_spark.operators.anonymize import (
        enforce_k_anonymity,
        k_anonymity_census,
    )

    rows = (
        [(None, i) for i in range(5)]        # NULL class, size 5: kept
        + [("a", i) for i in range(3)]        # size 3: kept
        + [("b", 0)]                          # size 1: dropped
    )
    df = spark.createDataFrame(rows, "qi string, x int")
    fixed = enforce_k_anonymity(df, ["qi"], 3)
    got = sorted((r["qi"] or "", r["x"]) for r in fixed.collect())
    assert len(got) == 8 and sum(1 for q, _ in got if q == "") == 5
    out = k_anonymity_census(fixed, ["qi"], [3]).collect()
    assert out[0]["rows_below"] == 0 and out[0]["anonymity_level"] >= 3

    # multi-column QI with partial NULLs: (NULL, 'x') x4 kept, (NULL,
    # 'y') x1 dropped — null-safe equality is per column
    rows2 = [(None, "x", i) for i in range(4)] + [(None, "y", 9)]
    df2 = spark.createDataFrame(rows2, "q1 string, q2 string, x int")
    assert enforce_k_anonymity(df2, ["q1", "q2"], 3).count() == 4


def test_t_closeness_census_laws(spark):
    """A class whose sensitive distribution mirrors the global one is
    0-close; a concentrated class reads ~TV distance; census counts and
    monotonicity hold."""
    from pytrousse_spark.operators.anonymize import t_closeness_census

    # global: 50/50 over {x, y}. class a mirrors it (t=0);
    # class b is all-x (TV = |1-0.5|/... = 0.5)
    rows = (
        [("a", "x")] * 4 + [("a", "y")] * 4
        + [("b", "x")] * 4
    )
    # rebalance so global is 2/3 x, 1/3 y: a is (.5,.5) -> TV = 1/6
    df = spark.createDataFrame(rows, ["qi", "dx"])
    out = {r["t"]: r for r in t_closeness_census(
        df, ["qi"], "dx", [0.1, 0.4]).collect()}
    # a: 0.5*(|.5-2/3| + |.5-1/3|) = 1/6 ~ 0.1667; b: 0.5*(|1-2/3|+|0-1/3|) = 1/3
    assert out[0.1]["groups_above"] == 2          # both exceed 0.1
    assert out[0.4]["groups_above"] == 0          # neither exceeds 0.4
    assert abs(out[0.1]["max_t"] - 1 / 3) < 1e-6
    assert out[0.1]["n_groups"] == 2 and out[0.1]["n_rows"] == 12
    ga = [r["groups_above"] for r in sorted(out.values(), key=lambda r: r["t"])]
    assert ga == sorted(ga, reverse=True)  # monotone non-increasing in t

    # single class == global distribution -> exactly 0-close
    one = spark.createDataFrame([("a", "x"), ("a", "y")], ["qi", "dx"])
    r = t_closeness_census(one, ["qi"], "dx", [0.05]).collect()[0]
    assert r["max_t"] == 0.0 and r["groups_above"] == 0

    # NULL sensitive is a value; NULL QI is a class
    nulls = spark.createDataFrame(
        [("a", None), ("a", "x"), (None, None), (None, None)], ["qi", "dx"]
    )
    rn = t_closeness_census(nulls, ["qi"], "dx", [0.1]).collect()[0]
    assert rn["n_groups"] == 2 and rn["n_rows"] == 4

    import pytest as _pytest

    with _pytest.raises(ValueError):
        t_closeness_census(one, ["qi"], "dx", [])
    with _pytest.raises(ValueError):
        t_closeness_census(one, ["qi"], "dx", [1.5])


def test_dp_noisy_counts_laws(spark):
    """Keyed-PRF Laplace mechanism: deterministic per (salt, key), scale
    tracks 1/eps, signs balance, and the empirical mean |noise| over many
    groups approximates the Laplace mean absolute deviation b = 1/eps."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.anonymize import dp_noisy_counts

    df = spark.range(10000).select(
        (F.col("id") % 500).alias("g"), F.lit(1).alias("x")
    )
    out1 = {r["g"]: r["noisy_n"] for r in dp_noisy_counts(df, ["g"], 1.0, "s").collect()}
    out2 = {r["g"]: r["noisy_n"] for r in dp_noisy_counts(df, ["g"], 1.0, "s").collect()}
    assert out1 == out2  # deterministic
    out3 = {r["g"]: r["noisy_n"] for r in dp_noisy_counts(df, ["g"], 1.0, "t").collect()}
    assert out1 != out3  # salt rotates the draw
    noises = [v - 20.0 for v in out1.values()]  # true count is 20 per group
    assert abs(sum(1 for n in noises if n > 0) - 250) < 60  # signs balance
    mean_abs = sum(abs(n) for n in noises) / len(noises)
    assert 0.7 < mean_abs < 1.4  # E|Lap(1)| = 1
    # eps=10 -> 10x smaller scale
    out10 = {r["g"]: r["noisy_n"] for r in dp_noisy_counts(df, ["g"], 10.0, "s").collect()}
    mean_abs10 = sum(abs(v - 20.0) for v in out10.values()) / len(out10)
    assert mean_abs10 < mean_abs / 5
    with _pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], 0.0)
    # NULL key is a group, distinct from ''
    nd = spark.createDataFrame([(None, 1), ("", 2), ("", 3)], "g string, x int")
    rows = dp_noisy_counts(nd, ["g"], 1.0, "s").collect()
    assert len(rows) == 2


def test_dp_noisy_counts_null_group_cross_engine(spark):
    """The NUL-byte sentinel for NULL group keys must hash identically
    in both engines (and stay distinct from the empty string)."""
    import duckdb

    from pytrousse_spark.operators.anonymize import (
        dp_noisy_counts,
        dp_noisy_counts_sql,
    )
    from tests.conftest import assert_df_matches_sql

    df = spark.createDataFrame(
        [(None, 1), ("", 2), ("a", 3), (None, 4)], "g string, x int"
    )
    pdf = df.toPandas()  # noqa: F841
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM pdf")
    assert_df_matches_sql(
        dp_noisy_counts(df, ["g"], 2.0, "s"),
        con,
        dp_noisy_counts_sql("SELECT * FROM t", ["g"], 2.0, "s"),
    )
    con.close()
