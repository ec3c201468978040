"""Fellegi-Sunter record linkage laws (operators/linkage.py)."""

from __future__ import annotations

import math

import pytest

from pytrousse_spark.operators.linkage import (
    fs_link_pairs,
    fs_link_pairs_sql,
    fs_pattern_census,
)

COMPARES = [("seg", 0.9, 0.2), ("bucket", 0.9, 0.01)]
W_SEG = (math.log(0.9 / 0.2), math.log(0.1 / 0.8))
W_BKT = (math.log(0.9 / 0.01), math.log(0.1 / 0.99))


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "A", "x", 10),
            (2, "A", "y", 20),
            (3, "B", "x", 10),
            (4, None, "x", 10),  # NULL block key: matches nothing
        ],
        "lid int, blk string, seg string, bucket int",
    )
    right = spark.createDataFrame(
        [
            (101, "A", "x", 10),   # full agree with lid 1
            (102, "A", None, 20),  # NULL field -> disagreement weight
            (103, "B", "x", 99),   # seg agrees, bucket disagrees (lid 3)
            (104, None, "x", 10),  # NULL block key
        ],
        "rid int, blk string, seg string, bucket int",
    )
    return left, right


def test_fs_link_pairs_hand_scores_and_decisions(spark):
    left, right = _frames(spark)
    out = {
        (r["lid"], r["rid"]): (r["score"], r["decision"])
        for r in fs_link_pairs(
            left, right, "lid", "rid", ["blk"], COMPARES,
            lower=-1.0, upper=5.0,
        ).collect()
    }
    # block A: lids {1,2} x rids {101,102}; block B: {3} x {103};
    # NULL blocks drop out entirely
    assert set(out) == {(1, 101), (1, 102), (2, 101), (2, 102), (3, 103)}
    full = round(W_SEG[0] + W_BKT[0], 6)
    assert out[(1, 101)] == (full, "link")  # ~6.0
    # NULL seg on 102 -> disagreement weight even though bucket differs too
    assert out[(1, 102)] == (round(W_SEG[1] + W_BKT[1], 6), "non-link")
    # seg agree + bucket disagree: 1.504 - 2.293 = -0.789 -> possible
    assert out[(3, 103)] == (round(W_SEG[0] + W_BKT[1], 6), "possible")
    # (2, 102): seg NULL disagree, bucket 20 == 20 agree -> 4.5 - 2.079
    assert out[(2, 102)] == (round(W_BKT[0] + W_SEG[1], 6), "possible")

    with pytest.raises(ValueError):
        fs_link_pairs(left, right, "lid", "rid", ["blk"], [], 0, 1)
    with pytest.raises(ValueError):
        fs_link_pairs(
            left, right, "lid", "rid", ["blk"],
            [("seg", 0.2, 0.9)], 0, 1,  # m must exceed u
        )
    with pytest.raises(ValueError):
        fs_link_pairs(left, right, "lid", "rid", ["blk"], COMPARES, 5, 1)


def test_fs_link_pairs_sql_twin(spark):
    import duckdb

    from tests.conftest import assert_df_matches_sql

    left, right = _frames(spark)
    lp = left.toPandas()   # noqa: F841 — registered by name below
    rp = right.toPandas()  # noqa: F841
    con = duckdb.connect()
    con.sql("CREATE TABLE lt AS SELECT * FROM lp")
    con.sql("CREATE TABLE rt AS SELECT * FROM rp")
    assert_df_matches_sql(
        fs_link_pairs(
            left, right, "lid", "rid", ["blk"], COMPARES, -1.0, 5.0
        ),
        con,
        fs_link_pairs_sql(
            "SELECT * FROM lt", "SELECT * FROM rt", "lid", "rid",
            ["blk"], COMPARES, -1.0, 5.0,
        ),
    )
    con.close()


def test_fs_pattern_census_is_sufficient_statistic(spark):
    left, right = _frames(spark)
    rows = fs_pattern_census(
        left, right, ["blk"], ["seg", "bucket"]
    ).collect()
    pats = {(r["agree_seg"], r["agree_bucket"]): r["n_pairs"] for r in rows}
    # 5 blocked pairs total; hand-derived patterns: (1,101)->(1,1),
    # (1,102)->(0,0), (2,101)->(0,0), (2,102)->(0,1), (3,103)->(1,0)
    assert sum(pats.values()) == 5
    assert pats == {(1, 1): 1, (0, 0): 2, (1, 0): 1, (0, 1): 1}


def test_fs_em_fit_recovers_planted_parameters(spark):
    """EM over a census SYNTHESIZED from known (m, u, p) recovers them:
    generate pattern counts from the exact mixture model (large-n
    expectation — no sampling noise) and check the fit lands within a
    small relative error; likelihood of the truth is a fixed point."""
    import itertools

    from pytrousse_spark.operators.linkage import fs_em_fit

    true_m = [0.95, 0.85, 0.7]
    true_u = [0.3, 0.05, 0.1]
    true_p = 0.1
    n_total = 10_000_000
    patterns = []
    for vec in itertools.product([0, 1], repeat=3):
        pm = true_p
        pu = 1 - true_p
        for j, v in enumerate(vec):
            pm *= true_m[j] if v else 1 - true_m[j]
            pu *= true_u[j] if v else 1 - true_u[j]
        patterns.append((vec, round(n_total * (pm + pu))))
    fit = fs_em_fit(patterns, 3)
    assert abs(fit["p"] - true_p) < 0.02
    for j in range(3):
        assert abs(fit["m"][j] - true_m[j]) < 0.05, (j, fit["m"])
        assert abs(fit["u"][j] - true_u[j]) < 0.05, (j, fit["u"])

    import pytest as _pytest

    with _pytest.raises(ValueError):
        fs_em_fit([], 2)
