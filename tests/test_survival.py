"""Kaplan-Meier product-limit laws (operators/survival.py)."""

from __future__ import annotations

import pytest

from pytrousse_spark.operators.survival import kaplan_meier, kaplan_meier_sql


def test_km_textbook_example(spark):
    """Classic hand example: durations 1,2+,3,4+,5 (+ = censored).
    Risk sets 5,3,1; S(1)=4/5, S(3)=4/5*2/3=8/15, S(5)=0 (d==n)."""
    rows = [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0), (5.0, 1)]
    df = spark.createDataFrame(rows, "dur double, e int")
    out = {r["t"]: r for r in kaplan_meier(df, "dur", "e").collect()}
    assert set(out) == {1.0, 3.0, 5.0}
    assert out[1.0]["n_risk"] == 5 and out[1.0]["survival"] == 0.8
    assert out[3.0]["n_risk"] == 3
    assert abs(out[3.0]["survival"] - 8 / 15) < 1e-6
    assert out[5.0]["n_risk"] == 1 and out[5.0]["survival"] == 0.0


def test_km_no_censoring_equals_tail_fraction(spark):
    """With zero censoring, KM reduces to the empirical survivor
    function (n - cum_events) / n — the estimator's sanity anchor."""
    durs = [1.0] * 3 + [2.0] * 5 + [4.0] * 2
    df = spark.createDataFrame([(d, 1) for d in durs], "dur double, e int")
    out = {r["t"]: r["survival"] for r in kaplan_meier(df, "dur", "e").collect()}
    assert abs(out[1.0] - 7 / 10) < 1e-6
    assert abs(out[2.0] - 2 / 10) < 1e-6
    assert out[4.0] == 0.0
    # monotone non-increasing
    curve = [out[t] for t in sorted(out)]
    assert curve == sorted(curve, reverse=True)


def test_km_all_censored_and_nulls(spark):
    df = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (None, 1), (3.0, None)], "dur double, e int"
    )
    assert kaplan_meier(df, "dur", "e").count() == 0


def test_km_sql_twin(spark):
    import duckdb

    from tests.conftest import assert_df_matches_sql

    rows = [(float(i % 7), i % 3 != 0) for i in range(200)]
    df = spark.createDataFrame(
        [(d, int(e)) for d, e in rows], "dur double, e int"
    )
    pdf = df.toPandas()  # noqa: F841
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM pdf")
    assert_df_matches_sql(
        kaplan_meier(df, "dur", "e"),
        con,
        kaplan_meier_sql("SELECT * FROM t", "dur", "e"),
    )
    con.close()


def test_nelson_aalen_companion(spark):
    """Nelson-Aalen cumulative hazard: sum of d/n at event times, and
    exp(-H) tracks the KM survival (small-hazard approximation)."""
    rows = [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0), (5.0, 1)]
    df = spark.createDataFrame(rows, "dur double, e int")
    out = {r["t"]: r for r in kaplan_meier(df, "dur", "e").collect()}
    assert abs(out[1.0]["na_cumhazard"] - 1 / 5) < 1e-6
    assert abs(out[3.0]["na_cumhazard"] - (1 / 5 + 1 / 3)) < 1e-6
    assert abs(out[5.0]["na_cumhazard"] - (1 / 5 + 1 / 3 + 1.0)) < 1e-6
    # monotone non-decreasing
    hs = [out[t]["na_cumhazard"] for t in sorted(out)]
    assert hs == sorted(hs)
    # small-hazard regime: exp(-H) ~ KM survival within 2% relative
    import math

    many = spark.createDataFrame(
        [(float(i % 50), 1 if i % 7 else 0) for i in range(3000)],
        "dur double, e int",
    )
    for r in kaplan_meier(many, "dur", "e").collect()[:20]:
        if r["survival"] > 0.5:
            assert abs(math.exp(-r["na_cumhazard"]) - r["survival"]) < 0.02


def test_km_grouped_matches_per_slice(spark):
    from pytrousse_spark.operators.survival import kaplan_meier_grouped

    rows = (
        [("a", float(1 + i % 4), 1 if i % 3 else 0) for i in range(60)]
        + [("b", float(2 + i % 6), 1 if i % 2 else 0) for i in range(80)]
    )
    df = spark.createDataFrame(rows, "g string, dur double, e int")
    grouped = {
        (r["g"], r["t"]): (r["n_risk"], r["survival"], r["na_cumhazard"])
        for r in kaplan_meier_grouped(df, "g", "dur", "e").collect()
    }
    for gv in ("a", "b"):
        solo = {
            r["t"]: (r["n_risk"], r["survival"], r["na_cumhazard"])
            for r in kaplan_meier(
                df.where(df["g"] == gv), "dur", "e"
            ).collect()
        }
        assert {t: v for (g, t), v in grouped.items() if g == gv} == solo


def test_logrank_hand_example_and_laws(spark):
    """Textbook two-group example, hand-computed: group A durations
    {1, 2 (event), 3+}, group B {2 (event), 3 (event), 4+}. Pooled
    event times 1, 2, 3. Identical groups give chi2 ~ 0; a strongly
    separated pair gives a large chi2."""
    from pytrousse_spark.operators.survival import logrank_test

    rows = [
        ("A", 1.0, 1), ("A", 2.0, 1), ("A", 3.0, 0),
        ("B", 2.0, 1), ("B", 3.0, 1), ("B", 4.0, 0),
    ]
    df = spark.createDataFrame(rows, "g string, dur double, e int")
    r = logrank_test(df, "g", "dur", "e").collect()[0]
    # t=1: n1=3, n2=3, d=1 (A) -> E1 += 1*3/6 = .5 ; V += 1*(1/2)(1/2)(5/5)=.25
    # t=2: n1=2, n2=3, d=2    -> E1 += 2*2/5 = .8 ; V += 2*(2/5)(3/5)(3/4)=.36
    # t=3: n1=1, n2=2, d=1 (B)-> E1 += 1*1/3 ~ .3333; V += 1*(1/3)(2/3)(2/2)=.2222
    assert r["o1"] == 2
    assert abs(r["e1"] - (0.5 + 0.8 + 1 / 3)) < 1e-6
    assert abs(r["v"] - (0.25 + 0.36 + 2 / 9)) < 1e-6
    exp_chi2 = (2 - (0.5 + 0.8 + 1 / 3)) ** 2 / (0.25 + 0.36 + 2 / 9)
    assert abs(r["chi2"] - exp_chi2) < 1e-5

    # identical arms -> tiny chi2; separated arms -> big chi2
    same = spark.createDataFrame(
        [("A", float(1 + i % 5), 1) for i in range(50)]
        + [("B", float(1 + i % 5), 1) for i in range(50)],
        "g string, dur double, e int",
    )
    assert logrank_test(same, "g", "dur", "e").collect()[0]["chi2"] < 1e-6
    sep = spark.createDataFrame(
        [("A", float(1 + i % 3), 1) for i in range(50)]
        + [("B", float(10 + i % 3), 1) for i in range(50)],
        "g string, dur double, e int",
    )
    assert logrank_test(sep, "g", "dur", "e").collect()[0]["chi2"] > 30


def test_rmst_hand_example_and_laws(spark):
    """Hand-checked step integral; no censoring + tau beyond last
    event -> RMST = mean duration; tau before the first event ->
    RMST = tau (S = 1 throughout)."""
    from pytrousse_spark.operators.survival import rmst

    # durations 2 (event), 4 (event), 6 (censored): S=2/3 on [2,4),
    # S=1/3 on [4, tau)
    df = spark.createDataFrame(
        [(2.0, 1), (4.0, 1), (6.0, 0)], "d double, e int"
    )
    r = rmst(df, "d", "e", tau=5.0).collect()[0]
    # 1*2 + (2/3)*2 + (1/3)*1 = 2 + 1.333333 + 0.333333
    expect = 2 + (2 / 3) * 2 + (1 / 3) * 1
    assert abs(r["rmst"] - expect) < 2e-6
    assert r["tau"] == 5.0 and r["n_event_times"] == 2

    # no censoring, tau past everything: RMST == mean duration
    df2 = spark.createDataFrame(
        [(1.0, 1), (3.0, 1), (5.0, 1)], "d double, e int"
    )
    r2 = rmst(df2, "d", "e", tau=10.0).collect()[0]
    assert abs(r2["rmst"] - 3.0) < 2e-6

    # tau before the first event: curve is 1 on [0, tau]
    r3 = rmst(df2, "d", "e", tau=0.5).collect()[0]
    assert r3["rmst"] == 0.5


def test_km_greenwood_bands_bracket_curve(spark):
    """CI laws: lo <= survival <= hi everywhere; bands start narrow
    (large risk set) and only widen as the risk set thins; clamped to
    [0, 1]; no censoring -> survival equals empirical tail."""
    from pytrousse_spark.operators.survival import (
        kaplan_meier,
        kaplan_meier_ci,
    )

    rows = [(float(t), 1) for t in [1, 2, 2, 3, 5, 5, 5, 8, 9, 9]]
    rows += [(4.0, 0), (6.0, 0), (7.0, 0)]
    df = spark.createDataFrame(rows, ["dur", "ev"])
    out = kaplan_meier_ci(df, "dur", "ev").orderBy("t").collect()
    assert all(0.0 <= r["ci_lo"] <= r["survival"] <= r["ci_hi"] <= 1.0
               for r in out)
    widths = [r["ci_hi"] - r["ci_lo"] for r in out if r["survival"] > 0]
    assert widths[0] < widths[-1]  # bands widen as the risk set thins
    # point curve identical to kaplan_meier's survival column
    km = {r["t"]: r["survival"]
          for r in kaplan_meier(df, "dur", "ev").collect()}
    assert all(abs(km[r["t"]] - r["survival"]) < 1e-9 for r in out)


def test_km_greenwood_hand_example(spark):
    """Textbook check: n=4 all events at distinct times; at t1
    S=0.75, gw = 1/(4*3) -> half-width 1.96*0.75*sqrt(1/12)."""
    import math

    from pytrousse_spark.operators.survival import kaplan_meier_ci

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 1), (4.0, 1)], ["dur", "ev"]
    )
    out = kaplan_meier_ci(df, "dur", "ev").orderBy("t").collect()
    r1 = out[0]
    s, gw = 0.75, 1.0 / 12.0
    assert abs(r1["survival"] - s) < 1e-6
    assert abs(r1["ci_lo"] - max(0.0, s - 1.96 * s * math.sqrt(gw))) < 1e-5
    assert abs(r1["ci_hi"] - min(1.0, s + 1.96 * s * math.sqrt(gw))) < 1e-5
    # last step: everyone at risk dies -> curve and bands pinned to 0
    assert out[-1]["survival"] == 0.0 == out[-1]["ci_lo"] == out[-1]["ci_hi"]


def test_aalen_johansen_laws(spark):
    """Laws: (1) mass conservation — sum_k CIF_k(t) + S(t) == 1 at
    every event time (round-6); (2) single cause, no censoring -> CIF
    equals the empirical CDF and 1 - KM survival; (3) a competing
    cause REDUCES the other cause's CIF vs treating it as censoring
    is wrong — here we pin the textbook 4-subject hand computation."""
    from pytrousse_spark.operators.survival import (
        aalen_johansen,
        kaplan_meier,
    )

    # (2) single cause, complete observation
    rows = [(1.0, "a"), (2.0, "a"), (2.0, "a"), (4.0, "a")]
    df = spark.createDataFrame(rows, "t double, cause string")
    out = aalen_johansen(df, "t", "cause").collect()
    cif = {r["t"]: r["cif"] for r in out}
    assert cif == {1.0: 0.25, 2.0: 0.75, 4.0: 1.0}
    km = {
        r["t"]: r["survival"]
        for r in kaplan_meier(
            spark.createDataFrame(
                [(t, 1) for t, _ in rows], "t double, e int"
            ),
            "t",
            "e",
        ).collect()
    }
    for t, c in cif.items():
        assert abs((1.0 - km[t]) - c) < 2e-6

    # (1)+(3) two causes + censoring, hand-computed:
    # t=1: n=5, conv d=1 -> S(1-)=1, CIF_c(1)=0.2, S(1)=0.8
    # t=2: n=4, aband d=1 -> CIF_a(2)=0.8*1/4=0.2, S(2)=0.6
    # t=3: censored only (n=3 -> 2)
    # t=4: n=2, conv d=1 -> CIF_c(4)=0.2+0.6*0.5=0.5, S(4)=0.3
    rows2 = [
        (1.0, "conv"), (2.0, "aband"), (3.0, None), (4.0, "conv"),
        (5.0, None),
    ]
    df2 = spark.createDataFrame(rows2, "t double, cause string")
    out2 = aalen_johansen(df2, "t", "cause").collect()
    got = {(r["t"], r["cause"]): r for r in out2}
    assert abs(got[(1.0, "conv")]["cif"] - 0.2) < 1e-6
    assert abs(got[(2.0, "aband")]["cif"] - 0.2) < 1e-6
    assert abs(got[(4.0, "conv")]["cif"] - 0.5) < 1e-6
    assert abs(got[(4.0, "conv")]["overall_survival"] - 0.3) < 1e-6
    # mass conservation at the last event time
    s4 = got[(4.0, "conv")]["overall_survival"]
    cifs = {}
    for (t, c), r in got.items():
        cifs[c] = max(cifs.get(c, 0.0), r["cif"])
    assert abs(sum(cifs.values()) + s4 - 1.0) < 1e-5
