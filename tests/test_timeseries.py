"""resample_gapfill semantics (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from pytrousse_spark.operators.timeseries import resample_gapfill


def _ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


def test_gapfill_completes_grid_and_carries_forward(spark):
    rows = [
        # user 1: hours 0, 1, 4 observed -> 2 and 3 are gaps
        (1, _ts(0, 5), 10.0),
        (1, _ts(0, 40), 2.0),
        (1, _ts(1, 0), 5.0),
        (1, _ts(4, 59), 7.0),
        # user 2: single hour, no gaps
        (2, _ts(9, 30), 1.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {
        (r["user_id"], r["bucket"].hour): r
        for r in resample_gapfill(df, "user_id", "ts", "value").collect()
    }
    assert len(got) == 5 + 1  # hours 0..4 for user 1, hour 9 for user 2
    assert got[(1, 0)]["v_sum"] == 12.0 and not got[(1, 0)]["is_gap"]
    assert got[(1, 0)]["n_obs"] == 2
    assert got[(1, 2)]["is_gap"] and got[(1, 2)]["v_sum"] is None
    assert got[(1, 2)]["v_ff"] == 5.0  # carried from hour 1
    assert got[(1, 3)]["v_ff"] == 5.0
    assert got[(1, 4)]["v_ff"] == 7.0  # fresh observation resets
    assert got[(2, 9)]["n_obs"] == 1 and not got[(2, 9)]["is_gap"]
    # first bucket per key is always observed -> v_ff never NULL
    assert all(r["v_ff"] is not None for r in got.values())


def test_gapfill_grid_never_crosses_keys(spark):
    """Each key's grid spans only ITS OWN min..max; no global calendar."""
    rows = [(1, _ts(0), 1.0), (1, _ts(2), 1.0), (2, _ts(20), 1.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = resample_gapfill(df, "user_id", "ts", "value").collect()
    per_key = {}
    for r in out:
        per_key.setdefault(r["user_id"], []).append(r["bucket"].hour)
    assert sorted(per_key[1]) == [0, 1, 2]
    assert per_key[2] == [20]


def test_gapfill_multi_count_interval_keeps_observed_mass(spark):
    """The round-5 ADVICE bug: with '2 hours' / '15 minutes' intervals,
    observations in off-step buckets used to vanish (date_trunc bucketed
    by the single unit while the grid stepped by the full interval).
    Epoch-floored buckets keep the observed-mass invariant for any N."""
    rows = [
        (1, _ts(0, 5), 10.0),
        (1, _ts(1, 30), 2.0),   # off-step hour for '2 hours'
        (1, _ts(3, 7), 5.0),    # off-step hour again
        (1, _ts(6, 59), 7.0),
        (2, _ts(9, 44), 1.0),   # off-step quarter for '15 minutes'
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    for interval in ("2 hours", "15 minutes", "90 seconds", "3 days"):
        out = resample_gapfill(df, "user_id", "ts", "value", interval).collect()
        assert sum(r["v_sum"] or 0.0 for r in out) == 25.0, interval
        assert sum(r["n_obs"] for r in out) == 5, interval
    # '2 hours' bucket layout: user 1 hours {0,1}->0, {3}->2, {6}->6
    out = {
        (r["user_id"], r["bucket"].hour): r
        for r in resample_gapfill(df, "user_id", "ts", "value", "2 hours").collect()
    }
    assert out[(1, 0)]["v_sum"] == 12.0
    assert out[(1, 2)]["v_sum"] == 5.0
    assert out[(1, 4)]["is_gap"] and out[(1, 4)]["v_ff"] == 5.0
    assert out[(1, 6)]["v_sum"] == 7.0


def test_gapfill_multi_count_matches_duckdb_twin(spark):
    """Cross-engine parity of the epoch-floored bucket rule."""
    import duckdb

    from pytrousse_spark.operators.timeseries import resample_gapfill_sql
    from tests.conftest import assert_df_matches_sql

    rows = [
        (1, _ts(0, 5), 10.0), (1, _ts(1, 30), 2.0), (1, _ts(3, 7), 5.0),
        (1, _ts(6, 59), 7.0), (2, _ts(9, 44), 1.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    pdf = df.toPandas()  # noqa: F841 — registered by name below
    con = duckdb.connect()
    con.sql("CREATE TABLE ev AS SELECT * FROM pdf")
    got = resample_gapfill(df, "user_id", "ts", "value", "2 hours")
    sql = resample_gapfill_sql("ev", "user_id", "ts", "value", "2 hours")
    assert_df_matches_sql(got, con, sql)
    con.close()


def test_gapfill_rejects_unfloorable_intervals(spark):
    import pytest

    df = spark.createDataFrame([(1, _ts(0), 1.0)], ["user_id", "ts", "value"])
    for bad in ("2 months", "3 years", "0 hours", "hourly"):
        with pytest.raises(ValueError):
            resample_gapfill(df, "user_id", "ts", "value", bad)


def test_ewma_constant_series_is_exact(spark):
    """Normalized dyadic EWMA of a constant series is that constant
    EXACTLY (integer weights sum to the divisor)."""
    from pytrousse_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [(1, i, 7.5, i) for i in range(10)], ["k", "t", "v", "i"]
    )
    rows = ewma(df, "k", "t", "v", "i", window=4).collect()
    assert all(r["ewma"] == 7.5 for r in rows)


def test_ewma_weights_recent_more(spark):
    """A step up makes the EWMA rise toward the new level but stay below
    it; the latest observation carries weight ~1/2."""
    from pytrousse_spark.operators.timeseries import ewma

    vals = [0.0] * 8 + [10.0]
    df = spark.createDataFrame(
        [(1, i, v, i) for i, v in enumerate(vals)], ["k", "t", "v", "i"]
    )
    last = (
        ewma(df, "k", "t", "v", "i", window=8)
        .where("t = 8").first()["ewma"]
    )
    assert 4.9 < last < 5.2  # 10 * (2^7/(2^8-1)) ≈ 5.02


def test_cumulative_distinct_laws(spark):
    """cum_distinct is non-decreasing, ends at the total distinct count,
    and n_new sums to it; n_active <= cum_distinct per period."""
    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.timeseries import cumulative_distinct
    from tests.conftest import SF_DIR

    ev = read_parquet_df(spark, f"{SF_DIR}/events.parquet")
    rows = sorted(
        cumulative_distinct(ev, "user_id", "ts", "day").collect(),
        key=lambda r: r["period"],
    )
    total = ev.select("user_id").distinct().count()
    assert rows[-1]["cum_distinct"] == total
    assert sum(r["n_new"] for r in rows) == total
    assert all(
        a["cum_distinct"] <= b["cum_distinct"] for a, b in zip(rows, rows[1:])
    )
    assert all(r["n_active"] <= r["cum_distinct"] for r in rows)


def test_mad_anomalies_flags_planted_outlier(spark):
    """A planted extreme value is the only anomaly; a clean constant-ish
    key has zero (MAD robustness: one outlier cannot inflate the scale
    estimate the way a stddev rule would)."""
    from pytrousse_spark.operators.timeseries import mad_anomalies

    rows = [(1, float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 500]]
    rows += [(2, 5.0), (2, 5.1), (2, 4.9), (2, 5.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r["k"]: r for r in mad_anomalies(df, "k", "v", k=3.0).collect()}
    assert got[1]["n_anomalies"] == 1 and got[1]["n_events"] == 8
    assert got[2]["n_anomalies"] == 0
    assert abs(got[1]["med"] - 10.5) < 1e-9


def test_seasonal_decompose_recovers_planted_pattern(spark):
    import datetime as dt

    from pytrousse_spark.operators.timeseries import seasonal_decompose

    # constant level 100 + weekly pattern keyed by (epoch-day % 7):
    # every complete centered window holds each position exactly once, so
    # trend == 100 + mean(pattern), seasonal == pattern - mean(pattern),
    # residual == 0 on every interior row.
    pattern = [0.0, 3.0, -2.0, 5.0, -1.0, -4.0, -1.0]  # mean 0
    start = dt.date(2024, 1, 1)
    rows = []
    for i in range(28):
        d = start + dt.timedelta(days=i)
        pos = (d - dt.date(1970, 1, 1)).days % 7
        rows.append((d, 100.0 + pattern[pos]))
    df = spark.createDataFrame(rows, "day date, v double")
    out = seasonal_decompose(df, "day", "v", period=7).collect()
    assert len(out) == 28
    interior = [r for r in out if r["trend"] is not None]
    assert len(interior) == 22
    for r in interior:
        assert r["trend"] == 100.0
        pos = (r["day"] - dt.date(1970, 1, 1)).days % 7
        assert r["seasonal"] == pattern[pos]
        assert r["residual"] == 0.0
    # edge rows: trend/residual NULL, seasonal still defined
    edge = [r for r in out if r["trend"] is None]
    assert all(r["residual"] is None and r["seasonal"] is not None
               for r in edge)


def test_seasonal_decompose_rejects_bad_period(spark):
    import pytest as _pytest

    from pytrousse_spark.operators.timeseries import seasonal_decompose

    df = spark.createDataFrame([], "day date, v double")
    with _pytest.raises(ValueError):
        seasonal_decompose(df, "day", "v", period=1)


def test_rolling_time_window_hand_computed(spark):
    """Bucketed-prefix rolling window: frame [t-W, t] inclusive of BOTH
    ends, ties included, NULL values excluded from the avg but counted
    in roll_n, empty previous buckets handled."""
    import datetime as dt

    from pytrousse_spark.operators.timeseries import rolling_time_window

    def t(m, s=0):
        return dt.datetime(2024, 3, 1, 0, m, s)

    rows = [
        (1, 1, t(0), 10.0),
        (2, 1, t(30), 20.0),
        (3, 1, t(59, 59), None),      # NULL value: counted, not averaged
        (4, 1, dt.datetime(2024, 3, 1, 1, 0), 40.0),   # exactly t0+1h
        (5, 1, dt.datetime(2024, 3, 1, 3, 30), 5.0),   # bucket gap (no b-1)
        (6, 2, t(10), 7.0),
    ]
    df = spark.createDataFrame(rows, "event_id int, k int, ts timestamp, value double")
    got = {
        r["event_id"]: r
        for r in rolling_time_window(
            df, "k", "ts", "value", "1 hour", strategy="bucketed"
        ).collect()
    }
    assert got[1]["roll_n"] == 1 and got[1]["roll_avg"] == 10.0
    assert got[2]["roll_n"] == 2 and got[2]["roll_avg"] == 15.0
    assert got[3]["roll_n"] == 3 and got[3]["roll_avg"] == 15.0
    # frame [00:00, 01:00] INCLUSIVE both ends -> all four rows, avg of 3
    assert got[4]["roll_n"] == 4
    assert got[4]["roll_avg"] == round(70.0 / 3, 4)
    # isolated event after a multi-bucket gap
    assert got[5]["roll_n"] == 1 and got[5]["roll_avg"] == 5.0
    # keys never mix
    assert got[6]["roll_n"] == 1 and got[6]["roll_avg"] == 7.0


def test_rolling_time_window_matches_plain_window_on_events(spark):
    """Bit-exact equivalence of the decomposition and the RANGE window
    on real data (the q157 oracle is the same check via DuckDB)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.timeseries import rolling_time_window
    from tests.conftest import SF_DIR

    ev = read_parquet_df(spark, f"{SF_DIR}/events.parquet")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    vu = F.round(F.col("value") * 1_000_000, 0).cast("long")
    ref = ev.select(
        "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("rn"),
        F.when(
            F.count("value").over(w) > 0,
            F.round(
                (F.sum(vu).over(w).cast("double") / F.lit(1000000.0))
                / F.count("value").over(w).cast("double"),
                4,
            ),
        ).alias("ra"),
    )
    got = rolling_time_window(
        ev, "user_id", "ts", "value", "1 hour", strategy="bucketed"
    ).select("event_id", "roll_n", "roll_avg")
    j = got.join(ref, "event_id")
    bad = j.where(
        (F.col("roll_n") != F.col("rn"))
        | (F.col("roll_avg") != F.col("ra"))
    ).count()
    assert bad == 0 and j.count() == ev.count()


def test_cusum_detects_planted_shift(spark):
    """A series flat at 10 that jumps to 13 on day 11: S+ accumulates
    (13 - mu0 - k) per day after the shift and crosses h; the flat
    prefix never flags; S- stays at 0 after the shift."""
    from datetime import datetime

    from pytrousse_spark.operators.timeseries import cusum_changepoints

    rows = []
    for d in range(1, 21):
        v = 10.0 if d <= 10 else 13.0
        for i in range(5):
            rows.append((datetime(2024, 1, d, i), v))
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = cusum_changepoints(df, "ts", "value", "day", 0.5, 3.0)
    got = out.collect()
    assert len(got) == 20
    # mu0 = 11.5 (pooled): the LOW prefix is itself a negative shift
    # from the pooled mean — S- accumulates 1.0/day and crosses h=3 on
    # day 4, then drains 2.0/day after the jump; S+ accumulates 1.0/day
    # from day 11 and crosses on day 14
    by_day = {r["bucket"].day: r for r in got}
    assert by_day[4]["is_shift"] and by_day[4]["s_neg"] == 4.0
    assert by_day[14]["is_shift"] and by_day[14]["s_pos"] == 4.0
    assert not by_day[3]["is_shift"]  # S- exactly 3, not yet > h
    assert by_day[10]["s_neg"] == 10.0  # full prefix accumulation
    assert by_day[12]["s_neg"] == 6.0   # draining 2/day after the jump
    assert by_day[1]["s_pos"] == 0.0 and not by_day[1]["is_shift"]
    # a genuinely single-regime series never flags
    flat = spark.createDataFrame(
        [(datetime(2024, 1, d), 10.0) for d in range(1, 21)],
        ["ts", "value"],
    )
    flat_out = cusum_changepoints(flat, "ts", "value", "day", 0.5, 3.0)
    assert all(not r["is_shift"] for r in flat_out.collect())


def test_cusum_matches_recursive_reference(spark):
    """The reflected-random-walk closed form equals the textbook
    recursion max(0, S + dev) computed in Python."""
    import random
    from datetime import datetime

    from pytrousse_spark.operators.timeseries import cusum_changepoints

    rng = random.Random(3)
    vals = [round(50 + rng.uniform(-8, 8), 3) for _ in range(25)]
    rows = [(datetime(2024, 2, 1 + i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["ts", "value"])
    k, h = 1.0, 4.0
    got = cusum_changepoints(df, "ts", "value", "day", k, h).collect()
    # reference recursion in exact micro-units (mirroring the operator's
    # scale-0 rounded bucket means and mu0)
    mm = [round(v * 1_000_000) for v in vals]
    mu0 = round(sum(mm) / len(mm))
    km = round(k * 1_000_000)
    sp = sn = 0
    for r, x in zip(got, mm):
        sp = max(0, sp + (x - mu0 - km))
        sn = max(0, sn - (x - mu0 + km))
        assert r["s_pos"] == round(sp / 1e6, 6)
        assert r["s_neg"] == round(sn / 1e6, 6)


def test_cusum_grouped_independent_series(spark):
    """Groups are independent: a shifted group flags, a flat one never
    does, and each group's mu0 is its own."""
    from datetime import datetime

    from pytrousse_spark.operators.timeseries import cusum_changepoints

    rows = []
    for d in range(1, 15):
        rows.append(("flat", datetime(2024, 3, d), 5.0))
        rows.append(("shift", datetime(2024, 3, d), 5.0 if d <= 7 else 11.0))
    df = spark.createDataFrame(rows, ["g", "ts", "value"])
    out = cusum_changepoints(
        df, "ts", "value", "day", 0.5, 4.0, ["g"]
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["g"], []).append(r)
    assert all(not r["is_shift"] for r in by["flat"])
    assert any(r["is_shift"] for r in by["shift"])
    assert all(r["mean_value"] == 5.0 for r in by["flat"])


def test_rolling_time_window_null_key_and_ts(spark):
    """r5 ADVICE regression: NULL-key rows are a real window partition
    (null-safe join keys — exact frames, matching the plain window) and
    NULL-ts rows pass through with NULL roll_n/roll_avg instead of
    vanishing."""
    from pytrousse_spark.operators.timeseries import rolling_time_window

    rows = [
        (None, "2024-01-01 00:00:00", 2.0),
        (None, "2024-01-01 00:30:00", 4.0),
        (None, "2024-01-01 02:00:00", 6.0),
        ("u", "2024-01-01 00:10:00", 1.0),
        ("u", None, 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, value double")
    df = df.withColumn("ts", df["ts"].cast("timestamp"))
    out = rolling_time_window(
        df, "k", "ts", "value", "1 hour", strategy="bucketed"
    ).collect()
    assert len(out) == 5  # no row loss
    null_ts = [r for r in out if r["ts"] is None]
    assert len(null_ts) == 1
    assert null_ts[0]["roll_n"] is None and null_ts[0]["roll_avg"] is None
    nk = {
        str(r["ts"]): (r["roll_n"], r["roll_avg"])
        for r in out
        if r["k"] is None
    }
    # NULL-key partition frames exactly like any other key
    assert nk["2024-01-01 00:00:00"] == (1, 2.0)
    assert nk["2024-01-01 00:30:00"] == (2, 3.0)
    assert nk["2024-01-01 02:00:00"] == (1, 6.0)


def test_seasonal_naive_backtest_laws(spark):
    """A perfectly 7-periodic series forecasts itself exactly
    (seasonal_mae = 0, mase = 0) while the one-step naive still errs;
    missing days densify to 0 and count as train days."""
    import datetime as dt

    from pytrousse_spark.operators.timeseries import (
        seasonal_naive_backtest,
    )

    t0 = dt.date(2024, 1, 1)
    pattern = [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0]
    rows = [
        (t0 + dt.timedelta(days=i), pattern[i % 7]) for i in range(70)
    ]
    df = spark.createDataFrame(rows, "d date, v double")
    r = seasonal_naive_backtest(df, "d", "v", season=7, horizon=14)
    out = r.collect()[0]
    assert out["n_test"] == 14
    assert out["seasonal_mae"] == 0.0 and out["mase"] == 0.0
    assert out["naive_mae"] > 0

    # drop one mid-train day -> densified to 0, horizon unchanged
    rows_gap = [x for x in rows if x[0] != t0 + dt.timedelta(days=30)]
    out2 = seasonal_naive_backtest(
        spark.createDataFrame(rows_gap, "d date, v double"),
        "d", "v", season=7, horizon=14,
    ).collect()[0]
    assert out2["n_train"] == out["n_train"]  # spine, not row count
    # the gap sits in TRAIN: test-window seasonal forecasts untouched,
    # but the one-step-naive denominator feels the 0-filled day
    assert out2["seasonal_mae"] == 0.0
    assert out2["naive_mae"] != out["naive_mae"]


# ---------------------------------------------------------------------------
# ACF / Ljung-Box, Pettitt, Mann-Kendall laws (round 7)
# ---------------------------------------------------------------------------
def _daily_events(spark, values, start=dt.datetime(2024, 5, 1)):
    rows = [
        (i, start + dt.timedelta(days=i), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "value"])


def test_acf_periodic_signal_peaks_at_its_period(spark):
    from pytrousse_spark.operators.timeseries import acf_ljung_box

    # period-7 square wave over 56 days: lag-7 ACF ~ 1, lag 3/4 negative
    vals = [100.0 if (i % 7) < 3 else 1.0 for i in range(56)]
    rows = {
        r["lag"]: r
        for r in acf_ljung_box(
            _daily_events(spark, vals), "ts", "value", 7
        ).collect()
    }
    assert rows[7]["acf"] > 0.8
    assert rows[3]["acf"] < 0
    assert rows[7]["n"] == 56
    # strong autocorrelation -> Ljung-Box rejects decisively
    assert rows[7]["lb_p"] < 1e-4
    # Q is a cumulative statistic: nondecreasing in lag
    qs = [rows[k]["lb_q"] for k in sorted(rows)]
    assert all(b >= a for a, b in zip(qs, qs[1:]))


def test_acf_constant_series_is_null_and_matches_definition(spark):
    from pytrousse_spark.operators.timeseries import acf_ljung_box

    # constant series: zero variance -> 0/0 -> NULL acf, no crash
    rows = acf_ljung_box(
        _daily_events(spark, [5.0] * 20), "ts", "value", 3
    ).collect()
    assert all(r["acf"] is None for r in rows)


def test_acf_matches_numpy_definition(spark):
    from pytrousse_spark.operators.timeseries import acf_ljung_box

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0]
    rows = {
        r["lag"]: r["acf"]
        for r in acf_ljung_box(
            _daily_events(spark, vals), "ts", "value", 3
        ).collect()
    }
    import numpy as np

    c = np.array([round(v * 100) for v in vals], dtype=float)
    m = c.mean()
    den = ((c - m) ** 2).sum()
    for k in (1, 2, 3):
        ref = ((c[:-k] - m) * (c[k:] - m)).sum() / den
        assert abs(rows[k] - ref) < 1e-6, (k, rows[k], ref)


def test_pettitt_finds_planted_shift(spark):
    from pytrousse_spark.operators.timeseries import pettitt_test

    # 30 low days then 30 high days -> change at day 30
    vals = [10.0] * 30 + [50.0] * 30
    row = pettitt_test(
        _daily_events(spark, vals), "ts", "value"
    ).collect()[0]
    assert row["n"] == 60
    assert row["change_day"] == dt.date(2024, 5, 30)
    assert row["p_value"] < 1e-6
    # K for a clean split: every (low, high) cross pair contributes +1
    # to U_30 -> K = 30*30 (Pettitt's U is the signed Mann-Whitney)
    assert row["u_stat"] == 900


def test_pettitt_noise_is_insignificant(spark):
    from pytrousse_spark.operators.timeseries import pettitt_test

    # deterministic "noise": alternating pattern has no level shift
    vals = [float(10 + (i * 7919) % 13) for i in range(40)]
    row = pettitt_test(
        _daily_events(spark, vals), "ts", "value"
    ).collect()[0]
    assert row["p_value"] > 0.05


def test_mann_kendall_monotone_and_flat_laws(spark):
    from pytrousse_spark.operators.timeseries import mann_kendall

    # strictly increasing: S = C(n,2), slope recovered, p ~ 0
    n = 25
    vals = [2.5 * i for i in range(n)]
    row = mann_kendall(
        _daily_events(spark, vals), "ts", "value"
    ).collect()[0]
    assert row["s_stat"] == n * (n - 1) // 2
    assert abs(row["sen_slope"] - 2.5) < 1e-9
    assert row["p_value"] < 1e-6
    # no ties -> Var(S)*18 = n(n-1)(2n+5)
    assert row["var_s_x18"] == n * (n - 1) * (2 * n + 5)

    # constant: S = 0, z = 0, p = 1
    row = mann_kendall(
        _daily_events(spark, [7.0] * 10), "ts", "value"
    ).collect()[0]
    assert row["s_stat"] == 0 and row["z"] == 0.0
    assert row["p_value"] == 1.0


def test_cross_correlation_planted_lead(spark):
    from pytrousse_spark.operators.timeseries import cross_correlation

    # y is x shifted forward by 2 days -> ccf peaks at lag +2
    base = [float(10 + (i * 7919) % 97) for i in range(40)]
    rows = []
    start = dt.datetime(2024, 5, 1)
    for i, v in enumerate(base):
        rows.append((i, start + dt.timedelta(days=i), "a", v))
        if i >= 2:
            rows.append(
                (1000 + i, start + dt.timedelta(days=i), "b",
                 base[i - 2])
            )
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "event_type", "value"]
    )
    got = {
        r["lag"]: r["ccf"]
        for r in cross_correlation(
            df, "ts", "value", "event_type", "a", "b", 5
        ).collect()
    }
    best = max(got, key=lambda k: got[k] if got[k] is not None else -9)
    assert best == 2
    # zero-filled lead-in days dilute the full-series normalization,
    # so the peak is strong but not ~1
    assert got[2] > 0.8
    # lag 0 is much weaker than the true lead
    assert got[2] - got[0] > 0.3


def test_cross_correlation_antisymmetry(spark):
    from pytrousse_spark.operators.timeseries import cross_correlation

    rows = []
    start = dt.datetime(2024, 5, 1)
    for i in range(30):
        rows.append((i, start + dt.timedelta(days=i), "a",
                     float(1 + (i * 31) % 11)))
        rows.append((100 + i, start + dt.timedelta(days=i), "b",
                     float(2 + (i * 17) % 7)))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "event_type", "value"]
    )
    ab = {
        r["lag"]: r["ccf"]
        for r in cross_correlation(
            df, "ts", "value", "event_type", "a", "b", 4
        ).collect()
    }
    ba = {
        r["lag"]: r["ccf"]
        for r in cross_correlation(
            df, "ts", "value", "event_type", "b", "a", 4
        ).collect()
    }
    # ccf_xy(k) == ccf_yx(-k)
    for k in range(-4, 5):
        assert abs(ab[k] - ba[-k]) < 2e-6, (k, ab[k], ba[-k])


def test_kruskal_wallis_planted_weekday_effect(spark):
    from pytrousse_spark.operators.timeseries import kruskal_wallis_dow

    # Mondays are 100x every other day over 10 weeks
    rows = []
    start = dt.datetime(2024, 5, 6)  # a Monday
    for i in range(70):
        day = start + dt.timedelta(days=i)
        v = 1000.0 if day.weekday() == 0 else 10.0 + (i % 3)
        rows.append((i, day, v))
    df = spark.createDataFrame(rows, ["event_id", "ts", "value"])
    r = kruskal_wallis_dow(df, "ts", "value").collect()[0]
    assert r["n"] == 70 and r["n_groups"] == 7
    assert r["p_value"] < 0.001

    # no weekday structure (period-2 pattern, coprime with 7) -> H ~ 0
    flat = spark.createDataFrame(
        [(i, start + dt.timedelta(days=i), float(i % 2))
         for i in range(70)],
        ["event_id", "ts", "value"],
    )
    r2 = kruskal_wallis_dow(flat, "ts", "value").collect()[0]
    assert r2["p_value"] > 0.5


def test_ohlc_hand_computed(spark):
    from pytrousse_spark.operators.timeseries import ohlc_bars

    base = dt.datetime(2024, 5, 1)
    rows = [
        # key a, day 1: ticks in shuffled insert order
        ("a", base + dt.timedelta(hours=3), 2, 30.0),
        ("a", base + dt.timedelta(hours=1), 1, 10.0),
        ("a", base + dt.timedelta(hours=23), 3, 20.0),
        # equal-timestamp tie: order_col decides open
        ("b", base, 5, 99.0),
        ("b", base, 4, 11.0),
        # key a, day 2: single tick
        ("a", base + dt.timedelta(days=1), 6, 7.5),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "event_id", "value"])
    got = {
        (r["key"], r["bucket"].day): r
        for r in ohlc_bars(
            df, "k", "ts", "value", "event_id", "1 day"
        ).collect()
    }
    a1 = got[("a", 1)]
    assert (a1["open"], a1["high"], a1["low"], a1["close"]) == (
        10.0, 30.0, 10.0, 20.0,
    )
    assert a1["n_ticks"] == 3 and abs(a1["vwap"] - 20.0) < 1e-9
    b = got[("b", 1)]
    assert b["open"] == 11.0 and b["close"] == 99.0  # order_col tie-break
    a2 = got[("a", 2)]
    assert a2["open"] == a2["close"] == a2["high"] == a2["low"] == 7.5


def test_seasonal_strength_planted(spark):
    from pytrousse_spark.operators.timeseries import seasonal_strength

    start = dt.datetime(2024, 5, 6)  # Monday
    # pure weekly signal -> f_seasonal 1, trend+residual constant ->
    # f_trend NULL (stated)
    rows = [
        (i, start + dt.timedelta(days=i),
         100.0 + (50.0 if (start + dt.timedelta(days=i)).weekday() == 0
                  else 0.0))
        for i in range(70)
    ]
    r = seasonal_strength(
        spark.createDataFrame(rows, ["event_id", "ts", "value"]),
        "ts", "value", 7,
    ).collect()[0]
    assert r["f_seasonal"] == 1.0 and r["f_trend"] is None

    # pure linear trend -> f_trend 1, no seasonal structure
    rows = [(i, start + dt.timedelta(days=i), 100.0 + 3.0 * i)
            for i in range(70)]
    r = seasonal_strength(
        spark.createDataFrame(rows, ["event_id", "ts", "value"]),
        "ts", "value", 7,
    ).collect()[0]
    assert r["f_trend"] == 1.0 and r["f_seasonal"] is None

    # mixed: both present, both strengths high
    rows = [
        (i, start + dt.timedelta(days=i),
         100.0 + 2.0 * i
         + (40.0 if (start + dt.timedelta(days=i)).weekday() == 0
            else 0.0))
        for i in range(70)
    ]
    r = seasonal_strength(
        spark.createDataFrame(rows, ["event_id", "ts", "value"]),
        "ts", "value", 7,
    ).collect()[0]
    assert r["f_seasonal"] > 0.95 and r["f_trend"] > 0.95


def test_peak_concurrency_handcrafted(spark):
    """Sweep-line laws on planted sessions: two users overlapping on
    day 1 -> peak 2; a session ending exactly when another starts
    counts both (closed intervals); a midnight-crossing session carries
    +1 into the next day."""
    from datetime import datetime as ts

    from pytrousse_spark.operators.timeseries import peak_concurrency

    rows = []
    eid = 0

    def ev(u, t):
        nonlocal eid
        rows.append((eid, u, t))
        eid += 1

    # day 1: user 1 session 10:00-10:20, user 2 session 10:10-10:30
    ev(1, ts(2024, 1, 1, 10, 0))
    ev(1, ts(2024, 1, 1, 10, 20))
    ev(2, ts(2024, 1, 1, 10, 10))
    ev(2, ts(2024, 1, 1, 10, 30))
    # user 3 starts EXACTLY when user 2 ends -> still concurrent (peak 2)
    ev(3, ts(2024, 1, 1, 10, 30))
    ev(3, ts(2024, 1, 1, 10, 40))
    # day 2->3: user 1 active 23:50-00:10 (one session, gap 20 min)
    ev(1, ts(2024, 1, 2, 23, 50))
    ev(1, ts(2024, 1, 3, 0, 10))
    # day 3: user 2 session overlapping the carried one
    ev(2, ts(2024, 1, 3, 0, 5))
    ev(2, ts(2024, 1, 3, 0, 15))
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = {
        str(r["day"]): r["peak_sessions"]
        for r in peak_concurrency(df, "user_id", "ts", "event_id").collect()
    }
    assert out["2024-01-01"] == 2
    assert out["2024-01-02"] == 1   # only the start endpoint lands here
    assert out["2024-01-03"] == 2   # carried session + user 2's


def test_peak_concurrency_bounds(spark):
    """Peak is >= 1 on every emitted day and never exceeds the number
    of distinct users (each user has at most one open session)."""
    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.timeseries import peak_concurrency
    from tests.conftest import SF_DIR

    ev = read_parquet_df(spark, f"{SF_DIR}/events.parquet")
    out = peak_concurrency(ev, "user_id", "ts", "event_id").collect()
    n_users = ev.select("user_id").distinct().count()
    assert out and all(1 <= r["peak_sessions"] <= n_users for r in out)


def _granger_events(spark, causal: bool):
    """60-day planted pair: x_t deterministic pseudo-random; y_t =
    2*x_{t-1} + small wiggle when causal, independent wiggle when not."""
    from datetime import datetime, timedelta

    rows = []
    eid = 0
    x_prev = 0.0
    for t in range(60):
        day = datetime(2024, 1, 1) + timedelta(days=t)
        x = float((t * 37 + 11) % 23) + 1.0
        if causal:
            y = 2.0 * x_prev + float((t * 13) % 5)
        else:
            y = float((t * 31 + 7) % 19) + 1.0
        rows.append((eid, 1, "click", day, x)); eid += 1
        rows.append((eid, 1, "purchase", day, y)); eid += 1
        x_prev = x
    return spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "value"]
    )


def test_granger_detects_planted_causation(spark):
    from pytrousse_spark.operators.timeseries import granger_lead_lag

    df = _granger_events(spark, causal=True)
    r = granger_lead_lag(
        df, "ts", "value", "event_type", "click", "purchase"
    ).first()
    assert r["n"] == 59
    # y_t is almost exactly 2*x_{t-1}: huge F, tiny p, b_cross near 2
    assert r["f_stat"] > 50
    assert r["p_normal"] is not None and r["p_normal"] < 1e-4
    assert abs(r["b_cross"] - 2.0) < 0.2


def test_granger_null_on_independent_series(spark):
    from pytrousse_spark.operators.timeseries import granger_lead_lag

    df = _granger_events(spark, causal=False)
    r = granger_lead_lag(
        df, "ts", "value", "event_type", "click", "purchase"
    ).first()
    assert r["f_stat"] is not None and r["f_stat"] < 10
    assert r["p_normal"] is None or r["p_normal"] > 0.001


def test_poisson_rate_ratio_planted(spark):
    """Planted 3x rate difference: 6/day for 10 days vs 2/day for 10
    days -> RR = 3 exactly, CI excludes 1, p small; swapped halves
    invert the ratio."""
    from datetime import datetime, timedelta

    from pytrousse_spark.operators.timeseries import poisson_rate_ratio

    rows = []
    eid = 0
    for day in range(1, 11):          # days 1..10 -> first half
        for _ in range(6):
            rows.append((eid, 1, "purchase",
                         datetime(2024, 1, day, 12))); eid += 1
    for day in range(16, 26):         # days 16..25 -> second half
        for _ in range(2):
            rows.append((eid, 1, "purchase",
                         datetime(2024, 1, day, 12))); eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts"]
    )
    r = poisson_rate_ratio(df, "ts", 15, "purchase").first()
    assert (r["n1"], r["days1"], r["n2"], r["days2"]) == (60, 10, 20, 10)
    assert abs(r["rate_ratio"] - 3.0) < 1e-6
    assert r["ci_lo"] > 1.0 and r["p_normal"] < 0.001
    assert r["ci_lo"] < 3.0 < r["ci_hi"]


def test_burstiness_periodic_vs_bursty(spark):
    """Laws: perfectly periodic gaps -> burstiness = -1 (sigma 0);
    a bursty key (tight clusters, long silences) -> burstiness > 0;
    constant daily counts -> fano 0; day-boundary gaps are COUNTED
    (n_gaps = n_events - 1 even across midnight)."""
    from datetime import datetime, timedelta

    from pytrousse_spark.operators.timeseries import burstiness_census

    rows = []
    eid = 0
    # key 'p': every 6 hours across 5 days -> periodic, 4/day boundary-
    # crossing gaps included
    t0 = datetime(2024, 1, 1)
    for i in range(20):
        rows.append((eid, "p", t0 + timedelta(hours=6 * i))); eid += 1
    # key 'b': clusters of 5 events 1s apart, then 2-day silence
    tb = datetime(2024, 1, 1)
    for c in range(4):
        for j in range(5):
            rows.append((eid, "b", tb + timedelta(seconds=j))); eid += 1
        tb += timedelta(days=2)
    df = spark.createDataFrame(rows, ["event_id", "event_type", "ts"])
    out = {
        r["event_type"]: r
        for r in burstiness_census(df, "event_type", "ts", "event_id").collect()
    }
    p, b = out["p"], out["b"]
    assert p["n_gaps"] == 19          # boundary gaps included
    assert p["burstiness"] == -1.0    # sigma = 0 exactly
    assert abs(p["mean_gap_s"] - 6 * 3600) < 1e-6
    assert b["n_gaps"] == 19
    # closed form for 16 gaps of 1s + 3 of ~2d: mu~27283, sigma~63000,
    # B = (sigma-mu)/(sigma+mu) ~ 0.3956 — well above the Poisson 0 line
    assert b["burstiness"] > 0.3      # heavy-tailed gaps
    assert abs(b["burstiness"] - 0.395646) < 1e-3
    assert b["fano_daily"] > 1.0      # overdispersed daily counts


def test_gesd_unmasks_outlier_pair_and_cuts_degenerate_rounds(spark):
    """Laws: (1) the flagged rounds replay a hand-run Rosner chain —
    round 1 takes the global extreme, round 2 the MASKED twin, round
    3 the low day; (2) after all outliers are removed the series is
    constant (sd = 0) and the remaining rounds are CUT, not emitted
    as NaN; (3) the argmax is integer-exact: r_stat matches the
    closed form to 1e-6."""
    from datetime import datetime, timedelta

    from pytrousse_spark.operators.timeseries import gesd_outliers

    t0 = datetime(2024, 1, 1)
    vals = [10.0] * 30
    vals[5], vals[6], vals[20] = 500.0, 480.0, 0.5
    rows = [
        (i, t0 + timedelta(days=i, hours=3), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "value"])
    out = gesd_outliers(df, "ts", "value", k=5).collect()
    assert [r["round"] for r in out] == [1, 2, 3]  # rounds 4-5 cut
    assert [r["value_cents"] for r in out] == [50000, 48000, 50]
    assert [str(r["day"]) for r in out] == [
        "2024-01-06", "2024-01-07", "2024-01-21"
    ]
    assert [r["n_remaining"] for r in out] == [30, 29, 28]
    # closed-form round-1 r_stat: dev*/(n*sd) on the exact cent stats
    import math

    c = [round(v * 100) for v in vals]
    n, s = len(c), sum(c)
    ss = sum(x * x for x in c)
    sd = math.sqrt((n * ss - s * s) / (n * (n - 1)))
    want = max(abs(n * x - s) for x in c) / (n * sd)
    assert abs(out[0]["r_stat"] - want) < 1e-6


def test_theil_sen_shrugs_off_outliers_that_move_ols(spark):
    """Laws: on a clean 3-cents/day trend the slope is EXACT 3.0 even
    with two gross outliers planted (median of pairwise slopes has a
    29% breakdown point); n_pairs = T(T-1)/2; the intercept recovers
    the level at index 0 (median residual); odd vs even pair counts
    both hit the explicit two-middle-row median."""
    from datetime import datetime, timedelta

    from pytrousse_spark.operators.timeseries import theil_sen_trend

    t0 = datetime(2024, 1, 1)
    vals = [10.0 + 0.03 * i for i in range(40)]
    vals[10], vals[30] = 900.0, -500.0
    rows = [
        (i, t0 + timedelta(days=i, hours=1), float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "value"])
    out = theil_sen_trend(df, "ts", "value").collect()[0]
    assert out["n_days"] == 40
    assert out["n_pairs"] == 40 * 39 // 2
    assert out["slope"] == 3.0
    # residual at the median slope: c_i - 3*i = 1000 - 3 (1-based i)
    assert out["intercept"] == 997.0


def test_repeated_median_brute_force_and_breakdown(spark):
    """Siegel repeated median: (1) exact brute-force pin of the
    median-of-per-day-medians on an irregular series with planted
    outliers; (2) the 50%-breakdown law Theil-Sen cannot satisfy —
    with 45% of days corrupted the slope still reads EXACTLY 3
    cents/day; n_pairs counts ORDERED pairs T(T-1)."""
    import statistics
    from datetime import datetime, timedelta

    from pytrousse_spark.operators.timeseries import (
        repeated_median_trend,
        theil_sen_trend,
    )

    t0 = datetime(2024, 1, 1)

    def run(vals):
        rows = [
            (i, t0 + timedelta(days=i, hours=1), float(v))
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(rows, ["event_id", "ts", "value"])
        return repeated_median_trend(df, "ts", "value").collect()[0]

    def brute(vals):
        c = [int(round(v * 100)) for v in vals]
        t = len(c)

        def med(xs):
            s = sorted(xs)
            n = len(s)
            return (s[(n + 1) // 2 - 1] + s[n // 2]) / 2.0

        inner = [
            med([(c[j] - c[i]) / (j - i) for j in range(t) if j != i])
            for i in range(t)
        ]
        slope = med(inner)
        icept = med([c[i] - slope * (i + 1) for i in range(t)])
        return round(slope, 6), round(icept, 6)

    import random

    rng = random.Random(5)
    vals = [10.0 + 0.03 * i + rng.choice([0, 0, 0.01, -0.01]) for i in range(37)]
    vals[5], vals[20] = 400.0, -77.0
    out = run(vals)
    bs, bi = brute(vals)
    assert out["n_days"] == 37 and out["n_pairs"] == 37 * 36
    assert abs(out["slope"] - bs) < 1e-9
    assert abs(out["intercept"] - bi) < 1e-9

    # breakdown law: corrupt the LAST 45% of days with a huge monotone
    # ramp (so pairwise slopes to the corrupted block are all positive
    # — a symmetric corruption would let Theil-Sen's pair median hide
    # between cancelling signs); the repeated median holds the exact
    # 3 cents/day while Theil-Sen's pair median lands in the ramp
    clean = [10.0 + 0.03 * i for i in range(40)]
    corrupted = list(clean)
    for k in range(18):
        corrupted[22 + k] = 5000.0 + 17.0 * k
    out = run(corrupted)
    assert out["slope"] == 3.0
    rows = [
        (i, t0 + timedelta(days=i, hours=1), float(v))
        for i, v in enumerate(corrupted)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "value"])
    ts = theil_sen_trend(df, "ts", "value").collect()[0]
    assert abs(ts["slope"] - 3.0) > 1.0  # Theil-Sen has already broken

    # statistics.median cross-check of the inner-median device on a
    # tiny even-pair-count series (T=4 -> 3 slopes per day, odd; T=5
    # -> 4 slopes, even middles averaged)
    for t in (4, 5):
        vs = [1.0 + 0.07 * i * i for i in range(t)]
        out = run(vs)
        bs, bi = brute(vs)
        assert abs(out["slope"] - bs) < 1e-9
        assert abs(out["intercept"] - bi) < 1e-9


def test_distance_correlation_sees_what_pearson_misses(spark):
    """Laws: a deterministic NON-MONOTONE map y = |x - 20| gives
    near-zero Pearson but large dCor (dependence detected); a linear
    map gives dCor = 1 = |Pearson| exactly; an (anti-phase
    independent-ish) alternating pair stays well below the
    deterministic case."""
    from datetime import datetime, timedelta

    from pytrousse_spark.operators.timeseries import distance_correlation

    t0 = datetime(2024, 1, 1)

    def build(f):
        rows, eid = [], 0
        for i in range(40):
            x = float(i + 1)
            rows.append(
                (eid, t0 + timedelta(days=i, hours=1), "click", x)
            )
            eid += 1
            rows.append(
                (eid, t0 + timedelta(days=i, hours=2), "purchase", f(x))
            )
            eid += 1
        return spark.createDataFrame(
            rows, ["event_id", "ts", "event_type", "value"]
        )

    vee = distance_correlation(
        build(lambda x: abs(x - 20.0)),
        "ts", "value", "event_type", "click", "purchase",
    ).collect()[0]
    assert abs(vee["pearson_r"]) < 0.1
    assert vee["dcor"] > 0.4

    lin = distance_correlation(
        build(lambda x: 3.0 * x + 7.0),
        "ts", "value", "event_type", "click", "purchase",
    ).collect()[0]
    assert lin["pearson_r"] == 1.0
    assert lin["dcor"] == 1.0


def test_huber_trend_recovers_truth_ols_cannot(spark):
    """Laws: on a clean 3-cents/day trend with two gross outliers the
    per-iteration-rescaled IRLS converges to the TRUE (3.0, 997.0)
    while its own OLS columns are wrecked (slope < -200) — the same
    truth Theil-Sen (q251) finds; on outlier-free data Huber EQUALS
    OLS exactly (every weight is 1: delta >= all residuals... weights
    floor to 1e6 when |r| = 0 or min(1, d/|r|) = 1)."""
    from datetime import datetime, timedelta

    from pytrousse_spark.operators.timeseries import huber_trend

    t0 = datetime(2024, 1, 1)
    vals = [10.0 + 0.03 * i for i in range(40)]
    vals[10], vals[30] = 900.0, -500.0
    rows = [
        (i, t0 + timedelta(days=i, hours=1), float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "value"])
    out = huber_trend(df, "ts", "value").collect()[0]
    assert out["ols_slope"] < -200.0
    assert out["huber_slope"] == 3.0
    assert out["huber_intercept"] == 997.0

    clean = spark.createDataFrame(
        [
            (i, t0 + timedelta(days=i, hours=1), 10.0 + 0.03 * i)
            for i in range(40)
        ],
        ["event_id", "ts", "value"],
    )
    c = huber_trend(clean, "ts", "value").collect()[0]
    assert c["huber_slope"] == c["ols_slope"] == 3.0
    assert c["huber_intercept"] == c["ols_intercept"] == 997.0


def test_gumbel_block_maxima_pwm_laws(spark):
    """Laws: (1) location-equivariance — +C cents shifts mu and both
    return levels by exactly C, beta unchanged; (2) scale — doubling
    values doubles beta; (3) hand-computed PWM on a 3-block toy:
    maxima {10, 20, 40} cents -> b0 = 7000/3, b1 = (0*1000 + 1*2000
    + 2*4000)/(3*2), beta = (2*b1 - b0)/ln2; (4) n_blocks < 3 ->
    NULL fit."""
    import math
    from datetime import datetime, timedelta

    from pytrousse_spark.operators.timeseries import gumbel_block_maxima

    t0 = datetime(2024, 1, 1)

    def series(vals, scale=1.0, shift=0.0):
        rows = []
        for i, v in enumerate(vals):
            rows.append(
                (i, t0 + timedelta(days=i, hours=1), v * scale + shift)
            )
        return spark.createDataFrame(rows, ["event_id", "ts", "value"])

    # 21 days = 3 blocks with maxima 10, 20, 40 (peaks on day 1 of each)
    vals = [10.0, 1, 1, 1, 1, 1, 1, 20.0, 1, 1, 1, 1, 1, 1,
            40.0, 1, 1, 1, 1, 1, 1]
    base = gumbel_block_maxima(series(vals), "ts", "value").collect()[0]
    b0 = 7000.0 / 3
    b1 = (0 * 1000 + 1 * 2000 + 2 * 4000) / (3.0 * 2.0)
    beta = (2 * b1 - b0) / math.log(2.0)
    mu = b0 - 0.5772156649015329 * beta
    assert base["n_blocks"] == 3
    assert abs(base["beta"] - beta) < 1e-6
    assert abs(base["mu"] - mu) < 1e-6
    shifted = gumbel_block_maxima(
        series(vals, shift=100.0), "ts", "value"
    ).collect()[0]
    assert abs(shifted["beta"] - base["beta"]) < 1e-6
    assert abs(shifted["mu"] - base["mu"] - 10000.0) < 1e-6
    assert abs(shifted["rl_10"] - base["rl_10"] - 10000.0) < 1e-6
    doubled = gumbel_block_maxima(
        series(vals, scale=2.0), "ts", "value"
    ).collect()[0]
    assert abs(doubled["beta"] - 2 * base["beta"]) < 1e-6
    short = gumbel_block_maxima(
        series(vals[:14]), "ts", "value"
    ).collect()[0]
    assert short["n_blocks"] == 2 and short["mu"] is None


def test_rolling_time_window_strategy_router(spark):
    """r7 VERDICT item 2: strategy="window"|"bucketed"|"auto" must be
    bit-identical, and "auto" must route on the max-per-key density
    probe — window below the bound (plan has no Join), bucketed above
    it (plan joins the per-bucket offsets back to events)."""
    from pyspark.sql import functions as F

    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.timeseries import rolling_time_window
    from tests.conftest import SF_DIR

    ev = read_parquet_df(spark, f"{SF_DIR}/events.parquet")
    kw = dict(key_col="user_id", ts_col="ts", value_col="value",
              window="1 hour")
    plain = rolling_time_window(ev, strategy="window", **kw)
    buck = rolling_time_window(ev, strategy="bucketed", **kw)
    cols = ["event_id", "roll_n", "roll_avg"]
    j = plain.select(*cols).withColumnRenamed("roll_n", "pn").withColumnRenamed(
        "roll_avg", "pa"
    ).join(buck.select(*cols), "event_id")
    bad = j.where(
        ~F.col("pn").eqNullSafe(F.col("roll_n"))
        | ~F.col("pa").eqNullSafe(F.col("roll_avg"))
    ).count()
    assert bad == 0 and j.count() == ev.count()

    # routing rule: benign density -> window (no Join in the plan)
    auto_lo = rolling_time_window(ev, strategy="auto", **kw)
    assert "Join" not in auto_lo._jdf.queryExecution().optimizedPlan().toString()
    # force the bound below the densest key -> bucketed (offsets join)
    auto_hi = rolling_time_window(ev, strategy="auto",
                                  auto_max_key_rows=1, **kw)
    assert "Join" in auto_hi._jdf.queryExecution().optimizedPlan().toString()

    # the plain path honors the NULL-ts passthrough / NULL-key contract
    rows = [
        (None, "2024-01-01 00:00:00", 2.0),
        (None, "2024-01-01 00:30:00", 4.0),
        ("u", None, 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, value double")
    df = df.withColumn("ts", df["ts"].cast("timestamp"))
    out = {r["value"]: r for r in rolling_time_window(
        df, "k", "ts", "value", "1 hour", strategy="window"
    ).collect()}
    assert len(out) == 3
    assert out[9.0]["roll_n"] is None and out[9.0]["roll_avg"] is None
    assert out[4.0]["roll_n"] == 2 and out[4.0]["roll_avg"] == 3.0

    with __import__("pytest").raises(ValueError):
        rolling_time_window(ev, strategy="nope", **kw)


def test_distance_correlation_overflow_guard(spark):
    """r7 ADVICE: the exact n^2-scaled folds must refuse loudly (same
    failure in both engines) instead of Spark silently NULLing on
    DECIMAL(38,0) overflow — a short series of enormous daily values
    crosses 64*T^6*D^2 >= 1e38 and raises."""
    import pytest as _pt

    from pytrousse_spark.operators.timeseries import distance_correlation

    rows = []
    for d in range(1, 31):
        rows.append((f"2024-01-{d:02d} 00:00:00", "x", 1.0e15 + d))
        rows.append((f"2024-01-{d:02d} 00:00:00", "y", 2.0e15 - d))
    df = spark.createDataFrame(rows, "ts string, t string, v double")
    df = df.withColumn("ts", df["ts"].cast("timestamp"))
    with _pt.raises(ValueError, match="overflow DECIMAL"):
        distance_correlation(df, "ts", "v", "t", "x", "y")


def test_durbin_watson_brute_force_and_twin(spark):
    """DW matches an independent per-key lag computation on the cent
    grid (smooth series -> d near 0, i.i.d. -> d near 2); the tie-break
    column makes the lag deterministic; constant series go NULL;
    Spark == DuckDB twin."""
    import math
    import random

    import duckdb

    from pytrousse_spark.operators.timeseries import (
        durbin_watson,
        durbin_watson_sql,
    )

    random.seed(5)
    seq = [
        ("u1", i, round(math.sin(i / 3) * 10 + 20, 2)) for i in range(30)
    ] + [("u2", i, round(random.random() * 5, 2)) for i in range(20)]
    df = spark.createDataFrame(seq, "k string, t int, v double")
    r = durbin_watson(df, "k", "t", "v").collect()[0]

    by_key: dict = {}
    for k_, t, v in seq:
        by_key.setdefault(k_, []).append((t, round(v * 100)))
    num, vals = 0, []
    for vs in by_key.values():
        vs.sort()
        ys = [y for _, y in vs]
        vals += ys
        num += sum((ys[i] - ys[i - 1]) ** 2 for i in range(1, len(ys)))
    m = sum(vals) / len(vals)
    den = sum((y - m) ** 2 for y in vals)
    assert (r["n"], r["n_diffs"]) == (len(vals), len(vals) - 2)
    assert abs(r["dw"] - round(num / den, 6)) <= 1e-5
    # a smooth series dominates: strong positive autocorrelation
    assert r["dw"] < 1.0

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{k_}',{t},{v})" for k_, t, v in seq)
        + ") x(k, t, v)"
    )
    w = con.execute(durbin_watson_sql("t", "k", "t", "v")).fetchall()[0]
    assert tuple(r) == tuple(w)

    const = spark.createDataFrame(
        [("u", i, 3.0) for i in range(5)], "k string, t int, v double"
    )
    assert durbin_watson(const, "k", "t", "v").collect()[0]["dw"] is None

    # i.i.d. noise: DW concentrates near 2
    noisy = spark.createDataFrame(
        [("u", i, round(random.gauss(0, 1), 3)) for i in range(400)],
        "k string, t int, v double",
    )
    d2 = durbin_watson(noisy, "k", "t", "v").collect()[0]["dw"]
    assert 1.6 < d2 < 2.4
