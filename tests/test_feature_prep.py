"""Law tests for the feature-prep family (operators/feature_prep.py):
LOO target encoding, WoE/IV, lift-gains, EB shrinkage."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pytrousse_spark.operators.feature_prep import (
    eb_rate_shrinkage,
    lift_gains,
    loo_target_encoding,
    woe_iv,
)


def test_loo_hand_example_and_null_contracts(spark):
    rows = [
        (1, "a", 1),
        (2, "a", 0),
        (3, "a", 1),
        (4, "b", 1),
        (5, None, 0),
        (6, None, 0),
    ]
    df = spark.createDataFrame(rows, ["k", "c", "y"])
    got = {
        r["key"]: r
        for r in loo_target_encoding(df, "k", "c", F.col("y")).collect()
    }
    assert len(got) == 6
    # row 1: other a-rows are (0, 1) -> 0.5
    assert got[1]["loo"] == 0.5
    assert got[2]["loo"] == 1.0
    # singleton category -> NULL, never a silent global fallback
    assert got[4]["loo"] is None
    # NULL category is a real category (null-safe join), not dropped
    assert got[5]["loo"] == 0.0 and got[6]["loo"] == 0.0


def test_loo_mean_identity(spark):
    # reconstruct the plain category mean from (loo, y):
    # loo_i * (n-1) + y_i == sum_cat(y) for every row
    rows = [(i, "c%d" % (i % 3), i % 2) for i in range(30)]
    df = spark.createDataFrame(rows, ["k", "c", "y"])
    out = loo_target_encoding(df, "k", "c", F.col("y")).collect()
    by_cat = {}
    for r in out:
        by_cat.setdefault(r["category"], []).append(r)
    for cat, rs in by_cat.items():
        n = len(rs)
        sy = sum(r["y"] for r in rs)
        for r in rs:
            # loo is round-6, so the identity holds to ~5e-7 * (n-1)
            assert abs(r["loo"] * (n - 1) + r["y"] - sy) < 1e-4


def test_woe_laws(spark):
    rows = (
        [("hi", 1)] * 30 + [("hi", 0)] * 10
        + [("lo", 1)] * 10 + [("lo", 0)] * 30
        + [("flat", 1)] * 20 + [("flat", 0)] * 20
        + [("pure", 1)] * 5  # zero bad cell
    )
    df = spark.createDataFrame(rows, ["c", "y"])
    got = {r["category"]: r for r in woe_iv(df, "c", F.col("y")).collect()}
    # sign: hi/lo are mirrored 3:1 odds; their woes sum to
    # 2*ln(B/G) (antisymmetry shifted by the global imbalance)
    assert got["hi"]["woe"] > 0 > got["lo"]["woe"]
    g_all = sum(r["good"] for r in got.values())
    b_all = sum(r["bad"] for r in got.values())
    assert abs(
        got["hi"]["woe"] + got["lo"]["woe"]
        - 2 * math.log(b_all / g_all)
    ) < 1e-5
    # a balanced category's woe is not 0 but ln(B/G) — woe compares
    # to the GLOBAL good/bad ratio
    ref = math.log((20 * b_all) / (20 * g_all))
    assert abs(got["flat"]["woe"] - ref) < 1e-6
    # zero cell -> NULL woe, excluded from IV
    assert got["pure"]["woe"] is None
    # IV identical on every row and strictly positive
    ivs = {r["iv"] for r in got.values()}
    assert len(ivs) == 1 and ivs.pop() > 0


def test_woe_iv_zero_when_independent(spark):
    # identical class balance in every category -> every woe equals
    # ln(1) = 0 and IV = 0
    rows = [(c, y) for c in ("a", "b") for y in (0, 1) for _ in range(7)]
    df = spark.createDataFrame(rows, ["c", "y"])
    for r in woe_iv(df, "c", F.col("y")).collect():
        assert r["woe"] == 0.0 and r["iv"] == 0.0


def test_lift_gains_conservation_laws(spark):
    # score correlates with target: top band must have lift > 1
    rows = [(float(i), 1 if i > 70 else (1 if i % 10 == 0 else 0))
            for i in range(100)]
    df = spark.createDataFrame(rows, ["score", "y"])
    out = lift_gains(df, "score", F.col("y"), 10).collect()
    assert len(out) == 10
    assert [r["band"] for r in out] == list(range(9, -1, -1))
    n_tot = sum(r["n"] for r in out)
    p_tot = sum(r["positives"] for r in out)
    assert n_tot == 100
    # cumulative gain reaches exactly 1 at the last (lowest) band
    assert out[-1]["cum_gain"] == 1.0
    # gains are nondecreasing top-down
    gains = [r["cum_gain"] for r in out]
    assert all(b >= a for a, b in zip(gains, gains[1:]))
    # lift identity: sum_band n*lift == n_total (weighted mean lift 1)
    w = sum(r["n"] * r["lift"] for r in out)
    assert abs(w - n_tot) < 1e-3
    # top band is enriched
    assert out[0]["lift"] > 1.5
    assert p_tot == sum(1 for _, y in rows if y)


def test_eb_shrinkage_moves_small_samples_most(spark):
    # many mid-rate keys define the prior; one 1/1 key and one
    # 100-trial key at the same raw rate shrink very differently
    rows = []
    for k in range(40):
        t = 20
        s = 6 + (k % 9)  # rates spread around 0.5 -> positive variance
        rows += [(f"u{k}", 1, 1)] * s + [(f"u{k}", 1, 0)] * (t - s)
    rows += [("tiny", 1, 1)]  # raw rate 1.0 from one trial
    rows += [("big", 1, 1)] * 90 + [("big", 1, 0)] * 10  # 0.9 from 100
    df = spark.createDataFrame(rows, ["k", "t", "s"])
    got = {
        r["key"]: r
        for r in eb_rate_shrinkage(
            df, "k", F.col("t"), F.col("s")
        ).collect()
    }
    tiny, big = got["tiny"], got["big"]
    assert tiny["raw_rate"] == 1.0 and big["raw_rate"] == 0.9
    # both shrink toward the ~0.5 prior mean, tiny much harder
    assert tiny["shrunk_rate"] < 0.9
    assert big["shrunk_rate"] > 0.8
    assert (tiny["raw_rate"] - tiny["shrunk_rate"]) > (
        big["raw_rate"] - big["shrunk_rate"]
    )
    # shrunk rates stay inside (0, 1)
    assert all(
        r["shrunk_rate"] is None or 0.0 < r["shrunk_rate"] < 1.0
        for r in got.values()
    )


def test_eb_shrinkage_degenerate_prior_is_null(spark):
    # every key has the identical rate -> zero across-key variance ->
    # no moment solution -> NULL shrunk rates, stated not clamped
    rows = [(f"u{k}", 1, s) for k in range(10) for s in (0, 1)]
    df = spark.createDataFrame(rows, ["k", "t", "s"])
    out = eb_rate_shrinkage(df, "k", F.col("t"), F.col("s")).collect()
    assert len(out) == 10
    assert all(r["shrunk_rate"] is None for r in out)
    assert all(r["raw_rate"] == 0.5 for r in out)


def test_uplift_qini_planted_uplift_gradient(spark):
    """Planted uplift concentrated in high scores: treated response
    rises with score, control flat -> top band uplift > bottom band;
    Qini at the last (cumulative-total) row equals
    total_pos_t - total_pos_c * Nt/Nc; conservation of counts."""
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.feature_prep import uplift_by_band

    rows = []
    for i in range(4000):
        score = (i % 100) / 100.0
        t = 1 if (i * 31) % 2 == 0 else 0
        # control converts at 10%; treated at 10% + 60% * score
        r = ((i * 7919) % 100) / 100.0
        y = 1 if r < (0.1 + (0.6 * score if t else 0.0)) else 0
        rows.append((score, t, y))
    df = spark.createDataFrame(rows, ["score", "t", "y"])
    out = uplift_by_band(
        df, "score", F.col("t"), F.col("y"), n_bands=5
    ).collect()
    assert len(out) == 5
    by_band = {r["band"]: r for r in out}
    assert by_band[4]["uplift"] > by_band[0]["uplift"] + 0.2
    tot_pt = sum(r["pos_treat"] for r in out)
    tot_pc = sum(r["pos_ctrl"] for r in out)
    tot_nt = sum(r["n_treat"] for r in out)
    tot_nc = sum(r["n_ctrl"] for r in out)
    assert tot_nt + tot_nc == 4000
    last = min(out, key=lambda r: r["band"])  # cumulative over all
    expected_qini = tot_pt - tot_pc * tot_nt / tot_nc
    assert abs(last["qini"] - expected_qini) < 1e-3
