"""Survival analysis (beyond-reference; Kaplan & Meier 1958).

Time-to-event estimation with right censoring — the product-limit
estimator every retention/churn/time-to-convert analysis reaches for
when "users who haven't converted YET" must not bias the curve (naive
conversion-time averages drop censored subjects; KM uses them in the
risk set up to their censoring time).

Scale design: subjects reduce to one (duration, event_flag) row each
upstream (caller's per-user aggregation); this module then reduces to
the DURATION-LEVEL frame — one row per distinct duration — before any
window. The risk set is a reverse cumulative sum and the survival curve
a running product, both over that small frame (distinct durations are
bounded by the caller's time granularity — days/weeks — never by
subject count). The product rides the established exact-fold
convention: per-step ``ln(1 - d/n)`` terms are nano-unit-rounded to
BIGINT before the cumulative sum (order-free, cross-engine exact), and
the final ``exp`` is one IEEE op rounded 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier product-limit survival curve.

    One input row per subject: ``duration_col`` (numeric time-to-event
    or time-to-censoring) and ``event_col`` (1 = event observed,
    0 = right-censored). Rows with NULL duration or NULL flag are
    excluded. Returns one row per distinct duration carrying at least
    one OBSERVED event, ascending:

    ``(t, n_risk, n_events, n_censored, survival, na_cumhazard)``

    where ``n_risk`` counts subjects with duration >= t (the risk set —
    censored subjects participate until they drop out; that is the
    whole point of the estimator), ``n_censored`` counts censorings AT
    t, ``survival = prod_{t_j <= t} (1 - d_j / n_j)`` rounded 6, and
    ``na_cumhazard`` is the NELSON-AALEN cumulative hazard
    ``sum_{t_j <= t} d_j / n_j`` (the companion estimator — for small
    per-step hazards ``survival ~ exp(-na_cumhazard)``), folded in
    nano-units like the survival product.

    Laws (tests/test_survival.py): no censoring => survival equals the
    empirical tail fraction ``(n - cum_events) / n``; all-censored =>
    empty output; survival is non-increasing and in [0, 1); hand
    example matches the textbook computation.
    """
    d = F.col(duration_col)
    e = F.col(event_col)
    nn = df.where(d.isNotNull() & e.isNotNull())
    lvl = nn.groupBy(d.cast("double").alias("t")).agg(
        F.sum(e.cast("int")).cast("bigint").alias("n_events"),
        F.sum(1 - e.cast("int")).cast("bigint").alias("n_censored"),
    )
    # risk set: reverse cumulative subjects (events + censorings at or
    # above t) — a window over the duration-LEVEL frame, never subjects
    w_desc = (
        Window.orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = lvl.withColumn(
        "n_risk",
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_desc),
    )
    ev = risk.where(F.col("n_events") > 0)
    term = F.round(
        F.log(
            F.lit(1.0)
            - F.col("n_events").cast("double") / F.col("n_risk").cast("double")
        )
        * F.lit(1e9),
        0,
    ).cast("bigint")
    w_asc = (
        Window.orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # d == n (everyone at risk dies at t): ln(0) = -inf; the curve hits
    # exactly 0 from there on — use a NULL term and carry a hit-zero flag
    hit_zero = F.col("n_events") == F.col("n_risk")
    haz_term = F.round(
        F.col("n_events").cast("double")
        / F.col("n_risk").cast("double")
        * F.lit(1e9),
        0,
    ).cast("bigint")
    staged = ev.withColumn(
        "__term", F.when(~hit_zero, term)
    ).withColumn("__zero", hit_zero.cast("int")).withColumn(
        "__hterm", haz_term
    )
    out = staged.withColumn(
        "__lsum", F.coalesce(F.sum("__term").over(w_asc), F.lit(0))
    ).withColumn("__anyzero", F.sum("__zero").over(w_asc)).withColumn(
        "__hsum", F.sum("__hterm").over(w_asc)
    )
    surv = F.when(F.col("__anyzero") > 0, F.lit(0.0)).otherwise(
        F.round(F.exp(F.col("__lsum").cast("double") / F.lit(1e9)), 6)
    )
    return (
        out.select(
            "t",
            "n_risk",
            "n_events",
            "n_censored",
            surv.alias("survival"),
            F.round(F.col("__hsum").cast("double") / F.lit(1e9), 6)
            .alias("na_cumhazard"),
        )
        .orderBy("t")
    )


def kaplan_meier_sql(
    table_expr: str, duration_col: str, event_col: str
) -> str:
    """DuckDB twin of :func:`kaplan_meier` — identical duration-level
    reduction, reverse-cumulative risk set, nano-rounded log terms, and
    hit-zero carry."""
    return f"""
    WITH nn AS (
        SELECT CAST({duration_col} AS DOUBLE) AS t,
               CAST({event_col} AS INT) AS e
        FROM ({table_expr})
        WHERE {duration_col} IS NOT NULL AND {event_col} IS NOT NULL
    ), lvl AS (
        SELECT t, CAST(sum(e) AS BIGINT) AS n_events,
               CAST(sum(1 - e) AS BIGINT) AS n_censored
        FROM nn GROUP BY t
    ), risk AS (
        SELECT *,
               CAST(sum(n_events + n_censored) OVER (
                   ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_risk
        FROM lvl
    ), ev AS (
        SELECT *,
               CASE WHEN n_events < n_risk THEN
                 CAST(round(ln(1.0 - CAST(n_events AS DOUBLE)
                                    / CAST(n_risk AS DOUBLE)) * 1e9, 0)
                      AS BIGINT)
               END AS __term,
               CASE WHEN n_events = n_risk THEN 1 ELSE 0 END AS __zero,
               CAST(round(CAST(n_events AS DOUBLE)
                          / CAST(n_risk AS DOUBLE) * 1e9, 0)
                    AS BIGINT) AS __hterm
        FROM risk WHERE n_events > 0
    ), cum AS (
        SELECT *,
               CAST(coalesce(sum(__term) OVER (
                   ORDER BY t ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 0) AS BIGINT) AS __lsum,
               CAST(sum(__zero) OVER (
                   ORDER BY t ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS __anyzero,
               CAST(sum(__hterm) OVER (
                   ORDER BY t ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS __hsum
        FROM ev
    )
    SELECT t, n_risk, n_events, n_censored,
           CASE WHEN __anyzero > 0 THEN 0.0
                ELSE round(exp(CAST(__lsum AS DOUBLE) / 1e9), 6)
           END AS survival,
           round(CAST(__hsum AS DOUBLE) / 1e9, 6) AS na_cumhazard
    FROM cum ORDER BY t
    """
