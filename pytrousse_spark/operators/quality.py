"""Declarative data-quality expectations: a rule set checked in ONE pass.

The reference's repair/census machinery (row_fix.py, error census —
ported in operators/repair.py) checks hard-coded conditions; this is its
declarative generalization, the Great-Expectations-style contract every
ingestion pipeline runs before training data is trusted (public pattern:
Great Expectations, Deequ — Schelter et al., VLDB 2018).

Scale design: ALL rules evaluate in one aggregation over one scan —
each rule contributes sum(CASE WHEN violated) map-side partials, plus
(for uniqueness rules) one count-distinct. The per-rule result frame is
built by unpivoting the single aggregate row, so rule count never adds
scans. No collects, no joins, no shuffles beyond the one-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expect(
    df: DataFrame,
    rules: dict[str, str],
    unique: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Evaluate named expectations in one pass.

    ``rules`` maps rule name → a boolean SQL expression that must hold
    for every row (NULL counts as a violation — an expectation that
    cannot be evaluated is not met, matching SQL CHECK semantics under
    ``NOT ... IS TRUE``). ``unique`` maps rule name → column list that
    must be row-unique (violations = n_rows - n_distinct).

    Returns one row per rule: ``(rule, n_rows, n_violations,
    violation_rate, passed)`` — rate rounded to 6, ``passed`` =
    zero violations. Deterministic (rule order is the dict order).
    """
    if not rules and not unique:
        raise ValueError("at least one rule required")
    unique = unique or {}
    overlap = set(rules) & set(unique)
    if overlap:
        raise ValueError(f"duplicate rule names: {sorted(overlap)}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, cond in enumerate(rules.values()):
        aggs.append(
            F.sum(
                F.when(F.expr(cond), F.lit(0)).otherwise(F.lit(1))
            ).alias(f"__v{i}")
        )
    for i, cols in enumerate(unique.values()):
        aggs.append(
            F.countDistinct(*[F.col(c) for c in cols]).alias(f"__d{i}")
        )
    # ONE row; checkpointed because every unpivot arm below consumes it —
    # without the barrier each rule re-runs the whole aggregation scan
    one = df.agg(*aggs).localCheckpoint(eager=False)
    pieces = []
    for i, name in enumerate(rules):
        pieces.append(
            one.select(
                F.lit(name).alias("rule"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v{i}").cast("bigint").alias("n_violations"),
            )
        )
    for i, name in enumerate(unique):
        pieces.append(
            one.select(
                F.lit(name).alias("rule"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__d{i}"))
                .cast("bigint")
                .alias("n_violations"),
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule",
        "n_rows",
        "n_violations",
        F.when(
            F.col("n_rows") > 0,
            F.round(F.col("n_violations") / F.col("n_rows"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("violation_rate"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def expect_sql(
    table_expr: str,
    rules: dict[str, str],
    unique: dict[str, list[str]] | None = None,
) -> str:
    """DuckDB twin of :func:`expect` — one aggregate row, unpivoted by
    UNION ALL, identical NULL-counts-as-violation semantics."""
    unique = unique or {}
    sel = ["CAST(count(*) AS BIGINT) AS __n"]
    for i, cond in enumerate(rules.values()):
        sel.append(
            f"CAST(sum(CASE WHEN {cond} THEN 0 ELSE 1 END) AS BIGINT)"
            f" AS __v{i}"
        )
    for i, cols in enumerate(unique.values()):
        # CASE-wrapped so NULL-keyed rows are excluded from the distinct
        # count, matching Spark's count(DISTINCT a, b) semantics
        notnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
        cols_sql = ", ".join(cols)
        sel.append(
            f"CAST(count(DISTINCT CASE WHEN {notnull}"
            f" THEN ROW({cols_sql}) END) AS BIGINT) AS __d{i}"
        )
    arms = []
    for i, name in enumerate(rules):
        arms.append(
            f"SELECT '{name}' AS rule, __n AS n_rows,"
            f" __v{i} AS n_violations FROM one"
        )
    for i, name in enumerate(unique):
        arms.append(
            f"SELECT '{name}' AS rule, __n AS n_rows,"
            f" CAST(__n - __d{i} AS BIGINT) AS n_violations FROM one"
        )
    body = "\n        UNION ALL ".join(arms)
    return f"""
    WITH one AS MATERIALIZED (
        SELECT {", ".join(sel)} FROM ({table_expr})
    ), rows_ AS (
        {body}
    )
    SELECT rule, n_rows, n_violations,
           CASE WHEN n_rows > 0
                THEN round(n_violations / n_rows, 6) ELSE 0.0 END
               AS violation_rate,
           n_violations = 0 AS passed
    FROM rows_
    """
