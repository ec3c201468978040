"""Anonymization pipeline (SURVEY.md §2.8, N1-N4; anonymize_database.py parity).

Row-identity hashing with a private/public table split:
- the private table holds the deduplicated private columns + ``ID_OWNER``;
- the public (anonymized) table has private columns replaced by ``ID_OWNER``.

Nonce scheme (documented deviation, SURVEY.md §2.8 N2): the reference wraps
the row string in nonces from Python's seeded global ``random``
(anonymize_database.py:14-40, 181) — an RNG-sequence dependency that cannot
reproduce on distributed executors. Here nonces are *derived deterministically
per row* from a salt parameter:

    pre  = substr(sha256('pre'  || salt || row_string), 1, 12)
    suf  = substr(sha256('suf'  || salt || row_string), 1, 12)
    ID_OWNER = sha256(pre || row_string || suf)

Same structure (12-hex nonce prefix/suffix around the concatenated private
values, SHA-256 digest), fully portable, and verifiable by an ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dataset import Dataset
from ..operations import OpRecord

#: anonymize_database.py:135 — NaN in private cols filled before hashing.
PRIVATE_NA_FILLER = "----"


def _row_string(private_cols: list[str]) -> Column:
    """Element-wise concat of private columns (anonymize_database.py:67-69's
    ``np.sum`` over object arrays = separator-less string concat)."""
    return F.concat(
        *[F.coalesce(F.col(c).cast("string"), F.lit(PRIVATE_NA_FILLER)) for c in private_cols]
    )


def id_owner_expr(private_cols: list[str], salt: str) -> Column:
    """N1+N2: nonce-wrapped SHA-256 identity (anonymize_database.py:14-82)."""
    row = _row_string(private_cols)
    pre = F.substring(F.sha2(F.concat(F.lit(f"pre{salt}"), row), 256), 1, 12)
    suf = F.substring(F.sha2(F.concat(F.lit(f"suf{salt}"), row), 256), 1, 12)
    return F.sha2(F.concat(pre, row, suf), 256)


def id_owner_sql(private_cols: list[str], salt: str) -> str:
    """DuckDB twin of :func:`id_owner_expr` (oracle parity)."""
    parts = " || ".join(
        f"coalesce(CAST({c} AS VARCHAR), '{PRIVATE_NA_FILLER}')" for c in private_cols
    )
    row = f"({parts})"
    pre = f"substr(sha256('pre{salt}' || {row}), 1, 12)"
    suf = f"substr(sha256('suf{salt}' || {row}), 1, 12)"
    return f"sha256({pre} || {row} || {suf})"


def create_private_info_df(
    df: DataFrame, private_cols: list[str], salt: str = "pytrousse"
) -> DataFrame:
    """N3 (anonymize_database.py:85-124): project private cols → dedup →
    attach ID_OWNER. Output is small relative to the fact table (distinct
    identities) — the broadcast side of the join in :func:`anonymize_data`."""
    return (
        df.select(*private_cols)
        .na.fill(PRIVATE_NA_FILLER, subset=private_cols)
        .dropDuplicates(private_cols)
        .withColumn("ID_OWNER", id_owner_expr(private_cols, salt))
    )


def anonymize_data(
    dataset: Dataset,
    private_cols_to_remove: list[str],
    private_cols_to_map: list[str],
    salt: str = "pytrousse",
) -> tuple[Dataset, DataFrame]:
    """N4 (anonymize_database.py:127-206): returns (anonymized dataset,
    private-info DataFrame).

    Plan shape: ID_OWNER is a pure expression over the fact table (no join
    needed to attach it — unlike the reference's merge-back,
    anonymize_database.py:191, which Spark would have to shuffle); the
    private table is an independent small aggregate of the same scan.
    """
    df = dataset.df.na.fill(PRIVATE_NA_FILLER, subset=private_cols_to_map)
    private_df = create_private_info_df(df, private_cols_to_map, salt)
    anonym = df.withColumn(
        "ID_OWNER", id_owner_expr(private_cols_to_map, salt)
    ).drop(*private_cols_to_remove)
    out = dataset.evolve(
        df=anonym,
        record=OpRecord(
            name="anonymize_data",
            columns=tuple(private_cols_to_map),
            derived_columns=("ID_OWNER",),
            details={
                "removed": list(private_cols_to_remove),
                "salt": salt,
            },
        ),
        new_derived=("ID_OWNER",),
    )
    return out, private_df


def k_anonymity_census(
    df: DataFrame, quasi_cols: list[str], thresholds: list[int]
) -> DataFrame:
    """Re-identification risk census over a quasi-identifier set — the
    release-side complement of the reference's identity hashing
    (anonymize_database.py's split removes direct identifiers; this
    measures how identifying the REMAINING columns are, per Sweeney's
    k-anonymity: a table is k-anonymous iff every quasi-identifier
    combination occurs >= k times).

    Returns one row per threshold ``k`` (ascending):
    ``(k, groups_below, rows_below, rows_share, anonymity_level,
    n_groups, n_rows)`` where ``groups_below``/``rows_below`` count the
    equivalence classes (and their member rows) of size < k,
    ``rows_share`` = rows_below / n_rows rounded 6, and
    ``anonymity_level`` = the minimum class size (the k the table
    actually satisfies), repeated per row.

    Exactness: everything is BIGINT counts except ``rows_share``, a
    single division of two exact BIGINTs rounded 6 — deterministic
    cross-engine.

    Scale: one hash agg on the quasi-identifier key (map-side combine)
    reduces the table to its equivalence classes; the census is then ONE
    conditional aggregate over the class-size frame unpivoted via
    ``stack`` — no per-threshold rescan, no crossjoin against the class
    frame. NULL quasi-identifier values form their own class (SQL
    group-by semantics in both engines).
    """
    if not thresholds:
        raise ValueError("k_anonymity_census: thresholds must be non-empty")
    ks = sorted(set(int(k) for k in thresholds))
    if ks[0] < 2:
        raise ValueError("k_anonymity_census: thresholds must be >= 2")
    g = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__c"))
    aggs = [
        F.min("__c").cast("bigint").alias("__lvl"),
        F.count(F.lit(1)).cast("bigint").alias("__ng"),
        F.sum("__c").cast("bigint").alias("__nr"),
    ]
    for i, k in enumerate(ks):
        aggs.append(
            F.count(F.when(F.col("__c") < k, 1)).cast("bigint").alias(f"__g{i}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("__c") < k, F.col("__c"))), F.lit(0)
            ).cast("bigint").alias(f"__r{i}")
        )
    one = g.agg(*aggs)
    stack_args = ", ".join(
        f"{k}, __g{i}, __r{i}" for i, k in enumerate(ks)
    )
    return (
        one.selectExpr(
            f"stack({len(ks)}, {stack_args}) AS (k, groups_below, rows_below)",
            "__lvl", "__ng", "__nr",
        )
        .select(
            F.col("k").cast("int").alias("k"),
            "groups_below",
            "rows_below",
            F.round(F.col("rows_below") / F.col("__nr"), 6).alias("rows_share"),
            F.col("__lvl").alias("anonymity_level"),
            F.col("__ng").alias("n_groups"),
            F.col("__nr").alias("n_rows"),
        )
        .orderBy("k")
    )


def k_anonymity_census_sql(
    table_expr: str, quasi_cols: list[str], thresholds: list[int]
) -> str:
    """DuckDB twin of :func:`k_anonymity_census` — identical class
    reduction, conditional aggregate, and UNION-ALL unpivot over the
    materialized one-row census."""
    ks = sorted(set(int(k) for k in thresholds))
    qi = ", ".join(quasi_cols)
    cond = ",\n               ".join(
        f"CAST(count(*) FILTER (WHERE __c < {k}) AS BIGINT) AS __g{i},\n"
        f"               CAST(COALESCE(sum(__c) FILTER (WHERE __c < {k}), 0)"
        f" AS BIGINT) AS __r{i}"
        for i, k in enumerate(ks)
    )
    arms = "\n        UNION ALL ".join(
        f"SELECT {k} AS k, __g{i} AS groups_below, __r{i} AS rows_below,"
        f" __lvl, __ng, __nr FROM one"
        for i, k in enumerate(ks)
    )
    return f"""
    WITH g AS (
        SELECT count(*) AS __c FROM ({table_expr}) GROUP BY {qi}
    ), one AS MATERIALIZED (
        SELECT CAST(min(__c) AS BIGINT) AS __lvl,
               CAST(count(*) AS BIGINT) AS __ng,
               CAST(sum(__c) AS BIGINT) AS __nr,
               {cond}
        FROM g
    ), arms AS (
        {arms}
    )
    SELECT CAST(k AS INT) AS k, groups_below, rows_below,
           round(rows_below / CAST(__nr AS DOUBLE), 6) AS rows_share,
           __lvl AS anonymity_level, __ng AS n_groups, __nr AS n_rows
    FROM arms ORDER BY k
    """


def enforce_k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Suppression enforcement: drop every row whose quasi-identifier
    equivalence class has fewer than ``k`` members, so the surviving
    table IS k-anonymous (the fix :func:`k_anonymity_census` measures;
    the census of the result reports rows_below = 0 at ``k`` — pinned in
    tests/test_anonymize.py).

    Scale: class sizes reduce map-side to one row per class; the fact
    table then SEMI-joins the >= k classes on the same key — at 100 TB
    the class frame is the small side (broadcast or co-partitioned),
    the fact table shuffles at most once on the QI key, and AQE
    broadcasts when the class frame fits.

    NULL quasi-identifier values form their own equivalence class —
    exactly as :func:`k_anonymity_census` counts them — so a NULL class
    with >= k members SURVIVES. The semi join therefore uses null-safe
    equality (``<=>``) per QI column; Spark plans ``<=>`` as an ordinary
    hash-join key, so the scale shape is unchanged.
    """
    if k < 2:
        raise ValueError("enforce_k_anonymity: k must be >= 2")
    big = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__c"))
    keep = big.where(F.col("__c") >= k).select(
        *[F.col(c).alias(f"__q_{c}") for c in quasi_cols]
    )
    cond = None
    for c in quasi_cols:
        term = df[c].eqNullSafe(F.col(f"__q_{c}"))
        cond = term if cond is None else (cond & term)
    return df.join(keep, cond, "semi")


def l_diversity_census(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    thresholds: list[int],
) -> DataFrame:
    """Distinct l-diversity census (Machanavajjhala 2006): k-anonymity
    alone fails when an equivalence class is large but every member
    shares the SAME sensitive value (the homogeneity attack — class
    size 50, all '<disease X>' re-identifies perfectly). A class is
    distinct-l-diverse iff it contains >= l distinct sensitive values.

    Returns one row per threshold ``l`` (ascending):
    ``(l, groups_below, rows_below, rows_share, diversity_level,
    n_groups, n_rows)`` — the same shape as
    :func:`k_anonymity_census` with class size replaced by the class's
    distinct-sensitive-value count, so the two censuses read side by
    side. NULL sensitive values count as one distinct value (SQL
    count-distinct semantics drop NULLs; a class of only-NULLs has
    diversity 0 in both engines).

    Scale: one two-level distinct agg on (QI, sensitive) — map-side
    dedup then per-class counts — followed by the same ONE conditional
    aggregate + stack unpivot; no per-threshold rescan.
    """
    if not thresholds:
        raise ValueError("l_diversity_census: thresholds must be non-empty")
    ls = sorted(set(int(x) for x in thresholds))
    if ls[0] < 2:
        raise ValueError("l_diversity_census: thresholds must be >= 2")
    g = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__c"),
        F.countDistinct(sensitive_col).alias("__d"),
    )
    aggs = [
        F.min("__d").cast("bigint").alias("__lvl"),
        F.count(F.lit(1)).cast("bigint").alias("__ng"),
        F.sum("__c").cast("bigint").alias("__nr"),
    ]
    for i, l in enumerate(ls):
        aggs.append(
            F.count(F.when(F.col("__d") < l, 1)).cast("bigint").alias(f"__g{i}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("__d") < l, F.col("__c"))), F.lit(0)
            ).cast("bigint").alias(f"__r{i}")
        )
    one = g.agg(*aggs)
    stack_args = ", ".join(f"{l}, __g{i}, __r{i}" for i, l in enumerate(ls))
    return (
        one.selectExpr(
            f"stack({len(ls)}, {stack_args}) AS (l, groups_below, rows_below)",
            "__lvl", "__ng", "__nr",
        )
        .select(
            F.col("l").cast("int").alias("l"),
            "groups_below",
            "rows_below",
            F.round(F.col("rows_below") / F.col("__nr"), 6).alias("rows_share"),
            F.col("__lvl").alias("diversity_level"),
            F.col("__ng").alias("n_groups"),
            F.col("__nr").alias("n_rows"),
        )
        .orderBy("l")
    )


def l_diversity_census_sql(
    table_expr: str,
    quasi_cols: list[str],
    sensitive_col: str,
    thresholds: list[int],
) -> str:
    """DuckDB twin of :func:`l_diversity_census`."""
    ls = sorted(set(int(x) for x in thresholds))
    qi = ", ".join(quasi_cols)
    cond = ",\n               ".join(
        f"CAST(count(*) FILTER (WHERE __d < {l}) AS BIGINT) AS __g{i},\n"
        f"               CAST(COALESCE(sum(__c) FILTER (WHERE __d < {l}), 0)"
        f" AS BIGINT) AS __r{i}"
        for i, l in enumerate(ls)
    )
    arms = "\n        UNION ALL ".join(
        f"SELECT {l} AS l, __g{i} AS groups_below, __r{i} AS rows_below,"
        f" __lvl, __ng, __nr FROM one"
        for i, l in enumerate(ls)
    )
    return f"""
    WITH g AS (
        SELECT count(*) AS __c, count(DISTINCT {sensitive_col}) AS __d
        FROM ({table_expr}) GROUP BY {qi}
    ), one AS MATERIALIZED (
        SELECT CAST(min(__d) AS BIGINT) AS __lvl,
               CAST(count(*) AS BIGINT) AS __ng,
               CAST(sum(__c) AS BIGINT) AS __nr,
               {cond}
        FROM g
    ), arms AS (
        {arms}
    )
    SELECT CAST(l AS INT) AS l, groups_below, rows_below,
           round(rows_below / CAST(__nr AS DOUBLE), 6) AS rows_share,
           __lvl AS diversity_level, __ng AS n_groups, __nr AS n_rows
    FROM arms ORDER BY l
    """
