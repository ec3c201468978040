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
