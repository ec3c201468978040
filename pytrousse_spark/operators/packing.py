"""Sequence packing for LM pre-training (beyond-reference).

GPT-style concatenate-and-split: documents are laid end-to-end in a
deterministic order and cut into fixed token-budget sequences; a document
may span a sequence boundary. The operator records, per document, which
packed sequence it starts in and at which offset — the bookkeeping a
training-data pipeline needs to materialize packed batches.

Scale shape: a single global ordering would funnel the corpus through one
partition, so packing runs WITHIN deterministic hash shards (packing does
not require a global order, only a reproducible one). One window shuffle
keyed by shard; everything else is arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h60, h60_sql
from ..functions.text import tokens, tokens_sql


def pack_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget: int = 256,
    num_shards: int = 8,
) -> DataFrame:
    """(id, shard, n_tokens, seq_id, offset): document placement under
    concatenate-and-split packing with ``budget`` tokens per sequence.

    Within a shard (salted id hash % num_shards), documents concatenate in
    id order; ``seq_id`` is the sequence the document STARTS in and
    ``offset`` its position there — tokens past the boundary spill into the
    next sequence, exactly like LM pre-training packing. Empty documents
    are dropped (they occupy no tokens).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    staged = (
        df.select(F.col(id_col), F.col(text_col))
        .withColumn("n_tokens", F.size(tokens(F.col(text_col))).cast("long"))
        .where(F.col("n_tokens") > 0)
        .withColumn(
            "shard",
            (h60(F.concat(F.lit("pack|"), F.col(id_col).cast("string")))
             % num_shards).cast("int"),
        )
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    return staged.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(start / budget).cast("long").alias("seq_id"),
        (start % budget).cast("long").alias("offset"),
    )


def pack_documents_sql(
    table: str,
    text_col: str,
    id_col: str,
    budget: int = 256,
    num_shards: int = 8,
) -> str:
    """DuckDB twin of :func:`pack_documents` (same hash shards, same
    integer arithmetic — `//` since DuckDB CAST rounds)."""
    toks = tokens_sql(text_col)
    h = h60_sql(f"'pack|' || CAST({id_col} AS VARCHAR)")
    return f"""
    WITH staged AS (
      SELECT {id_col},
             CAST(len({toks}) AS BIGINT) AS n_tokens,
             CAST(({h} % {num_shards}) AS INT) AS shard
      FROM {table}
      WHERE len({toks}) > 0
    ), cum AS (
      SELECT *, sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY {id_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS start
      FROM staged
    )
    SELECT {id_col}, shard, n_tokens,
           CAST((start // {budget}) AS BIGINT) AS seq_id,
           CAST((start % {budget}) AS BIGINT) AS offset
    FROM cum
    """
