"""Composed training-corpus preparation (beyond-reference).

The end-to-end cleaning flow an LLM-data pipeline runs before training —
language/quality/length gating → exact content dedup (min-id survivor per
fingerprint) → verified near-dedup — composed from the existing operators
into one pipeline with a DuckDB twin for the correctness gate. Every stage
is expression-compiled; the only shuffles are the fingerprint aggregation
and the LSH (band_key, id) exchange, both keyed small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx
from . import dedup as dd


def gate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_quality: float = 0.9,
    min_tokens: int = 12,
    max_tokens: int = 5000,
    shingle_n: int = 3,
) -> DataFrame:
    """The language/quality/length gate stage alone: rows passing all three
    filters, with (n_tokens, lang_guess, quality, __fp) attached. Pure
    stateless expressions — works identically on a BATCH frame and on a
    STRUCTURED STREAM (it is the ingestion-time filter in front of a
    streaming sink; the dedup stages below are batch-only because they
    aggregate across documents). Staging per functions/text.py HOF rules."""
    if not df.isStreaming:
        # md5 fingerprint per row; no-op at real scale or on a stream
        from ..io import rebalance_undersplit

        df = rebalance_undersplit(df)
    t = F.col(text_col)
    toks = F.col("__tk")
    staged = (
        df.select(id_col, text_col)
        .withColumn("__tk", tx.tokens(t))
        .withColumn("__sh", tx.shingles_from_tokens(toks, shingle_n))
        .withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn("lang_guess", tx.lang_id_from_tokens(toks))
        .withColumn("quality", tx.quality_score_from_tokens(t, toks))
        .withColumn("__fp", tx.fingerprint_from_shingles(F.col("__sh")))
    )
    return staged.where(
        (F.col("lang_guess") == lang)
        & (F.col("quality") >= min_quality)
        & F.col("n_tokens").between(min_tokens, max_tokens)
    ).select(id_col, text_col, "n_tokens", "quality", "__fp")


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_quality: float = 0.9,
    min_tokens: int = 12,
    max_tokens: int = 5000,
    shingle_n: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    threshold: float = 0.2,
    hash_fn: str = "md5",
) -> DataFrame:
    """Cleaned corpus: rows passing the language/quality/length gates, with
    exact duplicates (identical content fingerprint) and verified near
    duplicates removed, min-id survivor in both dedup stages.

    ``min_tokens`` must be >= ``shingle_n`` so every surviving document has
    a non-NULL fingerprint (a NULL fingerprint would collapse all short
    docs into one dedup group).

    Output: (id_col, n_tokens, quality) for the surviving rows.
    """
    if min_tokens < shingle_n:
        raise ValueError("min_tokens must be >= shingle_n")
    kept = gate_documents(
        df, text_col, id_col,
        lang=lang, min_quality=min_quality,
        min_tokens=min_tokens, max_tokens=max_tokens, shingle_n=shingle_n,
    )
    exact = dd.exact_dedup(kept, ["__fp"], id_col)
    # The near-dedup stage consumes `exact` three times (signatures,
    # shingle sets, survivor anti-join) with different column prunings, so
    # the exchanges are not canonically equal and AQE cannot reuse them —
    # without persistence the full gate+dedup aggregation would execute
    # three times. Spill-safe persist, released below: the survivors are
    # eagerly materialized via localCheckpoint (they are the filtered,
    # deduped corpus — far smaller than the input) so the cached
    # exact-dedup partitions can be unpersisted before returning, and
    # repeated clean_corpus calls in one long session do not accumulate
    # cached partitions.
    from pyspark import StorageLevel

    exact = exact.persist(StorageLevel.MEMORY_AND_DISK)
    survivors = dd.near_dedup(
        exact,
        text_col,
        id_col,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        threshold=threshold,
        hash_fn=hash_fn,
    )
    out = survivors.select(id_col, "n_tokens", "quality").localCheckpoint(
        eager=True
    )
    exact.unpersist()
    return out


def clean_corpus_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_quality: float = 0.9,
    min_tokens: int = 12,
    max_tokens: int = 5000,
    shingle_n: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    threshold: float = 0.2,
) -> str:
    """DuckDB twin of :func:`clean_corpus` (md5 mode). The near-dedup stage
    nests :func:`dd.near_dedup_pairs_sql` as a subquery over the
    ``survivors`` CTE (DuckDB supports WITH inside a derived table)."""
    pairs = dd.near_dedup_pairs_sql(
        "survivors",
        text_col,
        id_col,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        threshold=threshold,
    )
    return f"""
    WITH stats AS (
      SELECT {id_col}, {text_col},
             CAST(len({tx.tokens_sql(text_col)}) AS BIGINT) AS n_tokens,
             {tx.lang_id_sql(text_col)} AS lang_guess,
             {tx.quality_score_sql(text_col)} AS quality,
             {tx.fingerprint_sql(text_col, shingle_n)} AS fp
      FROM {table}
    ), kept AS (
      SELECT * FROM stats
      WHERE lang_guess = '{lang}' AND quality >= {min_quality}
        AND n_tokens BETWEEN {min_tokens} AND {max_tokens}
    ), survivors AS (
      SELECT k.{id_col}, k.{text_col}, k.n_tokens, k.quality
      FROM kept k
      JOIN (SELECT fp, min({id_col}) AS mid FROM kept GROUP BY fp) m
        ON k.fp = m.fp AND k.{id_col} = m.mid
    )
    SELECT {id_col}, n_tokens, quality FROM survivors
    WHERE {id_col} NOT IN (SELECT id_b FROM ({pairs}))
    """
