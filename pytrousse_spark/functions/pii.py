"""PII scrubbing/redaction over text columns (beyond-reference).

The redaction pass every pre-training pipeline runs: emails, phone numbers,
IPv4 addresses, SSN- and card-shaped digit runs are replaced with typed
placeholder tokens, and per-type match counts are exposed for census
queries. All patterns are written in the common subset of Java regex
(Spark) and RE2 (DuckDB): no lookaround, no backreferences — so the DuckDB
oracle replays the identical computation.

Everything is a chained ``regexp_replace`` / ``regexp_count`` expression —
JVM-side, whole-stage codegen, zero Python in the row path; scrubbing
100 TB is scan-bound.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: the card pattern (16 digits) must run before the phone
# pattern (10-11 digits) so a card number is not half-eaten as a phone; the
# IP pattern before phone so dotted quads don't match phone separators.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (type, regex, replacement token)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def scrub_pii(col: Column) -> Column:
    """Text with every PII match replaced by its typed placeholder."""
    out = col
    for _typ, pat, tok in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tok)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-type match counts, evaluated on the ORIGINAL text (each type
    counted independently, before any replacement)."""
    return {
        f"n_{typ}": F.regexp_count(col, F.lit(pat)).cast("long")
        for typ, pat, _tok in PII_PATTERNS
    }


def _sql_escape(pat: str) -> str:
    return pat.replace("'", "''")


def scrub_pii_sql(expr: str) -> str:
    """DuckDB twin of :func:`scrub_pii` (same pattern order); 'g' flag
    because DuckDB's regexp_replace is first-match-only by default while
    Spark's replaces all."""
    out = expr
    for _typ, pat, tok in PII_PATTERNS:
        out = f"regexp_replace({out}, '{_sql_escape(pat)}', '{tok}', 'g')"
    return out


def pii_counts_sql(expr: str) -> dict[str, str]:
    """DuckDB twins of :func:`pii_counts`."""
    return {
        f"n_{typ}": (
            f"CAST(len(regexp_extract_all({expr}, "
            f"'{_sql_escape(pat)}')) AS BIGINT)"
        )
        for typ, pat, _tok in PII_PATTERNS
    }
