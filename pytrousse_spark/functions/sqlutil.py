"""Shared SQL-literal quoting for the DuckDB oracle twins.

Every ``*_sql`` twin that interpolates a caller-supplied string (search
terms, funnel steps, group labels, salts, language codes, regex
patterns) must route it through :func:`sql_quote` — a term containing a
single quote otherwise produces malformed SQL and, for caller-supplied
values, an injection surface (r7 ADVICE item 4).
"""

from __future__ import annotations


def sql_quote(value: str) -> str:
    """Render ``value`` as a single-quoted ANSI SQL string literal,
    doubling embedded single quotes (``it's`` -> ``'it''s'``)."""
    return "'" + str(value).replace("'", "''") + "'"
