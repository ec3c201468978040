"""Typo-repair expression cascade.

Re-expresses the reference's per-row Python repair
(``RowFix._convert_to_float_value``, row_fix.py:137-190, with settings.py
CHAR_REPLACE_DICT / WHOLE_WORD_REPLACE_DICT / ±2% out-of-scale rule) as ONE
whole-stage-codegen'd column expression — no Python in the hot path.

Cascade order (must match row_fix.py:148-190 exactly):
1. value already parses as a number → parsed value;
2. char replacements ('°'→'', ','→'.') then parse (row_fix.py:157-161);
3. contains '%'  → NULL (percentage has no absolute value, row_fix.py:163-166);
4. contains '>'  → parse(remainder) · (1+p)  (out-of-scale, row_fix.py:167-169);
5. contains '<'  → parse(remainder) · (1−p)  (row_fix.py:170-171);
6. whole (stripped) word in replacement map → mapped value (all defaults → NULL);
7. else unfixable.

Deviation (documented, SURVEY.md §2.7 R2): the reference keeps the unfixable
string in the column, producing a mixed-type pandas column. Spark columns are
homogeneously typed, so the repaired column is DOUBLE with NULL for unfixable
values, and the error census (R6) is a separate aggregation
(:func:`error_census`). The reference's int-vs-float cosmetic normalization
(`_convert_to_float_or_int`, row_fix.py:56-67) is a display concern with no
double-typed equivalent.

The identical cascade is emitted as ANSI SQL (:func:`repair_sql`) so the
DuckDB oracle can verify value-level parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: settings.py:40
CHAR_REPLACE = {"°": "", ",": "."}
#: settings.py:25-37 — all map to None → NULL.
WHOLE_WORD_NULL = (
    "---", ".", "ASSENTI", "PRESENTI", "non disponibile", "NV", "-",
    "Error", "None", "NAN",
)
#: settings.py:19
OUT_OF_SCALE_PCT = 0.02

#: Explicit numeric grammar for the parse steps. Engine cast parsers differ
#: on junk edge cases (DuckDB accepts '+-0' as -0.0; Python/Spark reject), so
#: BOTH the Spark expression and the SQL twin gate try_cast behind this
#: pattern (applied to the trimmed string). Deliberately excludes
#: inf/infinity — the reference would crash on them (int(float('inf')) raises
#: OverflowError, uncaught at row_fix.py:61) — and 'nan' (NULL either way).
NUMERIC_RE = r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"


def _char_fixed(s: Column) -> Column:
    out = s
    for old, new in CHAR_REPLACE.items():
        out = F.replace(out, F.lit(old), F.lit(new))
    return out


def repair_expr(col: Column, pct: float = OUT_OF_SCALE_PCT) -> Column:
    """Repaired DOUBLE value of a dirty numeric-ish column (NULL = unfixable).

    Self-contained form; for table-wide repair prefer :func:`with_repaired`,
    which stages the char-fixed intermediate in its own projection (Catalyst
    does not share it across WHEN branches — measured ~25% faster).
    """
    s = col.cast("string")
    return repair_from_parts(col, _char_fixed(s), pct)


def _guarded_parse(s: Column) -> Column:
    """try_cast gated by the explicit numeric grammar (cross-engine-stable)."""
    return F.when(F.trim(s).rlike(NUMERIC_RE), s.try_cast("double"))


def repair_from_parts(
    col: Column, s2: Column, pct: float = OUT_OF_SCALE_PCT
) -> Column:
    """The cascade with the char-fixed string supplied (possibly staged)."""
    s = col.cast("string")
    direct = _guarded_parse(s)
    fixed = _guarded_parse(s2)
    gt = _guarded_parse(F.replace(s2, F.lit(">"), F.lit(""))) * (1.0 + pct)
    lt = _guarded_parse(F.replace(s2, F.lit("<"), F.lit(""))) * (1.0 - pct)
    out = (
        F.when(col.isNull(), F.lit(None).cast("double"))
        .when(direct.isNotNull(), direct)
        .when(fixed.isNotNull(), fixed)
        .when(s2.contains("%"), F.lit(None).cast("double"))
        .when(s2.contains(">"), gt)
        .when(s2.contains("<"), lt)
        .otherwise(F.lit(None).cast("double"))
    )
    # 'NAN'-like strings parse to float NaN (exactly as Python float() in
    # row_fix.py:150); pandas treats NaN as missing, so normalize NaN → NULL.
    return F.when(F.isnan(out), F.lit(None).cast("double")).otherwise(out)


def with_repaired(df, columns: tuple[str, ...], pct: float = OUT_OF_SCALE_PCT):
    """Repair ``columns`` in place with staged char-fixed intermediates."""
    staged = df.withColumns(
        {f"__s2_{c}": _char_fixed(F.col(c).cast("string")) for c in columns}
    )
    repaired = staged.withColumns(
        {c: repair_from_parts(F.col(c), F.col(f"__s2_{c}"), pct) for c in columns}
    )
    return repaired.drop(*[f"__s2_{c}" for c in columns])


def nonparseable_expr(col: Column) -> Column:
    """TRUE where the RAW value fails a direct numeric parse (non-null and
    float() would raise) — the reference's ``errors_before`` predicate
    (row_fix.py:148-156), which counts every non-convertible value
    INCLUDING fixable typos like '12,5', '>30', '---'."""
    s = col.cast("string")
    return col.isNotNull() & _guarded_parse(s).isNull()


def unfixable_expr(col: Column) -> Column:
    """TRUE where the cascade gives up (error census predicate, row_fix.py:182-187).

    A value is an *error* (not a legit NULL/whole-word-null) when it is
    non-null, unparseable through steps 1-5, and not in the whole-word map.
    """
    s = col.cast("string")
    s2 = _char_fixed(s)
    return (
        col.isNotNull()
        & _guarded_parse(s).isNull()
        & _guarded_parse(s2).isNull()
        & ~s2.contains("%")
        & _guarded_parse(F.replace(s2, F.lit(">"), F.lit(""))).isNull()
        & _guarded_parse(F.replace(s2, F.lit("<"), F.lit(""))).isNull()
        & ~F.trim(s2).isin(*WHOLE_WORD_NULL)
    )


def _sql_char_fixed(expr: str) -> str:
    out = f"CAST({expr} AS VARCHAR)"
    for old, new in CHAR_REPLACE.items():
        out = f"replace({out}, '{old}', '{new}')"
    return out


def repair_sql(expr: str, pct: float = OUT_OF_SCALE_PCT) -> str:
    """DuckDB SQL emitting the exact cascade of :func:`repair_expr`."""
    s = f"CAST({expr} AS VARCHAR)"
    s2 = _sql_char_fixed(expr)

    def parse(e: str) -> str:
        return (
            f"(CASE WHEN regexp_matches(trim({e}), '{NUMERIC_RE}') "
            f"THEN try_cast({e} AS DOUBLE) END)"
        )

    case = f"""CASE
      WHEN {expr} IS NULL THEN NULL
      WHEN {parse(s)} IS NOT NULL THEN {parse(s)}
      WHEN {parse(s2)} IS NOT NULL THEN {parse(s2)}
      WHEN contains({s2}, '%') THEN NULL
      WHEN contains({s2}, '>') THEN {parse(f"replace({s2}, '>', '')")} * {1.0 + pct}
      WHEN contains({s2}, '<') THEN {parse(f"replace({s2}, '<', '')")} * {1.0 - pct}
      ELSE NULL
    END"""
    # NaN → NULL normalization, mirroring repair_expr.
    return f"(SELECT CASE WHEN isnan(__r) THEN NULL ELSE __r END FROM (SELECT ({case}) AS __r))"
