"""Binning and categorical-combination operators (SURVEY.md §2.6, B1-B5, B9).

The reference assigns bins with a per-bin boolean-mask loop where later
assignments win (feature_fix.py:74-83; breed_specific_bin_splitting.py:290-297).
That "last write wins" collapses to a closed form: with sorted bin bounds,

    bin(x) = #{thresholds t : x >= t}   clamped to the last bin,

valid only inside [first lower bound, last upper bound] — NULL elsewhere and
for NULL input. All assignment therefore compiles to a single column
expression over an array literal (B1) or a broadcast-joined per-group
threshold row (B4); no shuffle of the fact table, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..dataset import Dataset
from ..operations import OpRecord
from .transforms import sorted_distinct

#: feature_fix.py:16
BIN_SPLIT_COL_SUFFIX = "_bin_id"
#: breed_specific_bin_splitting.py:12 (generalized beyond dog breeds)
GROUP_BIN_COLUMN_SUFFIX = "_bin_group_specific"

#: combination-dimension guard: product of vocabularies must stay broadcastable.
MAX_COMBO_PRODUCT = 100_000


# ---------------------------------------------------------------------------
# B1 — threshold-list binning (feature_fix.py:33-97)
# ---------------------------------------------------------------------------
def _bin_assign_expr(
    x: Column, lower: float, upper: float, inner_thresholds: list[float]
) -> Column:
    """Closed form of the reference's later-wins mask loop."""
    arr = F.array(*[F.lit(float(t)) for t in inner_thresholds])
    count = F.size(F.filter(arr, lambda t: x >= t))
    n_bins = len(inner_thresholds) + 1
    return (
        F.when(
            x.isNotNull() & (x >= F.lit(lower)) & (x <= F.lit(upper)),
            F.least(count, F.lit(n_bins - 1)),
        )
        .otherwise(F.lit(None))
        .cast("smallint")  # reference Int16, feature_fix.py:86
    )


def split_continuous_column_into_bins(
    dataset: Dataset, col_name: str, bin_threshold: list[float]
) -> Dataset:
    """Threshold binning into ``{col}_bin_id`` (feature_fix.py:33-97).

    Parity: first lower bound = column min − 1 (feature_fix.py:53); membership
    ``lo <= x <= hi`` with a threshold value landing in the HIGHER bin
    (later assignment wins, feature_fix.py:74-83); NULL stays NULL; the
    bin_id→[lo,hi] map goes into the history record.

    One min/max aggregation stages the plan; assignment is a pure expression.
    """
    new_col = f"{col_name}{BIN_SPLIT_COL_SUFFIX}"
    row = dataset.df.agg(
        F.min(F.col(col_name).cast("double")).alias("mn"),
        F.max(F.col(col_name).cast("double")).alias("mx"),
    ).collect()[0]
    lower0 = row["mn"] - 1  # feature_fix.py:53
    upper_last = row["mx"]
    thresholds = [float(t) for t in bin_threshold]

    bounds = [lower0, *thresholds, upper_last]
    bin_id_range_map = {
        i: [bounds[i], bounds[i + 1]] for i in range(len(thresholds) + 1)
    }
    x = F.col(col_name).cast("double")
    df = dataset.df.withColumn(
        new_col, _bin_assign_expr(x, lower0, upper_last, thresholds)
    )
    return dataset.evolve(
        df=df,
        record=OpRecord(
            name="split_continuous_column_into_bins",
            columns=(col_name,),
            derived_columns=(new_col,),
            details={"encoded_values_map": bin_id_range_map},
        ),
        new_derived=(new_col,),
    )


# ---------------------------------------------------------------------------
# B2/B3 — categorical combination encoding (feature_fix.py:100-186, 425-455)
# ---------------------------------------------------------------------------
def combine_categorical_columns_to_one(
    dataset: Dataset, columns_list: tuple[str, ...], include_nan: bool = False
) -> tuple[Dataset, str]:
    """Combo id over the product of per-column sorted distinct values
    (feature_fix.py:100-186).

    Combo ids follow ``itertools.product`` order of the sorted vocabularies
    (feature_fix.py:155), i.e. mixed-radix arithmetic over per-column codes:
    ``id = code_1·(|V_2|·…·|V_n|) + … + code_n``. Encoded as a pure
    expression (per-column WHEN-chain codes + arithmetic) — no join at all,
    versus the reference's |product| boolean-mask passes over the table.

    ``include_nan=True`` appends NULL as a trailing category per column
    (deviation note: pandas sorts NaN unstably in the reference's
    ``list.sort``; we pin NULL last and record it in the op details).
    """
    new_column_name = f"{'-'.join(columns_list)}_enc"
    if new_column_name in dataset.columns:
        return dataset, new_column_name  # skip-if-exists, feature_fix.py:130-136

    vocabs: list[list] = []
    for c in columns_list:
        vals = sorted_distinct(dataset.df, c)
        if include_nan:
            vals = [*vals, None]
        vocabs.append(vals)
    product_size = math.prod(len(v) for v in vocabs)
    if product_size > MAX_COMBO_PRODUCT:
        raise ValueError(
            f"Combination space of {columns_list} has {product_size} cells "
            f"(> {MAX_COMBO_PRODUCT}); refusing to build the combo encoding"
        )

    # mixed-radix weights in product order
    weights = []
    acc = 1
    for v in reversed(vocabs):
        weights.append(acc)
        acc *= len(v)
    weights.reverse()

    combo_id: Column = F.lit(0).cast("int")
    valid: Column = F.lit(True)
    for c, vocab, w in zip(columns_list, vocabs, weights):
        code = F.lit(None).cast("int")
        for i, val in enumerate(vocab):
            cond = F.col(c).isNull() if val is None else (F.col(c) == F.lit(val))
            code = F.when(cond, F.lit(i)).otherwise(code)
        combo_id = combo_id + code * F.lit(w)
        valid = valid & code.isNotNull()

    expr = F.when(valid, combo_id).cast("smallint")  # Int16, feature_fix.py:173-176
    df = dataset.df.withColumn(new_column_name, expr)

    encoding_map: dict[int, tuple] = {}
    import itertools

    for pid, combo in enumerate(itertools.product(*vocabs)):
        encoding_map[pid] = combo

    out = dataset.evolve(
        df=df,
        record=OpRecord(
            name="combine_categorical_columns_to_one",
            columns=tuple(columns_list),
            derived_columns=(new_column_name,),
            details={"encoded_values_map": encoding_map, "include_nan": include_nan},
        ),
        new_derived=(new_column_name,),
    )
    return out, new_column_name


def make_categorical_columns_multiple_combinations(
    dataset: Dataset, col_names: list[str]
) -> tuple[Dataset, list[str]]:
    """B2 for each prefix ``cols[:1], cols[:2], …`` (feature_fix.py:425-455) —
    multi-level partition ids, all in one lazy plan."""
    combination_columns = []
    for i in range(len(col_names)):
        dataset, new_col = combine_categorical_columns_to_one(
            dataset, tuple(col_names[: i + 1])
        )
        combination_columns.append(new_col)
    return dataset, combination_columns


def interval_expr(lower, upper) -> Column:
    """``struct<lower double, upper double>`` interval value — the Spark
    representation of pandas ``Interval`` columns, which the reference
    classifies as *numerical* (dataset.py:334; profiler parity in
    profiling.ColumnProfile._is_interval)."""
    lo = lower if isinstance(lower, Column) else F.lit(float(lower))
    hi = upper if isinstance(upper, Column) else F.lit(float(upper))
    return F.struct(
        lo.cast("double").alias("lower"), hi.cast("double").alias("upper")
    )


def attach_bin_intervals(
    dataset: Dataset, bin_col: str, new_column_name: str | None = None
) -> Dataset:
    """Materialize each bin id's ``[lo, hi]`` range as an interval-struct
    column, read from the bin operator's history record (the
    ``encoded_values_map`` written by :func:`split_continuous_column_into_bins`
    / :func:`add_group_specific_bin_id`). Pure WHEN-chain expression — the
    ingestion side of the reference's Interval columns."""
    new_col = new_column_name or f"{bin_col}_interval"
    recs = [
        op
        for op in dataset.history
        if bin_col in op.derived_columns and "encoded_values_map" in op.details
    ]
    if not recs:
        raise ValueError(
            f"no binning history record with an encoded_values_map derives "
            f"{bin_col!r}"
        )
    mapping = recs[-1].details["encoded_values_map"]
    expr = F.lit(None).cast("struct<lower:double,upper:double>")
    for bin_id, (lo, hi) in mapping.items():
        expr = F.when(
            F.col(bin_col) == F.lit(int(bin_id)), interval_expr(lo, hi)
        ).otherwise(expr)
    df = dataset.df.withColumn(new_col, expr)
    return dataset.evolve(
        df=df,
        record=OpRecord(
            name="attach_bin_intervals",
            columns=(bin_col,),
            derived_columns=(new_col,),
            details={"encoded_values_map": mapping},
        ),
        new_derived=(new_col,),
    )


def convert_maps_from_tuple_to_str(group_id_to_tuple_map: dict) -> dict:
    """Tuple combo values → 'a-b' strings (feature_fix.py:19-30)."""
    return {
        gid: "-".join(str(el) for el in combo)
        for gid, combo in group_id_to_tuple_map.items()
    }


# ---------------------------------------------------------------------------
# B4 — per-group geometric binning (breed_specific_bin_splitting.py:15-525)
# ---------------------------------------------------------------------------
def increasing_thresholds(
    range_min: float, range_max: float, increase: float, bin_count: int
) -> list[float]:
    """Geometric threshold series (breed_specific_bin_splitting.py:15-82).

    ``bin[i] = increase · bin[i-1]``; first bin sized so ``bin_count`` bins
    cover [min, max]; first threshold nudged below min by min·1e-10 so the
    minimum is included; last threshold pinned to max.
    """
    tot = range_max - range_min
    thresh = [range_min - range_min * 1e-10]
    if increase == 1:
        thresh.extend(tot / bin_count * (i + 1) + range_min for i in range(bin_count - 1))
    else:
        gsum = (1 - increase**bin_count) / (1 - increase)
        size = tot / gsum
        for _ in range(bin_count - 1):
            thresh.append(thresh[-1] + size)
            size *= increase
    thresh.append(range_max)
    return thresh


def bins_from_thresholds(thresh: list[float]) -> list[tuple[float, float]]:
    """[lo, hi] pairs; last bin's hi extended by +1 to absorb future values
    (breed_specific_bin_splitting.py:85-135, extra_bin_size=0)."""
    bins = [(thresh[i], thresh[i + 1]) for i in range(len(thresh) - 2)]
    bins.append((thresh[-2], thresh[-1] + 1))
    return bins


def add_group_specific_bin_id(
    dataset: Dataset,
    column_to_split: str,
    group_col: str,
    fallback_group: str,
    new_column_name: str | None = None,
    bin_thresh_increase: float = 1.1,
    bin_count: int = 20,
    bin_thresholds: list[float] | None = None,
    sample_count_threshold: int = 20,
    start_from_zero: bool = False,
    max_groups: int = 100_000,
) -> tuple[Dataset, dict]:
    """Per-group binning (add_breed_specific_bin_id_to_df,
    breed_specific_bin_splitting.py:423-525; generalized BREED→``group_col``,
    MONGREL→``fallback_group``).

    Two-pass plan (SURVEY.md §2.6 B4): (1) one ``groupBy(group).agg(min,max,
    count)`` — the only action, bounded by ``max_groups``; (2) driver computes
    per-group threshold arrays (pure math above); (3) broadcast-join the tiny
    threshold table and assign bins with the closed-form expression. Rows with
    NULL group keep a NULL bin (the reference sets them aside and re-appends,
    breed_specific_bin_splitting.py:384-420 — a no-op under expression
    semantics). No ``applyInPandas``, no shuffle of the fact table.
    """
    if new_column_name is None:
        new_column_name = f"{column_to_split}{GROUP_BIN_COLUMN_SUFFIX}"
    df = dataset.df
    x_dbl = F.col(column_to_split).cast("double")
    stats = (
        df.where(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.min(x_dbl).alias("mn"),
            F.max(x_dbl).alias("mx"),
            F.count(x_dbl).alias("cnt"),
        )
        .limit(max_groups + 1)
        .collect()
    )
    if len(stats) > max_groups:
        raise ValueError(f"{group_col!r} has more than {max_groups} groups")
    by_group = {r[group_col]: (r["mn"], r["mx"], r["cnt"]) for r in stats}
    if fallback_group not in by_group:
        raise ValueError(
            f"Fallback group {fallback_group!r} not present in {group_col!r}"
        )

    def group_bins(mn: float, mx: float) -> list[tuple[float, float]]:
        if bin_thresholds is not None:
            return bins_from_thresholds([float(t) for t in bin_thresholds])
        lo = 0.0 if start_from_zero else mn
        return bins_from_thresholds(
            increasing_thresholds(lo, mx, bin_thresh_increase, bin_count)
        )

    fb_mn, fb_mx, fb_cnt = by_group[fallback_group]
    if fb_cnt < sample_count_threshold:
        raise ValueError(
            f"Fallback group {fallback_group!r} has only {fb_cnt} samples "
            f"(< {sample_count_threshold})"
        )
    fallback_bins = group_bins(fb_mn, fb_mx)

    bin_map_per_group: dict = {}
    rows = []
    for g, (mn, mx, cnt) in by_group.items():
        bins = fallback_bins if cnt < sample_count_threshold else group_bins(mn, mx)
        bin_map_per_group[g] = {i: list(b) for i, b in enumerate(bins)}
        inner = [b[0] for b in bins[1:]]
        rows.append((g, float(bins[0][0]), float(bins[-1][1]), inner, len(bins)))

    spark = df.sparkSession
    bins_df = spark.createDataFrame(
        rows, ["__grp", "__lo", "__hi", "__inner", "__nbins"]
    )
    joined = df.join(
        F.broadcast(bins_df), on=df[group_col] == bins_df["__grp"], how="left"
    )
    x = F.col(column_to_split).cast("double")
    count = F.size(F.filter(F.col("__inner"), lambda t: x >= t))
    bin_expr = (
        F.when(
            x.isNotNull()
            & F.col("__grp").isNotNull()
            & (x >= F.col("__lo"))
            & (x <= F.col("__hi")),
            F.least(count, F.col("__nbins") - 1),
        )
        .otherwise(F.lit(None))
        .cast("smallint")
    )
    out_df = joined.withColumn(new_column_name, bin_expr).drop(
        "__grp", "__lo", "__hi", "__inner", "__nbins"
    )
    out = dataset.evolve(
        df=out_df,
        record=OpRecord(
            name="add_group_specific_bin_id",
            columns=(column_to_split, group_col),
            derived_columns=(new_column_name,),
            details={"encoded_values_map": bin_map_per_group},
        ),
        new_derived=(new_column_name,),
    )
    return out, bin_map_per_group


# ---------------------------------------------------------------------------
# B5 — overlapping-bin row duplication (breed_specific_bin_splitting.py:225-263)
# ---------------------------------------------------------------------------
def explode_overlapping_bins(
    dataset: Dataset,
    column_to_split: str,
    bins_list: list[tuple[float, float]],
    new_column_name: str,
) -> Dataset:
    """Duplicate each row into every bin whose [lo, hi] contains its value
    (create_df_with_overlapping_bins_single_breed).

    Spark: build the (id, lo, hi) array literal, keep matching ids, explode —
    rows matching k bins appear k times; rows matching none are dropped
    (parity: the reference's per-bin concat only keeps matched rows).
    """
    x = F.col(column_to_split).cast("double")
    bins_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("id"),
                F.lit(float(lo)).alias("lo"),
                F.lit(float(hi)).alias("hi"),
            )
            for i, (lo, hi) in enumerate(bins_list)
        ]
    )
    matched = F.filter(bins_arr, lambda b: (x >= b["lo"]) & (x <= b["hi"]))
    df = (
        dataset.df.withColumn("__bins", matched)
        .withColumn("__bin", F.explode("__bins"))
        .withColumn(new_column_name, F.col("__bin.id").cast("smallint"))
        .drop("__bins", "__bin")
    )
    return dataset.evolve(
        df=df,
        record=OpRecord(
            name="explode_overlapping_bins",
            columns=(column_to_split,),
            derived_columns=(new_column_name,),
            details={"bins": [list(b) for b in bins_list]},
        ),
        new_derived=(new_column_name,),
    )


# ---------------------------------------------------------------------------
# B+ — equi-depth (quantile) binning on sketch boundaries (beyond-reference)
# ---------------------------------------------------------------------------
def quantile_bins(df, col: str, num_bins: int = 4, num_hist_bins: int = 4096):
    """Equi-depth binning: ``__qbin`` = which of ``num_bins``
    equal-frequency buckets the value falls in — the data-driven sibling
    of B1's user-supplied thresholds (pandas ``qcut`` in the reference's
    world, absent there because its datasets fit in RAM).

    Scale design: boundaries come from the histogram quantile sketch
    (operators/sketch.py) — ONE fixed-size hash aggregation bounded by
    ``num_hist_bins`` cells instead of the full sort an exact qcut needs,
    deterministic and replayed bit-for-bit by the DuckDB twin. Assignment
    reuses B1's later-wins closed form (#{thresholds <= x}) as a pure
    map-side expression over a literal array; NULL stays NULL.

    Returns (df + __qbin int column, boundaries list).
    """
    from .sketch import histogram_quantile_estimates

    qs = [i / num_bins for i in range(1, num_bins)]
    ests = histogram_quantile_estimates(df, col, qs, num_hist_bins)
    thresholds = [e["estimate"] for e in ests]
    x = F.col(col).cast("double")
    arr = F.array(*[F.lit(float(t)) for t in thresholds])
    bin_expr = (
        F.when(
            x.isNotNull(),
            F.size(F.filter(arr, lambda t: x >= t)),
        )
        .otherwise(F.lit(None))
        .cast("int")
    )
    return df.withColumn("__qbin", bin_expr), thresholds


def quantile_bins_profile_sql(
    table: str, col: str, num_bins: int = 4, num_hist_bins: int = 4096
) -> str:
    """DuckDB twin of the per-bin profile over :func:`quantile_bins`:
    recomputes the sketch boundaries with the identical bucket/crossing/
    interpolation math (histogram_quantiles_sql), assigns bins with the
    same #{thresholds <= x} rule, and aggregates count/min/max per bin."""
    from .sketch import histogram_quantiles_sql

    qs = [i / num_bins for i in range(1, num_bins)]
    inner = histogram_quantiles_sql(table, col, qs, num_hist_bins)
    return f"""
    WITH bnd AS ({inner}),
    assigned AS (
        SELECT {col} AS x,
               CAST((SELECT count(*) FROM bnd b WHERE {col} >= b.estimate)
                    AS INT) AS bin_id
        FROM {table} WHERE {col} IS NOT NULL
    )
    SELECT bin_id,
           CAST(count(*) AS BIGINT) AS n,
           round(min(x), 4) AS lo,
           round(max(x), 4) AS hi
    FROM assigned
    GROUP BY bin_id
    """
