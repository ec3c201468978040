"""Immutable Dataset wrapper around a lazy Spark DataFrame.

Parity with reference ``src/trousse/dataset.py:138-719``: a table plus
driver-side metadata (metadata vs feature column roles, derived-column set,
operation history) and the profiling property surface (SURVEY.md §2.10).

Differences by design (SURVEY.md §1.1):
- the wrapped DataFrame is LAZY; chaining operators composes one Catalyst
  plan instead of the reference's per-operator deep copy
  (feature_operations.py:200,315,456,555,742);
- the profile is computed in ONE aggregation pass, cached on this immutable
  wrapper, and naturally "invalidated" because every transform returns a new
  Dataset (the reference memoizes and never invalidates — util.py:7-8).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame

from .exceptions import DuplicatedColumnError
from .operations import OperationsList, OpRecord
from .profiling import ColumnProfile, profile


class Dataset:
    """A Spark DataFrame + roles + lineage. Immutable: transforms return new
    Datasets sharing the history list contents (copied, append-only)."""

    def __init__(
        self,
        df: DataFrame,
        metadata_cols: tuple[str, ...] | frozenset[str] = frozenset(),
        feature_cols: tuple[str, ...] | frozenset[str] | None = None,
        derived_columns: frozenset[str] = frozenset(),
        history: OperationsList | None = None,
    ) -> None:
        self._df = df
        self._metadata_cols = frozenset(metadata_cols)
        self._feature_cols = frozenset(feature_cols) if feature_cols is not None else None
        self._derived_columns = frozenset(derived_columns)
        self._history = history or OperationsList()
        self._profile: ColumnProfile | None = None

    # ---- basic accessors (dataset.py:206-230) ------------------------------
    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def data(self) -> DataFrame:  # reference spelling (dataset.py:471-480)
        return self._df

    @property
    def columns(self) -> list[str]:
        return self._df.columns

    @property
    def metadata_cols(self) -> frozenset[str]:
        return self._metadata_cols

    @property
    def feature_cols(self) -> frozenset[str]:
        """Features default to all − metadata (dataset.py:210-230)."""
        if self._feature_cols is not None:
            return self._feature_cols
        return frozenset(self._df.columns) - self._metadata_cols

    @property
    def derived_columns(self) -> frozenset[str]:
        return self._derived_columns

    @property
    def history(self) -> OperationsList:
        return self._history

    # ---- evolution ---------------------------------------------------------
    def evolve(
        self,
        df: DataFrame | None = None,
        record: OpRecord | None = None,
        new_derived: tuple[str, ...] = (),
    ) -> "Dataset":
        """Return a new Dataset with ``df`` swapped in and ``record`` appended.

        Implements track_history's metadata-propagation rule
        (dataset.py:642-666): a derived column whose parents are ALL metadata
        columns becomes metadata itself.
        """
        new_meta = set(self._metadata_cols)
        history = OperationsList(list(self._history))
        if record is not None:
            history.append(record)
            if record.columns and set(record.columns) <= self._metadata_cols:
                new_meta.update(record.derived_columns)
        return Dataset(
            df if df is not None else self._df,
            metadata_cols=frozenset(new_meta),
            feature_cols=self._feature_cols,
            derived_columns=self._derived_columns | frozenset(new_derived),
            history=history,
        )

    def track_history(self, record: OpRecord) -> "Dataset":
        """Append an operation record (dataset.py:642-666)."""
        return self.evolve(record=record, new_derived=tuple(record.derived_columns))

    # ---- profile + property surface (SURVEY.md §2.10) ----------------------
    @property
    def profile(self) -> ColumnProfile:
        if self._profile is None:
            self._profile = profile(self._df, self._metadata_cols)
        return self._profile

    def nan_columns(self, nan_ratio: float = 1.0) -> frozenset[str]:
        return self.profile.nan_cols(nan_ratio)

    @property
    def constant_cols(self) -> frozenset[str]:
        return self.profile.constant_cols

    @property
    def trivial_columns(self) -> frozenset[str]:
        return self.profile.trivial_cols

    @property
    def mixed_type_columns(self) -> frozenset[str]:
        return self.profile.mixed_type_cols

    @property
    def numerical_columns(self) -> frozenset[str]:
        return self.profile.numerical_cols

    @property
    def str_columns(self) -> frozenset[str]:
        return self.profile.str_cols

    @property
    def str_categorical_columns(self) -> frozenset[str]:
        return self.profile.str_categorical_cols

    @property
    def num_categorical_columns(self) -> frozenset[str]:
        return self.profile.num_categorical_cols

    @property
    def bool_columns(self) -> frozenset[str]:
        return self.profile.bool_cols

    @property
    def other_type_columns(self) -> frozenset[str]:
        return self.profile.other_type_cols

    @property
    def med_exam_col_list(self) -> frozenset[str]:
        return self.profile.med_exam_col_list

    @property
    def to_be_fixed_cols(self) -> frozenset[str]:
        return self.profile.to_be_fixed_cols

    @property
    def to_be_encoded_cat_cols(self) -> frozenset[str]:
        """Categorical columns with no encoding operation recorded
        (dataset.py:549-570)."""
        encoded: set[str] = set()
        for op in self._history:
            if op.name in (
                "OneHotEncoder",
                "OrdinalEncoder",
                "encode_single_categorical_column",
            ):
                encoded.update(op.columns)
                encoded.update(op.derived_columns)  # code columns aren't inputs
        return (
            self.profile.str_categorical_cols | self.profile.num_categorical_cols
        ) - encoded

    def column_names_by_index(self, indices: list[int]) -> list[str]:
        """Column id → name lookup (dataset.py:576-593), driver-side."""
        cols = self._df.columns
        return [cols[i] for i in indices]

    def check_duplicated_features(self) -> bool:
        """True if column names are unique; raise otherwise (dataset.py:595-613)."""
        seen: set[str] = set()
        dupes = set()
        for c in self._df.columns:
            (dupes if c in seen else seen).add(c)
        if dupes:
            raise DuplicatedColumnError(f"Duplicated column names: {sorted(dupes)}")
        return True

    def show_columns_type(self) -> dict[str, str]:
        """Column → classified type name (dataset.py:615-640), driver-side."""
        p = self.profile
        out: dict[str, str] = {}
        for c in self._df.columns:
            if c in p.mixed_type_cols:
                out[c] = "mixed_type_col"
            elif c in p.bool_cols:
                out[c] = "bool_col"
            elif c in p.numerical_cols:
                out[c] = "numerical_col"
            elif c in p.str_cols:
                out[c] = "string_col"
            else:
                out[c] = "other_col"
        return out

    # ---- relational passthroughs (SURVEY.md §2.2/2.3/2.4/2.11; Phase 4) ----
    # Thin, lazily-composing wrappers; history records column-level effects.
    def select(self, *cols: str | Column) -> "Dataset":
        return self.evolve(df=self._df.select(*cols))

    def filter(self, condition: Column | str) -> "Dataset":
        return self.evolve(df=self._df.filter(condition))

    def with_column(self, name: str, col: Column) -> "Dataset":
        return self.evolve(df=self._df.withColumn(name, col))

    def drop(self, *cols: str) -> "Dataset":
        return self.evolve(df=self._df.drop(*cols))

    def join(self, other: "Dataset | DataFrame", on: Any, how: str = "inner") -> "Dataset":
        right = other.df if isinstance(other, Dataset) else other
        return self.evolve(df=self._df.join(right, on=on, how=how))

    def group_by(self, *cols: str | Column):
        return self._df.groupBy(*cols)

    def order_by(self, *cols: str | Column) -> "Dataset":
        return self.evolve(df=self._df.orderBy(*cols))

    def limit(self, n: int) -> "Dataset":
        return self.evolve(df=self._df.limit(n))

    def union(self, other: "Dataset | DataFrame") -> "Dataset":
        right = other.df if isinstance(other, Dataset) else other
        return self.evolve(df=self._df.unionByName(right))

    # ---- misc --------------------------------------------------------------
    def __str__(self) -> str:
        p = self.profile
        return (
            f"Dataset[{len(self._df.columns)} cols; "
            f"metadata={sorted(self._metadata_cols)}; "
            f"numerical={len(p.numerical_cols)} str={len(p.str_cols)} "
            f"bool={len(p.bool_cols)} mixed={len(p.mixed_type_cols)} "
            f"other={len(p.other_type_cols)}]"
        )


def copy_dataset_with_new_df(dataset: Dataset, new_df: DataFrame) -> Dataset:
    """Parity helper (dataset.py:722-753): swap the table, keep metadata.

    Warns-by-raising is unnecessary — with immutable datasets the caller sees
    exactly what it built; we only mirror the column-loss check.
    """
    lost = set(dataset.columns) - set(new_df.columns)
    if lost:
        import warnings

        warnings.warn(f"Columns lost in copy: {sorted(lost)}", stacklevel=2)
    return dataset.evolve(df=new_df)
