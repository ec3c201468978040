"""Operator protocol and pipeline composition.

Parity with reference ``feature_operations.py:15-138``: every operator is a
callable ``op(Dataset) -> Dataset`` that records itself in the history.
Composition differences by design: the reference deep-copies the whole table
per operator (feature_operations.py:200,315,456,555,742); here each operator
adds lazy column expressions, so ``Pipeline(ops)(ds)`` builds ONE Catalyst
plan end-to-end and nothing executes until an action.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame

from ..dataset import Dataset
from ..operations import OpRecord


class FeatureOperation(ABC):
    """Single-column-in, optional-single-derived-column-out operator.

    Validation parity: feature_operations.py:40-87 (exactly one input column;
    derived_columns, when given, must match the input arity).
    """

    columns: tuple[str, ...]
    derived_columns: tuple[str, ...] | None

    def __init__(
        self,
        columns: list[str] | tuple[str, ...],
        derived_columns: list[str] | tuple[str, ...] | None = None,
    ) -> None:
        if len(columns) != 1:
            raise ValueError(
                f"Length of columns must be 1, found {len(columns)}"
            )
        if derived_columns is not None and len(derived_columns) != len(columns):
            raise ValueError(
                "Length of derived_columns must match columns "
                f"({len(derived_columns)} != {len(columns)})"
            )
        self.columns = tuple(columns)
        self.derived_columns = tuple(derived_columns) if derived_columns is not None else None

    @abstractmethod
    def _apply(self, dataset: Dataset) -> tuple[DataFrame, dict]:
        """Return (new DataFrame, operation details for the history record).

        Operators whose derived names are data-dependent (e.g. one-hot: one
        column per observed category) report them under the reserved
        ``"__derived__"`` details key instead of mutating instance state —
        operator instances stay immutable and reusable across datasets.
        """

    def __call__(self, dataset: Dataset) -> Dataset:
        new_df, details = self._apply(dataset)
        derived = tuple(details.pop("__derived__", self.derived_columns or ()))
        out = dataset.evolve(
            df=new_df,
            record=OpRecord(
                name=type(self).__name__,
                columns=self.columns,
                derived_columns=derived,
                details=details,
            ),
            new_derived=derived,
        )
        return out

    def _eq_fields(self) -> tuple:
        return (type(self), self.columns, self.derived_columns)

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, FeatureOperation)
            and self._eq_fields() == other._eq_fields()
        )

    def __hash__(self) -> int:
        return hash(repr(self._eq_fields()))

    def __repr__(self) -> str:
        return (
            f"{type(self).__name__}(columns={list(self.columns)}, "
            f"derived_columns={list(self.derived_columns) if self.derived_columns else None})"
        )


class Pipeline:
    """Sequential operator composition (reference ``Trousse``,
    feature_operations.py:101-138). Lazy: one Catalyst plan end-to-end."""

    def __init__(self, *operations) -> None:
        self.operations = list(operations)

    def __call__(self, dataset: Dataset) -> Dataset:
        for op in self.operations:
            dataset = op(dataset)
        return dataset

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Pipeline) and self.operations == other.operations


#: reference alias (feature_operations.py:101)
Trousse = Pipeline
