"""Engine exceptions.

Parity with reference ``src/trousse/exceptions.py:1-35`` (MultipleObjectsInFileError,
NotShelveFileError) re-expressed for the Parquet + JSON-sidecar persistence
format, plus validation errors shared by the operator family.
"""

from __future__ import annotations


class PyTrousseSparkError(Exception):
    """Base class for engine errors."""


class MultipleOperationsFoundError(PyTrousseSparkError):
    """A derived column has more than one producing operation.

    Reference: operations_list.py:109-116 raises when >1 producer found.
    """


class OperationNotFoundError(PyTrousseSparkError):
    """No operation matches the lineage query (operations_list.py:104-108)."""


class DatasetSidecarError(PyTrousseSparkError):
    """The JSON sidecar next to a persisted dataset is missing or invalid.

    Replaces the reference's NotShelveFileError / MultipleObjectsInFileError
    (exceptions.py:17-35) for the distributed persistence format.
    """


class DuplicatedColumnError(PyTrousseSparkError):
    """Duplicate column names detected (dataset.py:595-613)."""
