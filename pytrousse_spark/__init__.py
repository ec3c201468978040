"""pytrousse-spark: a PySpark-native data-wrangling and analytics engine.

A ground-up re-design of the capability surface of HK3-Lab-Team/pytrousse
(CSV/Parquet ingestion, column-type profiling, composable feature operations,
dirty-data repair, binning, categorical encoding, anonymization, operation
lineage) as lazy Spark DataFrame plans, plus the large-scale training-data
operators the original never had (deduplication, similarity search, text
analysis, multimodal plumbing, streaming).

See SURVEY.md for the blueprint and per-operator reference citations.
"""

from .dataset import Dataset, copy_dataset_with_new_df
from .io import (
    from_df,
    read_csv,
    read_dataset,
    read_parquet,
    read_parquet_df,
    read_tables,
    rebalance_undersplit,
    write_csv,
    write_dataset,
)
from .operations import OperationsList, OpRecord
from .profiling import ColumnProfile, ColumnStats, profile
from .session import get_spark

__version__ = "0.1.0"

__all__ = [
    "ColumnProfile",
    "ColumnStats",
    "Dataset",
    "OperationsList",
    "OpRecord",
    "copy_dataset_with_new_df",
    "from_df",
    "get_spark",
    "profile",
    "read_csv",
    "read_dataset",
    "read_parquet",
    "read_parquet_df",
    "read_tables",
    "rebalance_undersplit",
    "write_csv",
    "write_dataset",
    "__version__",
]
