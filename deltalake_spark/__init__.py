"""deltalake_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dot-do/deltalake.

The reference (/root/reference, TypeScript) implements a Delta-Lake-style
table format (JSON transaction log + Parquet data files) with a MongoDB-style
query/aggregation surface, CDC, and table maintenance. This package
re-expresses the same capabilities Spark-first:

- ``deltalake_spark.functions``  — Mongo filter / projection / aggregation
  pipeline translators producing Catalyst ``Column`` expressions and
  DataFrame transforms (the optimizer does pruning/pushdown for free).
- ``deltalake_spark.delta``      — the table layer: transaction log,
  snapshots/time travel, optimistic concurrency, checkpoints, DML
  (delete/update/merge), all data movement via Spark DataFrames.
- ``deltalake_spark.operators``  — maintenance (compact/dedup/Z-order/
  vacuum) and large-scale LLM-pipeline operators (MinHash/SimHash dedup,
  similarity search, text analysis, multimodal plumbing).
- ``deltalake_spark.streaming``  — change-data-feed readers and
  Structured-Streaming subscriptions.
"""

from deltalake_spark.errors import (
    ConcurrencyError,
    DeltaError,
    InvalidFilterError,
    InvalidPipelineError,
    NoMatchError,
    TableNotFoundError,
)
from deltalake_spark.functions.filters import translate_filter
from deltalake_spark.functions.pipeline import apply_pipeline
from deltalake_spark.functions.projection import apply_projection
from deltalake_spark.session import get_spark

__all__ = [
    "ConcurrencyError",
    "DeltaError",
    "InvalidFilterError",
    "InvalidPipelineError",
    "NoMatchError",
    "TableNotFoundError",
    "translate_filter",
    "apply_projection",
    "apply_pipeline",
    "get_spark",
    "DeltaTable",
]

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy import: keep `import deltalake_spark` cheap for translator-only use.
    if name == "DeltaTable":
        from deltalake_spark.delta.table import DeltaTable

        return DeltaTable
    raise AttributeError(name)
