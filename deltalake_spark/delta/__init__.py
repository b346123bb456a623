"""Delta-style table layer: JSON transaction log + Parquet data files.

Metadata operations (log replay, commits, checkpoints) run driver-side in
Python — they are KB-scale; all data movement is Spark DataFrames. This
mirrors the reference's architecture (/root/reference/src/delta/), which
also implements the log itself, while replacing its single-process
row-at-a-time data path with distributed scans/writes.
"""

from deltalake_spark.delta.table import DeltaTable

__all__ = ["DeltaTable"]
