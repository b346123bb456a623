"""Bucketed tables: shuffle-free co-located joins.

The reference is a single-node engine, so every join happens in-process
(e.g. the merge key grouping, /root/reference/src/cdc/index.ts:1937-2209);
there is nothing to co-locate. On a cluster the equivalent property —
"rows with the same key are already together" — comes from bucketing:
both sides of a recurring equi-join are written pre-hash-partitioned on
the join key (`bucketBy`), so Catalyst plans a SortMergeJoin with ZERO
Exchange nodes. At 100 TB this converts the dominant cost of a fact-fact
join (two full-table shuffles) into a plain co-located merge, paid once
at write time and amortized over every subsequent join.

`verify_colocated` makes the property testable: it asserts the joined
plan really contains no shuffle on either side (the whole point — a
silently mis-bucketed table would still return correct rows, just 100×
slower at scale).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from deltalake_spark.plans.explain import plan_summary

__all__ = ["write_bucketed", "read_bucketed", "verify_colocated"]


def write_bucketed(
    df: DataFrame,
    name: str,
    *,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-bucketed)
    managed table. Bucket counts must MATCH across tables that will be
    joined (Spark only elides the shuffle for equal bucket counts).
    Sorting within buckets additionally elides the Sort before a
    SortMergeJoin."""
    spark = df.sparkSession
    if mode == "overwrite":
        # with the in-memory catalog a managed table's LOCATION outlives
        # the session while the catalog entry does not; a fresh session's
        # overwrite then fails with LOCATION_ALREADY_EXISTS. Drop both.
        spark.sql(f"DROP TABLE IF EXISTS `{name}`")
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
        if wh:
            shutil.rmtree(os.path.join(wh, name.lower()),
                          ignore_errors=True)
    writer = (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def verify_colocated(joined: DataFrame) -> None:
    """Assert the join plan is genuinely shuffle-free (no Exchange).

    Correctness-neutral, scale-critical: bucketing that silently fails
    (mismatched counts, disabled config) still returns the right rows
    while re-introducing two full shuffles.
    """
    s = plan_summary(joined)
    if s.shuffles:
        raise AssertionError(
            f"expected a co-located (bucketed) join with 0 shuffles, "
            f"found {s.shuffles}\n--- plan ---\n{s.text}"
        )
