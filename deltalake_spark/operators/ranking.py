"""Distributed exact global ranking — the scale-safe replacement for
``row_number()/ntile() OVER (ORDER BY ...)`` with no PARTITION BY,
which funnels the whole frame through ONE partition.

Pattern (shared with :func:`operators.audit.equidepth_histogram`):
range-repartition on the total order, rank partition-locally, then add
a collected per-partition count prefix (``partitions`` integers —
driver-side KB, independent of row count). Because the caller's order
is TOTAL (callers must include a unique tiebreak column), the computed
rank is a pure function of the data — identical on any engine, any
partitioning, any sampled range boundaries.

Engine-native: the reference (a single-node TS engine) sorts in
process (``src/query/index.ts`` $sort); this module exists so global
order statistics survive the 1000-executor design point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_global_rank"]


def with_global_rank(
    df: DataFrame,
    order: list[Column],
    *,
    rank_col: str = "__rank",
    partitions: int = 32,
) -> DataFrame:
    """Add an exact 1-based global ``row_number`` under ``order``
    without a single-partition sort.

    ``order`` must be a TOTAL order (include a unique tiebreak, e.g.
    the entity id) — otherwise ranks of tied rows depend on physical
    row placement. Sort directions (``.desc()``/``.asc()``) are
    honored by both the range partitioner and the local window.

    Cost: one range shuffle of ``df`` + one ``partitions``-row count
    collect; the per-partition prefix offsets are folded into the plan
    as a literal CASE chain. The ranged layout is persisted so the
    count job and the rank job can't see different sampled range
    boundaries; callers release it via ``session.release_caches``.
    """
    if not order:
        raise ValueError("order must be non-empty")
    ranged = df.repartitionByRange(partitions, *order).persist()
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    counts = {
        r["__pid"]: r["c"]
        for r in with_pid.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    local = with_pid.withColumn(
        "__lr",
        F.row_number().over(Window.partitionBy("__pid").orderBy(*order)),
    )
    off_expr = F.lit(0).cast("long")
    acc = 0
    for pid in sorted(counts):
        off_expr = F.when(F.col("__pid") == pid, F.lit(acc)).otherwise(
            off_expr
        )
        acc += counts[pid]
    return (
        local.withColumn(rank_col, (F.col("__lr") + off_expr).cast("long"))
        .drop("__pid", "__lr")
    )
