"""Sketch operators: mergeable approximate aggregates for 100 TB scans.

The reference engine's only cardinality machinery is a Set-based
per-row-group ``distinctCount`` estimate in the streaming parquet writer
(/root/reference/src/parquet/streaming-writer.ts:763-771) — it is never
mergeable and never queryable. At the 100 TB design point, exact
COUNT(DISTINCT) is a full shuffle of every distinct value and exact
percentiles are a sort; sketches replace both with one narrow map-side
pass and constant-size mergeable state:

- ``approx_distinct`` — HyperLogLog++ via ``approx_count_distinct``:
  one pass, no shuffle of values (only fixed-size registers), rsd-tunable.
- ``hll_partition_sketches`` / ``hll_merge`` — the Apache DataSketches
  HLL pair (``hll_sketch_agg`` / ``hll_union_agg``): build per-partition
  binary sketches once (e.g. per ingest day), persist them in a tiny
  side table, and answer "distinct over any partition subset" by merging
  kilobyte sketches instead of rescanning terabytes. This is the
  pre-aggregation pattern every large ingest pipeline needs for
  dashboards/dedup-rate monitoring.
- ``approx_quantiles`` — ``percentile_approx`` (GK sketch): rank-error
  bounded by 1/accuracy, single aggregation buffer, no global sort.

All functions are JVM-side built-ins — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "approx_distinct",
    "hll_partition_sketches",
    "hll_merge",
    "approx_quantiles",
    "mg_frequent_items",
]


def approx_distinct(
    df: DataFrame,
    *,
    group_cols: list[str],
    col: str,
    rsd: float = 0.05,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Approximate distinct count of ``col`` per group (HLL++).

    Scale shape: map-side partial HLL registers merge in the shuffle —
    bytes moved are O(groups * register_size), independent of the number
    of distinct values (exact distinct shuffles every value once).
    """
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(col, rsd).alias(out_col)
    )


def hll_partition_sketches(
    df: DataFrame,
    *,
    partition_cols: list[str],
    col: str,
    lg_k: int = 12,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Build one binary DataSketches-HLL sketch per partition.

    The output is tiny (≤ ~2^lg_k bytes per row) and mergeable: persist
    it and answer distinct-count queries over arbitrary partition
    subsets with ``hll_merge`` — no rescan of the base table.
    """
    return df.groupBy(*partition_cols).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias(sketch_col)
    )


def hll_merge(
    sketches: DataFrame,
    *,
    group_cols: list[str],
    sketch_col: str = "hll_sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Merge per-partition sketches up to ``group_cols`` and estimate.

    Union preserves the sketch's error guarantees — the merged estimate
    stays within the same relative-error bound as a single pass over the
    union (it may differ from that single-pass estimate by a small
    representation-dependent amount: the union gadget re-encodes
    registers, it does not bit-copy them).
    """
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(False))
        ).alias(out_col)
    )


def approx_quantiles(
    df: DataFrame,
    *,
    group_cols: list[str],
    col: str,
    percentiles: list[float],
    accuracy: int = 10_000,
    out_col: str = "approx_quantiles",
) -> DataFrame:
    """Approximate percentiles per group (Greenwald-Khanna sketch).

    Rank error ≤ 1/accuracy of the group size; one aggregation buffer
    per group, no sort. The exact twin (``percentile``) keeps a full
    value buffer per group — fine at fixture scale, a spill hazard when
    a group holds billions of rows.
    """
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(
            F.col(col),
            F.array(*[F.lit(p) for p in percentiles]),
            F.lit(accuracy),
        ).alias(out_col)
    )


def _mg_compress(counts: dict, capacity: int) -> None:
    """Compress a counter dict to ≤ ``capacity`` entries, MG-style.

    Subtracts the (capacity+1)-th largest count from every entry and
    drops non-positives — the mergeable-summaries compression (Agarwal
    et al., PODS'12): at most ``capacity`` entries can exceed that
    threshold, and the per-item undercount introduced across all
    compressions of a stream of n items totals ≤ n/(capacity+1).
    """
    if len(counts) <= capacity:
        return
    import numpy as np

    vals = np.fromiter(counts.values(), dtype=np.int64)
    thresh = int(np.partition(vals, -(capacity + 1))[-(capacity + 1)])
    for t in list(counts):
        c = counts[t] - thresh
        if c > 0:
            counts[t] = c
        else:
            del counts[t]


def mg_frequent_items(
    df: DataFrame,
    *,
    col: str,
    capacity: int = 256,
    count_col: str = "mg_count",
) -> DataFrame:
    """Misra-Gries heavy hitters over a string column, mergeable.

    Completes the sketch trio (HLL distinct, GK quantiles, MG
    frequency): per-partition bounded-memory counter summaries built in
    one Arrow-batched pass, merged by a single (token-keyed) sum. The
    column to sketch is typically an exploded token stream.

    Guarantees (classic MG, preserved under merge-by-addition):
    every item with true frequency > n/(capacity+1) appears in the
    output, and its reported count satisfies
    ``true − n/(capacity+1) ≤ reported ≤ true``. State per partition is
    ≤ capacity counters regardless of stream length; the merged result
    is ≤ partitions × capacity rows (KBs), so the shuffle moves
    sketches, not the stream — the exact-count twin shuffles every
    distinct value. When the true vocabulary fits ``capacity`` no
    compression ever fires and counts are exact (how the gate query
    stays value-level while the eviction path is property-tested).

    Batches are pre-aggregated with vectorized ``value_counts`` before
    touching the Python dict, so per-item Python work is O(distinct per
    batch), not O(stream).
    """
    import pandas as pd

    out_schema = f"`{col}` string, `{count_col}` long"

    def build(batches):
        d: dict = {}
        for pdf in batches:
            for t, c in pdf[col].value_counts().items():
                if t is None:
                    continue
                d[t] = d.get(t, 0) + int(c)
            _mg_compress(d, capacity)
        if d:
            yield pd.DataFrame({col: list(d.keys()), count_col: list(d.values())})

    sketches = df.select(col).mapInPandas(build, out_schema)
    return sketches.groupBy(col).agg(F.sum(count_col).alias(count_col))
