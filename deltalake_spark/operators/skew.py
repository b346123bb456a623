"""Skew-handling operators: salting patterns for heavy-hitter keys.

AQE (enabled by default in session.py) already splits skewed JOIN
partitions, and Spark's hash aggregation does map-side partial
aggregation — so plain ``groupBy().agg(sum/count/...)`` needs no manual
salting. What AQE does NOT fix, and what these helpers cover:

- ``salted_topk`` — window ``row_number`` over a skewed key puts the
  whole hot key in ONE task. Two-phase top-k (local per (key, salt),
  then global per key) bounds every task at ~rows/num_salts.
- ``salted_distinct_count`` — exact COUNT(DISTINCT v) per hot key:
  salt by ``hash(value)`` so each distinct value lands in exactly one
  salt bucket; per-bucket exact distinct counts then SUM — no single
  task ever sees the full key.
- ``salted_join`` — explicit salted replicate-join for engines/paths
  where AQE skew handling is unavailable (e.g. a skewed key joined
  against a medium dim that is too big to broadcast): left side salts
  randomly into S buckets, right side replicates ×S.

The reference engine is single-process and has no notion of skew; these
are 100 TB-design-point additions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["salted_topk", "salted_distinct_count", "salted_join"]


def salted_topk(
    df: DataFrame,
    *,
    key: str | list[str],
    order_by: Column | list[Column],
    k: int,
    num_salts: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per key under skew: local top-k per (key, salt), then
    exact global top-k per key over at most ``num_salts * k`` survivors.

    Result is identical to a single ``row_number`` window (same
    ``order_by``); ties broken by the salt phase are re-broken
    deterministically only if ``order_by`` is a total order — pass a
    tiebreak column for exact parity, as with any window top-k.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = order_by if isinstance(order_by, list) else [order_by]
    salt = F.pmod(
        F.xxhash64(F.monotonically_increasing_id()), F.lit(num_salts)
    ).alias("__salt")
    w_local = Window.partitionBy(*keys, "__salt").orderBy(*order)
    w_global = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__salt", salt)
        .withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)          # ≤ num_salts·k rows per key
        .withColumn(rank_col, F.row_number().over(w_global))
        .filter(F.col(rank_col) <= k)
        .drop("__salt", "__lr")
    )


def salted_distinct_count(
    df: DataFrame,
    *,
    key: str | list[str],
    value: str,
    num_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key without funnelling any single
    key through one task: salt by hash(value) (each distinct value maps
    to exactly one bucket → per-bucket exact counts are additive)."""
    keys = [key] if isinstance(key, str) else list(key)
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(value)), F.lit(num_salts))
    )
    per_bucket = salted.groupBy(*keys, "__salt").agg(
        F.count_distinct(F.col(value)).alias("__d")
    )
    return per_bucket.groupBy(*keys).agg(
        F.sum("__d").alias(out_col)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Replicate-join for a skewed equi-key: left rows salt uniformly
    into S buckets; right rows replicate into all S buckets; join on
    (key, salt). Hot-key work spreads across S tasks at the cost of
    reading the right side S times — use only when the right side cannot
    broadcast and AQE skew-join is unavailable for the plan shape."""
    salts = F.array(*[F.lit(i) for i in range(num_salts)])
    l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()),
               F.lit(num_salts)),
    )
    r = right.withColumn("__salt", F.explode(salts))
    out = l.join(r, [on, "__salt"], how)
    return out.drop("__salt")
