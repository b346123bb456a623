"""Event-sequence analytics: ordered funnels and cohort retention.

Engine-native product-analytics operators over the ``events`` fixture
domain (``ts`` as long epoch-nanos, see ``session.ts_to_long_nanos``);
the reference has no event-sequence operators at all.

Scale shapes:

- :func:`funnel_steps` — per-user earliest completion time of each
  ordered step ("first A, first B after that, ..."). Implemented as a
  cascade of narrow aggregations: step 1 is one ``min FILTER`` agg;
  each later step joins the (user, prev_ts) frame back to the events
  of just that step's type and takes the conditional min. Every stage
  is a streaming hash aggregation — NO per-user arrays, so whale users
  (millions of events) never materialize in one task, and after the
  first user-keyed exchange the later joins reuse the partitioning.
- :func:`retention_cohorts` — users bucketed by first-activity period,
  counted per (cohort, period-offset) they return in. Two aggs + one
  co-partitioned join; all integers, exactly reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["funnel_steps", "retention_cohorts", "event_paths"]

_DAY_NS = 86_400_000_000_000


def funnel_steps(
    events: DataFrame,
    *,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
) -> DataFrame:
    """Per-user ordered funnel: ``ts_1`` = first occurrence of
    ``steps[0]``; ``ts_i`` = first occurrence of ``steps[i-1]``
    STRICTLY AFTER ``ts_{i-1}`` (null once a step is never reached).
    Returns one row per user that completed at least step 1, with
    columns ``ts_1 .. ts_k``.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(time_col).alias("ts_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            user_col, F.col(time_col).alias("__ts"))
        # no pre-filter: a user whose step-i events all precede
        # ts_{i-1} must still survive with ts_i = null, and the
        # conditional min handles exactly that (min of no qualifying
        # rows is null; the left join keeps event-less users)
        cur = (
            cur.join(nxt, user_col, "left")
            .groupBy(user_col, *[f"ts_{j}" for j in range(1, i)])
            .agg(F.min(
                F.when(F.col("__ts") > F.col(f"ts_{i - 1}"),
                       F.col("__ts"))).alias(f"ts_{i}"))
        )
    return cur


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    time_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention grid: cohort = each user's first-activity
    period (``floor(first_ts / period)``), one output row per
    ``(cohort_period, period_offset)`` with the distinct users from
    that cohort active in that offset (offset 0 = the cohort period
    itself, so its count is the cohort size).
    """
    period_ns = period_days * _DAY_NS
    # integer `div`, NOT float division + cast: epoch nanos exceed
    # 2^53, so the double round-trip could misplace a timestamp that
    # lands within ~256 ns of a period boundary
    first = events.groupBy(user_col).agg(
        F.expr(f"min({time_col}) div {period_ns}L")
        .alias("cohort_period"))
    active = events.select(
        user_col,
        F.expr(f"{time_col} div {period_ns}L").alias("active_period"),
    ).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            "cohort_period",
            (F.col("active_period") - F.col("cohort_period"))
            .alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def event_paths(
    df: DataFrame,
    *,
    key_col: str,
    event_col: str,
    order_cols: list[str],
    max_steps: int = 5,
    sep: str = ">",
) -> DataFrame:
    """Clickstream path analysis: each entity's first ``max_steps``
    events (under the total order ``order_cols`` — include a unique
    tiebreaker so paths are a pure function of the data) concatenated
    into a path string, then counted across entities. The classic
    "what do users actually do" rollup that funnels summarize away.

    Scale shape: one entity-keyed window (row_number, capped at
    ``max_steps`` — WindowGroupLimit prunes the tail), one
    groupBy(entity) building the path INSIDE the aggregate
    (``array_sort`` of (step, event) structs — no second window, no
    re-sort shuffle), one path-count agg. Path cardinality is bounded
    by |event_types|^max_steps regardless of input size.

    Returns ``(path, n_steps, n)`` — callers rank with
    ``orderBy(desc("n"), "path")``.
    """
    if max_steps < 1:
        raise ValueError("max_steps must be >= 1")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    stepped = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(max_steps))
    )
    paths = stepped.groupBy(key_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("__rn").alias("s"),
                             F.col(event_col).alias("e")))),
                lambda x: x["e"],
            ),
            sep,
        ).alias("path"),
        F.count(F.lit(1)).alias("n_steps"),
    )
    return paths.groupBy("path", "n_steps").agg(
        F.count(F.lit(1)).alias("n"))
