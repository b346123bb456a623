"""Temporal join operators: as-of join, interval (range) join, sessionization.

The reference engine has no temporal operators at all (its only
join-shaped op is ``merge``, /root/reference/src/cdc/index.ts:1937-2005);
these are engine-native additions for event/time-series workloads, built
for Spark's execution model:

- ``asof_join`` uses the union + running-``last`` trick: ONE shuffle on
  the key columns, no range-condition join that Catalyst would plan as a
  broadcast-nested-loop or an exploding theta join. At 100 TB this is the
  difference between a linear pass and a quadratic blow-up.
- ``interval_join`` keeps an equi-key in the join condition so Spark
  plans a shuffled hash/sort-merge join with the range predicate as a
  cheap residual filter; it refuses pure-range joins by default because
  those degrade to nested-loop.
- ``sessionize`` is a per-key window scan (lag → gap flag → running sum),
  the standard scalable gap-sessionization shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "interval_join", "interval_overlap_join",
           "interval_union", "sessionize"]

_L = "__asof_is_left"
_T = "__asof_t"
_R = "__asof_r"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str] | str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance: int | float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the nearest right row
    (same ``on`` keys) — ``direction='backward'`` (default) takes the
    most recent right row with ``right_time <= left_time``;
    ``direction='forward'`` takes the earliest right row with
    ``right_time >= left_time``; ``direction='nearest'`` takes the
    right row minimizing ``|right_time − left_time|`` (all three
    pandas ``merge_asof`` directions, tie rules included).

    Implementation: tag both sides, union them, and take a running
    ``last(..., ignorenulls=True)`` of the right-side payload over a
    window partitioned by the keys and ordered by (time, side) — time
    ascending for backward, descending for forward; right rows sort
    before left rows at equal timestamps either way so ties match,
    like DuckDB/pandas ``ASOF JOIN`` with ``>=``/``<=``. The payload
    travels as ONE struct so all attached columns come from the same
    matched row. ``nearest`` evaluates BOTH windows (they share the
    key partition, so the plan is one exchange with two sorts) and
    picks the closer match per row; equidistant ties prefer the
    backward match (pandas parity, pinned by test).

    ``tolerance`` (same unit as the time columns, which must be numeric —
    e.g. epoch nanos) nulls out matches farther than ``tolerance`` from
    ``left_time`` in the join direction (for ``nearest``: each side is
    tolerance-filtered BEFORE the closer-of-two pick, like pandas).

    Scale: a single hash shuffle on ``on``; window is a linear scan per
    key. Skewed keys can be pre-salted by the caller (split the window
    per salt, then a second pass merges boundary state).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest'")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        # right_time is always attached as f"{right_time}{suffix}" from
        # the payload's __rt — including it again here would emit a
        # duplicate output column
        right_cols = [
            c for c in right.columns if c not in keys and c != right_time
        ]
    # time columns keep their native numeric type: casting epoch-nanos
    # longs (~1.7e18) to double would quantize to ~256 ns steps
    payload = F.struct(
        F.col(right_time).alias("__rt"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        *keys,
        F.col(right_time).alias(_T),
        F.lit(0).alias(_L),
        payload.alias(_R),
    )
    l = left.select(
        "*",
        F.col(left_time).alias(_T),
        F.lit(1).alias(_L),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    def running(t_order: Column) -> Column:
        w = (
            Window.partitionBy(*keys)
            .orderBy(t_order, F.col(_L).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(_R, ignorenulls=True).over(w)

    def with_tol(m: Column, gap: Column) -> Column:
        if tolerance is None:
            return m
        return F.when(gap <= F.lit(tolerance), m)

    if direction == "nearest":
        # both windows share the key partition: one exchange, two sorts
        mb = unioned.withColumn("__rb", running(F.col(_T).asc())) \
            .withColumn("__rf", running(F.col(_T).desc()))
        out = mb.filter(F.col(_L) == 1)
        gap_b = F.col(_T) - F.col("__rb")["__rt"]
        gap_f = F.col("__rf")["__rt"] - F.col(_T)
        b = with_tol(F.col("__rb"), gap_b)
        fw = with_tol(F.col("__rf"), gap_f)
        # closer side wins; equidistant (and exact-time) ties prefer
        # backward — pandas merge_asof parity
        m = F.when(b.isNull(), fw).when(fw.isNull(), b) \
            .when(gap_b <= gap_f, b).otherwise(fw)
    else:
        t_order = F.col(_T).asc() if direction == "backward" \
            else F.col(_T).desc()
        out = unioned.withColumn(_R, running(t_order)) \
            .filter(F.col(_L) == 1)
        m = F.col(_R)
        gap = (F.col(_T) - m["__rt"]) if direction == "backward" \
            else (m["__rt"] - F.col(_T))
        m = with_tol(m, gap)
    cols = [F.col(c) for c in left.columns]
    cols.append(m["__rt"].alias(f"{right_time}{suffix}"))
    cols.extend(m[c].alias(f"{c}{suffix}") for c in right_cols)
    return out.select(*cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: list[tuple[Column, Column]] | tuple[Column, Column] | None,
    point_time: Column,
    lo: Column,
    hi: Column,
    how: str = "inner",
    allow_cartesian: bool = False,
) -> DataFrame:
    """Join point rows to interval rows: equi-keys + ``lo <= t < hi``.

    The equi-key part is mandatory (unless ``allow_cartesian``): it is
    what lets Spark pick a shuffled hash / sort-merge join and evaluate
    the range as a residual filter. A pure range condition would be
    planned as BroadcastNestedLoopJoin — quadratic at scale.
    """
    if on is None and not allow_cartesian:
        raise ValueError(
            "interval_join without equi-keys degrades to a nested-loop "
            "join; pass allow_cartesian=True only for small inputs"
        )
    pairs = [on] if isinstance(on, tuple) else list(on or [])
    cond = (point_time >= lo) & (point_time < hi)
    for a, b in pairs:
        cond = (a == b) & cond
    return points.join(intervals, cond, how)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str] | str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    suffix: str = "_r",
    min_overlap: int = 1,
) -> DataFrame:
    """Interval × interval overlap join: pair every left interval
    ``[left_start, left_end)`` with each same-key right interval
    ``[right_start, right_end)`` it overlaps by at least
    ``min_overlap`` units — the ad-exposure × outage-window /
    shift × incident classic that :func:`interval_join` (point in
    interval) and :func:`interval_union` (merge) don't cover.

    Exact integer arithmetic: the overlap is
    ``least(ends) − greatest(starts)`` and the join keeps pairs with
    ``overlap >= min_overlap`` — half-open semantics, so touching
    intervals overlap by 0 and are excluded at the default. Emitted
    per pair: ``overlap_start``, ``overlap_end``, ``overlap_len``.

    Scale shape: the equi-key is MANDATORY (same rule as
    :func:`interval_join`) — Spark plans a shuffled hash/sort-merge
    join on the keys with the overlap test as a residual filter; a
    pure range-overlap condition would degrade to a nested loop. For
    keys whose interval count is huge, pre-split long intervals into
    bounded epochs (key, epoch) first — the standard banding fix.

    Right's start/end (and any colliding column names) are suffixed.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError(
            "interval_overlap_join requires equi-keys; a pure overlap "
            "condition degrades to a nested-loop join")
    if min_overlap < 1:
        raise ValueError("min_overlap must be >= 1 (half-open "
                         "intervals: touching spans overlap by 0)")
    lcols = set(left.columns)
    r = right
    for c in right.columns:
        if c in lcols and c not in keys:
            target = f"{c}{suffix}"
            if target in lcols or target in right.columns:
                raise ValueError(
                    f"suffixing right column {c!r} to {target!r} "
                    "collides with an existing column; pass a "
                    "different suffix")
            r = r.withColumnRenamed(c, target)
    rs = f"{right_start}{suffix}" if right_start in lcols else right_start
    re_ = f"{right_end}{suffix}" if right_end in lcols else right_end
    joined = left.join(r, keys)
    o_start = F.greatest(F.col(left_start), F.col(rs))
    o_end = F.least(F.col(left_end), F.col(re_))
    return (
        joined.withColumn("overlap_start", o_start)
        .withColumn("overlap_end", o_end)
        .withColumn("overlap_len",
                    F.col("overlap_end") - F.col("overlap_start"))
        .filter(F.col("overlap_len") >= int(min_overlap))
    )


def sessionize(
    df: DataFrame,
    *,
    key: str,
    time_col: str,
    gap: int | float,
    tiebreak: list[str] | None = None,
    session_col: str = "session_seq",
) -> DataFrame:
    """Assign gap-based session numbers per key (1-based, in time order).

    A new session starts when the time since the previous event of the
    same key exceeds ``gap`` (same unit as ``time_col``, which must be
    numeric — e.g. epoch nanos). ``tiebreak`` columns make ordering (and
    therefore session numbering) deterministic under equal timestamps.

    One shuffle on ``key``; lag + running sum in a single window scan.
    """
    order = [F.col(time_col).asc()] + [
        F.col(c).asc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(time_col).over(w)
    new_session = F.when(
        prev.isNull() | ((F.col(time_col) - prev) > F.lit(gap)), 1
    ).otherwise(0)
    running = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(session_col, F.sum(new_session).over(running))


def interval_union(
    df: DataFrame,
    *,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping-or-touching intervals per key — the
    gaps-and-islands classic (uptime windows, ad-exposure spans,
    viewing sessions): intervals ``[start, end)`` whose start is ≤ the
    running maximum end of earlier intervals coalesce into one island.

    Exact integer arithmetic end to end: order by (start, end) within
    the key, island boundaries from a running ``max(end)`` over
    PRECEDING rows, island ids from a running sum of boundary flags —
    every step is a deterministic window over the key partition, so a
    SQL engine replays it value-for-value. ``start_col``/``end_col``
    must therefore already be integral (e.g. long nanos) — fractional
    types are rejected rather than silently truncated, since a
    truncation toward zero can flip a touch-vs-gap decision.

    Scale shape: ONE key-partitioned window pass over the intervals +
    one (key, island) aggregate — both shuffles keyed by the entity,
    never global. Output per island: ``(key..., island, start, end,
    n_intervals, span)``.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    integral = ("byte", "short", "int", "integer", "long", "bigint")
    dtypes = dict(df.dtypes)
    for c in (start_col, end_col):
        if dtypes.get(c) not in integral:
            raise TypeError(
                f"interval_union requires integral {c!r} (got "
                f"{dtypes.get(c)}); cast explicitly — a silent "
                "truncation could flip touch-vs-gap decisions")
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    base = df.select(*key_cols, s.alias("__s"), e.alias("__e"))
    w = Window.partitionBy(*key_cols).orderBy("__s", "__e")
    prev_max_end = F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = base.withColumn(
        "__new",
        F.when(prev_max_end.isNull() | (F.col("__s") > prev_max_end), 1)
        .otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        islands.groupBy(*key_cols, "island")
        .agg(
            F.min("__s").alias("start"),
            F.max("__e").alias("end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .withColumn("span", F.col("end") - F.col("start"))
    )
