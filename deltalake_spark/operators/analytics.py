"""Customer/product analytics classics: cohort retention and RFM
segmentation.

Engine-native additions (the reference's query surface —
``src/query/index.ts`` — has aggregation pipelines but no
cohort/retention or scoring primitives). Both operators follow the
grain-reduction discipline of :mod:`.timeseries`: ONE pass over the
raw fact table reduces to an entity-level frame (users, customers),
and every subsequent step — cohort joins, quantile scoring — runs on
that reduced frame, whose size is the entity count, not event volume.

- :func:`cohort_retention` — the classic retention triangle: each
  entity is assigned to the cohort of its FIRST active period; for
  every (cohort, period-offset) cell, how many of the cohort's
  entities were active. Exact integer counts; the percentage is a
  single IEEE division so oracles replay it bit-for-bit.
- :func:`rfm_segments` — Recency/Frequency/Monetary quintile scoring
  (direct marketing's classic segmentation): per-customer aggregates,
  ``ntile``-based 1..5 scores with a DETERMINISTIC total order
  (metric, then entity id — ntile bucket boundaries are
  order-sensitive, so the tiebreak is part of the contract), and the
  segment-level rollup.

100 TB notes: ``cohort_retention`` touches the fact table once
(distinct on (entity, period) — one hash shuffle with partial
combine); the first-period aggregate and the cohort join both run
keyed by entity on the distinct frame. ``rfm_segments`` reduces to
one row per customer, then scores that frame three times via
DISTRIBUTED exact global ranks (:mod:`.ranking`) — range shuffles,
never a single-partition ntile sort, so the scoring survives
billion-entity frames unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cohort_retention",
    "rfm_segments",
    "touch_attribution",
    "kaplan_meier",
]


def cohort_retention(
    df: DataFrame,
    *,
    entity_col: str,
    period_col: str,
    max_offset: int = 8,
) -> DataFrame:
    """Retention triangle over an (entity, integer period) activity
    grain.

    ``df`` must already carry an INTEGER period column (day/week
    number — callers derive it from the timestamp, keeping this
    operator grain-agnostic). Cohort = the entity's minimum period;
    a cohort/offset cell counts entities active exactly
    ``offset`` periods after their cohort period.

    Plan shape: distinct (entity, period) → one hash shuffle with
    map-side combine; min-period per entity → entity-keyed aggregate
    (co-partitioned with the distinct frame's hash); the
    activity-to-cohort join is entity-keyed on the SAME hash, so AQE
    reuses the exchange; the final (cohort, offset) aggregate and the
    cohort-size join run on the cell frame (#cohorts × #offsets).
    Because (entity, period) pairs are distinct, ``count(*)`` per
    cell IS the distinct-entity count — no count_distinct state.

    Output: ``(cohort_p, offset, active, cohort_size, retention_pct)``
    with ``retention_pct = round(100·active/size, 4)`` (one IEEE
    division — oracle-replayable).
    """
    if max_offset < 0:
        raise ValueError("max_offset must be >= 0")
    activity = df.select(entity_col, period_col).distinct()
    first = activity.groupBy(entity_col).agg(
        F.min(period_col).alias("cohort_p"))
    cells = (
        activity.join(first, entity_col)
        .select(
            "cohort_p",
            (F.col(period_col) - F.col("cohort_p")).alias("offset"))
        .where(F.col("offset") <= max_offset)
        .groupBy("cohort_p", "offset")
        .agg(F.count(F.lit(1)).alias("active"))
    )
    sizes = cells.where(F.col("offset") == 0).select(
        "cohort_p", F.col("active").alias("cohort_size"))
    return (
        cells.join(F.broadcast(sizes), "cohort_p")
        .select(
            "cohort_p",
            "offset",
            "active",
            "cohort_size",
            F.round(
                F.lit(100.0) * F.col("active") / F.col("cohort_size"),
                4,
            ).alias("retention_pct"),
        )
    )


def rfm_segments(
    df: DataFrame,
    *,
    entity_col: str,
    date_col: str,
    amount_col: str,
    asof: str,
    buckets: int = 5,
) -> DataFrame:
    """RFM quintile segmentation over a transactions table.

    Per entity: recency = days from last transaction to ``asof``
    (a date literal), frequency = transaction count, monetary =
    exact integer cents. Scores are ``buckets+1 − ntile(buckets)``
    so 5 is always "best" (most recent / most frequent / highest
    spend). ntile's bucket boundaries depend on the total order, so
    each metric ranks by (metric, entity id) — deterministic and
    replayable on any engine with standard ntile semantics (first
    ``n mod k`` buckets take the extra rows; Spark and DuckDB agree).

    Plan shape: one entity-keyed hash aggregate over the fact table
    (partial combine); then, instead of ``ntile() OVER (ORDER BY …)``
    (whose plan is a SINGLE-partition sort of every entity), each
    score comes from a DISTRIBUTED exact global rank
    (:func:`operators.ranking.with_global_rank`: range shuffle +
    partition-local row_number + a collected per-partition count
    prefix) mapped through SQL-standard ntile bucketing (first
    ``n mod k`` buckets hold ``ceil(n/k)`` rows, the rest
    ``floor(n/k)``) — bit-identical output to the window form at any
    scale, with no single-partition exchange. The
    three per-metric score frames re-join the entity frame on the
    entity key (hash joins, AQE-eligible).

    Caching: the entity aggregate and the three ranged frames from
    :func:`with_global_rank` stay persisted (they are referenced by
    the returned lazy plan, so they cannot be released here); after
    materializing the result, callers in long-lived sessions should
    release them via :func:`deltalake_spark.session.release_caches`.

    Output: one row per (r_score, f_score, m_score) with
    ``n_customers`` and ``total_cents``.
    """
    from deltalake_spark.operators.ranking import with_global_rank

    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    base = df.groupBy(entity_col).agg(
        F.datediff(
            F.lit(asof).cast("date"), F.max(F.col(date_col).cast("date"))
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col(amount_col) * 100).cast("long"))
        .alias("cents"),
    ).persist()
    k = int(buckets)
    n = base.count()
    if n == 0:
        raise ValueError("empty input")

    # ntile(k) from the exact global rank: the first n mod k buckets
    # hold ceil(n/k) rows, the rest floor(n/k) — SQL-standard ntile
    # (Spark and DuckDB agree). N.B. the tempting (rank-1)*k div n + 1
    # identity is NOT ntile: it spreads the remainder Bresenham-style
    # (e.g. n=12,k=5 gives sizes 3,2,3,2,2 instead of ntile's
    # 3,3,2,2,2) — pinned by tests/test_ranking.py::test_ntile_identity.
    q_, rem = divmod(n, k)
    thr = rem * (q_ + 1)

    # integer arithmetic throughout (div, not /); q_ == 0 implies
    # thr == n >= every rank, so the else branch (and its division)
    # is never evaluated in that case
    ntile_expr = F.expr(
        f"cast(if(__rank <= {thr}L,"
        f" (__rank - 1) div {q_ + 1}L + 1,"
        f" {rem}L + (__rank - 1 - {thr}L) div {max(q_, 1)}L + 1)"
        f" as long)")

    def score_frame(metric: str, ascending: bool, out: str) -> DataFrame:
        order = [
            F.col(metric).asc() if ascending else F.col(metric).desc(),
            F.col(entity_col).asc(),
        ]
        ranked = with_global_rank(
            base.select(entity_col, metric), order)
        return ranked.select(
            entity_col,
            (F.lit(k + 1) - ntile_expr).cast("int").alias(out),
        )

    r = score_frame("recency_days", True, "r_score")
    f = score_frame("frequency", False, "f_score")
    m = score_frame("cents", False, "m_score")
    scored = (
        base.select(entity_col, "cents")
        .join(r, entity_col)
        .join(f, entity_col)
        .join(m, entity_col)
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("total_cents"),
    )


def _journey_touches(
    df: DataFrame,
    entity_col: str,
    order_col: str,
    channel_col: str,
    conversion_pred,
    lookback: int | None,
) -> DataFrame:
    """Shared journey machinery for the attribution family: number
    journeys by the reverse cumulative conversion count (touches
    belong to the NEXT conversion; each touch credits ONE journey),
    attach the journey's conversion time, apply the lookback. Returns
    ``(__e, __t, __ch, __j, __convt)`` — non-conversion touches whose
    journey converts."""
    is_conv = conversion_pred.cast("int")
    wrev = Window.partitionBy("__e").orderBy(
        F.col("__t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    marked = df.select(
        F.col(entity_col).alias("__e"),
        F.col(order_col).alias("__t"),
        F.col(channel_col).alias("__ch"),
        is_conv.alias("__c"),
    ).withColumn("__j", F.sum("__c").over(wrev))
    # touches: non-conversion rows whose journey has a conversion
    # (__j >= 1); the conversion row of journey j carries __j == j
    conv_times = marked.filter(F.col("__c") == 1).select(
        "__e", F.col("__j").alias("__cj"),
        F.col("__t").alias("__convt")).alias("cv")
    touches = (
        marked.filter((F.col("__c") == 0) & (F.col("__j") >= 1))
        .alias("m")
        .join(conv_times,
              (F.col("m.__e") == F.col("cv.__e"))
              & (F.col("m.__j") == F.col("cv.__cj")), "inner")
        .select("m.__e", "m.__t", "m.__ch", "m.__j", "cv.__convt")
    )
    if lookback is not None:
        touches = touches.filter(
            F.col("__convt") - F.col("__t") <= int(lookback))
    return touches


def time_decay_attribution(
    df: DataFrame,
    *,
    entity_col: str,
    order_col: str,
    channel_col: str,
    conversion_pred,
    halflife: int,
    lookback: int | None = None,
    max_halvings: int = 20,
) -> DataFrame:
    """Time-decay multi-touch attribution — the fourth classic credit
    model beside :func:`touch_attribution`'s first/last/linear: a
    touch's weight HALVES per ``halflife`` order-units of distance
    from its journey's conversion, so recent touches dominate without
    last-touch's winner-takes-all.

    Exactness contract (no float pow anywhere): the decay is
    piecewise-constant per halflife bucket —
    ``k = min((conv_time − t) div halflife, max_halvings)`` and
    ``w = 2^(max_halvings − k)`` (an exact BIGINT; distances past
    ``max_halvings`` halvings all get weight 1). Per-journey credit
    is ``floor(1e12·w / W)`` with ``W`` the journey's exact weight
    sum — ``1e12 · 2^20 ≈ 1.05e18`` stays inside int64, every step is
    integer arithmetic, and channel totals are order-independent
    BIGINT sums a SQL engine replays value-for-value.

    Scale shape: identical to :func:`touch_attribution` — one entity
    window pass numbers journeys, one (entity, journey) window sums
    weights, one channel aggregate; no new shuffle keys.

    Output: ``(channel, decay_units, decay_credit, n_touches)`` with
    ``decay_credit = decay_units / 1e12`` (one IEEE division).
    """
    if halflife < 1:
        raise ValueError("halflife must be >= 1 order-unit")
    if not 1 <= max_halvings <= 20:
        # 1e12 * 2^21 would pass 2^63 / 4.4 — keep the exact-int proof
        raise ValueError("max_halvings must be in 1..20")
    touches = _journey_touches(df, entity_col, order_col, channel_col,
                               conversion_pred, lookback)
    # (convt - t) is >= 0 by journey construction; BIGINT div keeps
    # the bucket index exact at any time scale
    mh = int(max_halvings)
    w = F.expr(
        f"shiftleft(1L, cast({mh}L - least("
        f"(__convt - __t) div {int(halflife)}L, {mh}L) as int))")
    wj = Window.partitionBy("__e", "__j")
    # N.B. names must differ by more than case: Spark resolves column
    # names case-insensitively by default, so __w/__W would be ONE
    # column (the second withColumn silently replacing the first)
    weighted = touches.withColumn("__wt", w).withColumn(
        "__wsum", F.sum("__wt").over(wj))
    units = F.expr("cast(1000000000000L * __wt as long) div __wsum")
    out = (
        weighted.withColumn("__u", units)
        .groupBy(F.col("__ch").alias("channel"))
        .agg(
            F.sum("__u").alias("decay_units"),
            F.count(F.lit(1)).alias("n_touches"),
        )
    )
    return out.withColumn(
        "decay_credit",
        F.col("decay_units").cast("double") / F.lit(1e12))


def touch_attribution(
    df: DataFrame,
    *,
    entity_col: str,
    order_col: str,
    channel_col: str,
    conversion_pred,
    lookback: int | None = None,
) -> DataFrame:
    """Multi-touch conversion attribution — first-touch, last-touch,
    and linear credit per channel (the marketing-analytics classic):
    for every conversion event, the non-conversion touches that
    precede it (within ``lookback`` order units, if given, and after
    the entity's previous conversion — each touch credits ONE
    conversion journey) share the credit three ways.

    Credit math: first/last are integer counts; linear credit is
    ``1/n_touches`` per touch, aggregated EXACTLY: per (channel,
    journey-size) cell, ``floor(1e12·count/n)`` in integer units
    (remainder-first decimal division), integer-summed across cells
    (order-independent), and surfaced both as ``linear_units``
    (BIGINT) and ``linear_credit`` (= units/1e12, ONE IEEE division)
    — no per-row float summation order anywhere.

    Scale shape: one entity-keyed window pass marks each touch with
    its next conversion (journey id = count of conversions so far,
    descending trick); one (channel, journey-size) aggregate; the
    final frame is |channels| x |journey sizes| — KB.

    Output: ``(channel, first_touch, last_touch, linear_credit,
    n_touches)``.
    """
    touches = _journey_touches(df, entity_col, order_col, channel_col,
                               conversion_pred, lookback)
    wj = Window.partitionBy("__e", "__j")
    enriched = touches.select(
        "__ch",
        (F.col("__t") == F.min("__t").over(wj)).cast("long")
        .alias("__is_first"),
        (F.col("__t") == F.max("__t").over(wj)).cast("long")
        .alias("__is_last"),
        F.count(F.lit(1)).over(wj).alias("__n"),
    )
    cells = enriched.groupBy("__ch", "__n").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum("__is_first").alias("__f"),
        F.sum("__is_last").alias("__l"),
    )
    dec = "decimal(38,0)"
    a = F.lit(10 ** 12).cast(dec) * F.col("__cnt").cast(dec)
    den = F.col("__n").cast(dec)
    units = ((a - a % den) / den).cast("long")
    out = cells.withColumn("__u", units) \
        .groupBy(F.col("__ch").alias("channel")).agg(
        F.sum("__f").alias("first_touch"),
        F.sum("__l").alias("last_touch"),
        F.sum("__u").alias("linear_units"),
        F.sum("__cnt").alias("n_touches"),
    )
    return out.withColumn(
        "linear_credit",
        F.col("linear_units").cast("double") / F.lit(1e12))


def kaplan_meier(
    df: DataFrame,
    *,
    group_cols: list[str],
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan–Meier survival estimator per group — the standard
    right-censored time-to-event curve (churn, time-to-conversion):
    at each distinct event time t with ``d_t`` events out of ``n_t``
    still at risk, ``S(t) = prod_{u<=t} (1 − d_u/n_u)``.

    Exactness contract: ``n_t``/``d_t``/``c_t`` are exact integers
    (at-risk via a descending cumulative window). The survival product
    is a FIXED-ORDER IEEE multiply chain — factors ``(n−d)/n`` folded
    in ascending time order inside a JVM ``aggregate`` over the
    group's sorted step array, so any engine replaying the same chain
    (DuckDB: ordered-window ``product()``) matches bit-for-bit; no
    partition-order dependence.

    Scale shape: one hash agg reduces subjects to (group, duration)
    step cells; the at-risk window and the fold run over the step
    frame (distinct durations per group — the grain), not subjects.

    Output: one row per (group, event time) —
    ``(group..., t, n_risk, n_events, n_censored, survival)``.
    """
    d = df.select(*group_cols,
                  F.col(duration_col).cast("long").alias("__t"),
                  F.col(event_col).cast("int").alias("__ev"))
    cells = d.groupBy(*group_cols, "__t").agg(
        F.sum("__ev").alias("__d"),
        F.sum(F.lit(1) - F.col("__ev")).alias("__c"))
    wrev = Window.partitionBy(*group_cols).orderBy(
        F.col("__t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    at_risk = cells.withColumn(
        "__n", F.sum(F.col("__d") + F.col("__c")).over(wrev))
    steps = at_risk.filter(F.col("__d") > 0)
    # ascending-time fold: survival after each step, bit-deterministic
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("__t").alias("t"), F.col("__d").alias("d"),
        F.col("__c").alias("c"), F.col("__n").alias("n"))))
    fold = F.aggregate(
        arr,
        F.expr("CAST(array() AS ARRAY<STRUCT<t: BIGINT, d: BIGINT,"
               " c: BIGINT, n: BIGINT, s: DOUBLE>>)"),
        lambda acc, x: F.concat(acc, F.array(F.struct(
            x["t"].alias("t"), x["d"].alias("d"), x["c"].alias("c"),
            x["n"].alias("n"),
            (F.when(F.size(acc) == 0, F.lit(1.0))
             .otherwise(F.element_at(acc, -1)["s"])
             * ((x["n"] - x["d"]).cast("double")
                / x["n"].cast("double"))).alias("s")))),
    )
    grouped = steps.groupBy(*group_cols).agg(fold.alias("__curve"))
    ex = grouped.select(*group_cols, F.explode("__curve").alias("__s"))
    return ex.select(
        *group_cols,
        F.col("__s.t").alias("t"),
        F.col("__s.n").alias("n_risk"),
        F.col("__s.d").alias("n_events"),
        F.col("__s.c").alias("n_censored"),
        F.col("__s.s").alias("survival"),
    )
