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
one row per customer, then sorts that frame three times (one window
per metric) — for billions of entities the ntile windows are global
sorts; swap in percent_rank over pre-aggregated histograms if the
entity frame itself is too large to sort, documented below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cohort_retention",
    "rfm_segments",
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
    each window orders by (metric, entity id) — deterministic and
    replayable on any engine with standard ntile semantics (first
    ``n mod k`` buckets take the extra rows; Spark and DuckDB agree).

    Plan shape: one entity-keyed hash aggregate over the fact table
    (partial combine), then three windows over the per-entity frame —
    each a sort of #entities rows, NOT fact rows. At billion-entity
    scale replace ntile with percent_rank cuts over a pre-aggregated
    metric histogram; at fact scale nothing changes.

    Output: one row per (r_score, f_score, m_score) with
    ``n_customers`` and ``total_cents``.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    base = df.groupBy(entity_col).agg(
        F.datediff(
            F.lit(asof).cast("date"), F.max(F.col(date_col).cast("date"))
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col(amount_col) * 100).cast("long"))
        .alias("cents"),
    )
    k = int(buckets)
    w_r = Window.orderBy(F.col("recency_days").asc(),
                         F.col(entity_col).asc())
    w_f = Window.orderBy(F.col("frequency").desc(),
                         F.col(entity_col).asc())
    w_m = Window.orderBy(F.col("cents").desc(), F.col(entity_col).asc())
    scored = base.select(
        entity_col,
        "cents",
        (F.lit(k + 1) - F.ntile(k).over(w_r)).alias("r_score"),
        (F.lit(k + 1) - F.ntile(k).over(w_f)).alias("f_score"),
        (F.lit(k + 1) - F.ntile(k).over(w_m)).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("total_cents"),
    )
