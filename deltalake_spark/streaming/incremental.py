"""Incremental view maintenance over the change feed.

At 100 TB you cannot recompute a derived aggregate by rescanning the
source; additive aggregates (COUNT/SUM, and AVG as SUM/COUNT) can be
maintained exactly from CDC deltas:

    delta(key) =  Σ inserts  −  Σ deletes  +  Σ (postimage − preimage)

The reference's CDC layer moves records but has no derived-state story
(SURVEY §2.10); this composes its change feed with Spark aggregation into
exact incremental maintenance. Each refresh reads ONLY the change files
of new commit versions — work proportional to the delta, not the table.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from deltalake_spark.delta.table import DeltaTable

__all__ = ["agg_delta", "IncrementalAggView"]


def agg_delta(
    changes: DataFrame,
    *,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Per-key (n_delta, <col>_delta...) from a CDC batch. Signs:
    insert/update_postimage +1, delete/update_preimage −1 — pre/post
    pairs cancel for unchanged columns automatically."""
    sign = (
        F.when(F.col("_change_type").isin("insert", "update_postimage"), 1)
        .when(F.col("_change_type").isin("delete", "update_preimage"), -1)
        .otherwise(0)
    )
    aggs = [F.sum(sign).alias("n_delta")] + [
        F.sum(sign * F.coalesce(F.col(c), F.lit(0.0))).alias(f"{c}_delta")
        for c in sum_cols
    ]
    return changes.groupBy(*keys).agg(*aggs)


_WM_KEY = "deltalake_spark.mv.watermark"


class IncrementalAggView:
    """An exactly-maintained COUNT/SUM aggregate of a CDC-enabled table,
    persisted as a Delta-backed materialized-view table.

    Deltas are applied with a distributed MERGE into the state table —
    nothing about the view ever touches the driver, so key cardinality is
    bounded by cluster storage, not driver memory (r1 kept a Python dict;
    that design ceiling is gone). ``refresh()`` work is proportional to
    the CDC delta: it reads only change files of new commit versions and
    MERGE rewrites only state files containing touched keys.

    The applied-version watermark is persisted in the state table's
    configuration, so a view handle can be reopened after a restart
    without replaying the full feed (refresh is idempotent per version).
    """

    def __init__(self, source: "DeltaTable", *, keys: list[str],
                 sum_cols: list[str], state_path: str | None = None):
        from deltalake_spark.delta.table import DeltaTable

        self.source = source
        self.keys = keys
        self.sum_cols = sum_cols
        self.state = DeltaTable(
            source.spark, state_path or source.path + "__mv"
        )
        self._watermark = self._load_watermark()

    def _load_watermark(self) -> int:
        if not self.state.exists():
            return -1
        conf = (self.state.snapshot().metadata or {}).get("configuration", {})
        return int(conf.get(_WM_KEY, -1))

    def refresh(self) -> int:
        """Apply change versions (watermark, head]; returns #versions."""
        head = self.source.version()
        if head <= self._watermark:
            return 0
        changes = self.source.read_changes(self._watermark + 1, head)
        deltas = agg_delta(
            changes, keys=self.keys, sum_cols=self.sum_cols
        ).select(
            *self.keys,
            F.col("n_delta").cast("long").alias("n"),
            *[F.col(f"{c}_delta").cast("double").alias(f"{c}_sum")
              for c in self.sum_cols],
        )
        if not self.state.exists():
            self.state.write(deltas)
        else:
            cond = " AND ".join(f"t.{k} <=> s.{k}" for k in self.keys)
            update = {"n": "t.n + s.n", **{
                f"{c}_sum": f"t.{c}_sum + s.{c}_sum" for c in self.sum_cols
            }}
            self.state.merge(deltas, cond, when_matched_update=update)
        # groups whose count netted to zero leave the view (dict-state
        # parity: a slot was dropped when it hit 0)
        if self.state.to_df().filter("n = 0").limit(1).count():
            self.state.delete("n = 0")
        applied = head - self._watermark
        self._watermark = head
        self.state.update_metadata({_WM_KEY: str(head)})
        return applied

    def to_df(self) -> DataFrame:
        if not self.state.exists():
            src_types = {f.name: f.dataType.simpleString()
                         for f in self.source.schema().fields}
            schema = ", ".join(
                [f"{c} {src_types.get(c, 'string')}" for c in self.keys]
                + ["n long"]
                + [f"{c}_sum double" for c in self.sum_cols]
            )
            return self.source.spark.createDataFrame([], schema)
        return self.state.to_df().select(
            *self.keys, "n",
            *[F.round(f"{c}_sum", 6).alias(f"{c}_sum")
              for c in self.sum_cols],
        )
