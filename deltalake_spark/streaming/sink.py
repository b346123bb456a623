"""Streaming → Delta sink with exactly-once semantics.

Structured Streaming's ``foreachBatch`` gives at-least-once delivery: a
failed/restarted query re-runs micro-batches. Delta's answer (and ours)
is the protocol's SetTransaction action: every sink commit carries
``{"txn": {appId, version=batch_id}}``; on replay the sink consults
``DeltaTable.last_txn_version(app_id)`` and skips batch ids already
committed — the commit and the watermark advance in ONE atomic log
entry, so a crash between "write data" and "record progress" cannot
double-apply a batch.

The reference has no streaming ingestion surface (its writes are
explicit calls, SURVEY §2.10); this is engine-native Spark-first
composition: watermarked/windowed/sessionized streams from
``streaming/windowed.py`` land in a Delta table that the rest of the
engine (CDC, MVs, maintenance) can see.

Scale shape: each micro-batch is one distributed write job (the driver
only stamps the log); upsert mode routes through the same MERGE used by
batch DML, rewriting only files containing matched keys.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

if TYPE_CHECKING:  # pragma: no cover
    from deltalake_spark.delta.table import DeltaTable

__all__ = ["delta_stream_sink"]


def delta_stream_sink(
    stream: DataFrame,
    table: "DeltaTable",
    *,
    app_id: str,
    mode: str = "append",
    merge_keys: list[str] | None = None,
    merge_update: Mapping[str, Any] | str | None = "*",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    await_termination: bool = True,
) -> StreamingQuery:
    """Run a streaming DataFrame into a Delta table via ``foreachBatch``.

    ``mode="append"``: exactly-once — each batch commit embeds a
    SetTransaction (``txn``) watermark and replayed batch ids are
    skipped.

    ``mode="upsert"``: MERGE on ``merge_keys`` per batch. MERGE is
    idempotent for deterministic batches (re-upserting identical rows
    reproduces the same state), giving effective exactly-once without a
    txn stamp.
    """
    if mode not in ("append", "upsert"):
        raise ValueError(f"unsupported sink mode {mode!r}")
    if mode == "upsert" and not merge_keys:
        raise ValueError("upsert mode requires merge_keys")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if mode == "append":
            if batch_id <= table.last_txn_version(app_id):
                return  # replayed batch — already committed atomically
            table.write(
                batch_df,
                _extra_actions=[{
                    "txn": {"appId": app_id, "version": int(batch_id)}
                }],
            )
        else:
            if not table.exists() or not batch_df.columns:
                table.write(batch_df)
                return
            cond = " AND ".join(f"t.{k} <=> s.{k}" for k in merge_keys)
            table.merge(batch_df, cond,
                        when_matched_update=merge_update)

    writer = stream.writeStream.foreachBatch(process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if await_termination and available_now:
        q.awaitTermination()
    return q
