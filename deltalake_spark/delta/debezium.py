"""Debezium-style CDC record surface over the change feed.

Parity target: the reference's cross-system ``CDCRecord`` family and
``CDCProducer`` (/root/reference/src/cdc/index.ts:38-93, 305-453):
records carry ``_id / _seq / _op / _before / _after / _ts / _source /
_txn`` with ``_op`` ∈ {c, u, d, r}, so a Debezium / Kafka-Connect
consumer can read the feed without knowing Delta-CDF conventions.

Spark-first shape: ``to_debezium`` / ``from_debezium`` are pure
DataFrame transformations over the CDF feed — update pre/post image
pairs collapse into single ``u`` records via a per-commit join, and the
``_seq`` LSN is ``commit_version * 2^32 + row_number-within-commit`` so
sequence assignment parallelizes per commit instead of forcing a global
single-partition sort. ``CDCProducer`` mirrors the reference's manual
driver-side record factory (monotonic ``_seq``, create/update/delete/
snapshot) for producers that originate records outside a table.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window

__all__ = ["to_debezium", "from_debezium", "CDCProducer"]

_META_COLS = ("_change_type", "_commit_version", "_commit_timestamp")


def _source_struct(system: str, database: str | None,
                   collection: str | None):
    return F.struct(
        F.lit(system).alias("system"),
        F.lit(database).cast("string").alias("database"),
        F.lit(collection).cast("string").alias("collection"),
    )


def to_debezium(
    changes: DataFrame,
    *,
    id_cols: list[str],
    system: str = "deltalake",
    database: str | None = None,
    collection: str | None = None,
) -> DataFrame:
    """Delta-CDF feed → Debezium-style records (reference CDCRecord,
    src/cdc/index.ts:38-93).

    insert → ``c`` (null ``_before``), delete → ``d`` (null ``_after``),
    update_preimage + update_postimage of the same key and commit →
    one ``u`` with both images.
    """
    data_fields = [f for f in changes.schema.fields
                   if f.name not in _META_COLS]
    data_names = [f.name for f in data_fields]
    data_type = StructType(data_fields)
    image = F.struct(*[F.col(c) for c in data_names])
    null_image = F.lit(None).cast(data_type)
    _id = F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols])

    base = changes.select(
        _id.alias("_id"),
        F.col("_commit_version").alias("__ver"),
        F.col("_commit_timestamp").alias("__ts"),
        F.col("_change_type").alias("__ct"),
        image.alias("__img"),
    )
    ins = base.filter(F.col("__ct") == "insert").select(
        "_id", "__ver", "__ts", F.lit("c").alias("_op"),
        null_image.alias("_before"), F.col("__img").alias("_after"),
    )
    dele = base.filter(F.col("__ct") == "delete").select(
        "_id", "__ver", "__ts", F.lit("d").alias("_op"),
        F.col("__img").alias("_before"), null_image.alias("_after"),
    )
    pre = base.filter(F.col("__ct") == "update_preimage").select(
        "_id", "__ver", F.col("__img").alias("_before"),
    )
    post = base.filter(F.col("__ct") == "update_postimage").select(
        "_id", "__ver", "__ts", F.col("__img").alias("_after"),
    )
    upd = post.join(pre, ["_id", "__ver"], "left").select(
        "_id", "__ver", "__ts", F.lit("u").alias("_op"),
        "_before", "_after",
    )
    rec = ins.unionByName(dele).unionByName(upd)

    # LSN: per-commit row_number keeps assignment parallel (no global sort)
    w = Window.partitionBy("__ver").orderBy("_op", "_id")
    return rec.select(
        "_id",
        (F.col("__ver") * F.lit(1 << 32).cast("long")
         + F.row_number().over(w)).alias("_seq"),
        "_op", "_before", "_after",
        (F.unix_micros("__ts") * F.lit(1000)).alias("_ts"),
        _source_struct(system, database, collection).alias("_source"),
        F.col("__ver").cast("string").alias("_txn"),
    )


def from_debezium(records: DataFrame) -> DataFrame:
    """Debezium-style records → Delta-CDF rows (inverse of
    ``to_debezium``): ``c``/``r`` → insert, ``d`` → delete, ``u`` →
    update_preimage + update_postimage pair."""
    data_type = records.schema["_after"].dataType
    data_names = [f.name for f in data_type.fields]

    def _variant(ct: str, img) -> Any:
        return F.struct(F.lit(ct).alias("ct"), img.alias("img"))

    variants = (
        F.when(F.col("_op") == "u", F.array(
            _variant("update_preimage", F.col("_before")),
            _variant("update_postimage", F.col("_after")),
        ))
        .when(F.col("_op") == "d",
              F.array(_variant("delete", F.col("_before"))))
        .otherwise(F.array(_variant("insert", F.col("_after"))))
    )
    # integer `div`, not float `/`: ns since epoch (~1.7e18) exceeds a
    # double's 2^53 exact-integer range, so float division drifts the
    # last microsecond and breaks the round-trip (seen as a 1 us flake)
    ver = F.coalesce(
        F.col("_txn").cast("long"),
        F.expr(f"_seq div {1 << 32}"),
    )
    exploded = records.select(
        F.explode(variants).alias("__v"),
        ver.alias("_commit_version"),
        F.timestamp_micros(F.expr("_ts div 1000"))
        .alias("_commit_timestamp"),
    )
    return exploded.select(
        *[F.col(f"__v.img.{c}").alias(c) for c in data_names],
        F.col("__v.ct").alias("_change_type"),
        "_commit_version", "_commit_timestamp",
    )


class CDCProducer:
    """Manual driver-side producer of Debezium-style records (reference
    CDCProducer, src/cdc/index.ts:305-453): a monotonic ``_seq`` factory
    for records that originate OUTSIDE a Delta table (the table write
    path generates CDF itself — see delta/cdc.py). Records are plain
    dicts; hand a batch to ``spark.createDataFrame`` or compose with
    ``from_debezium`` to feed a table."""

    def __init__(self, *, system: str = "deltalake",
                 database: str | None = None,
                 collection: str | None = None,
                 partition: int | None = None,
                 server_id: str | None = None):
        self._seq = 0
        self._source = {
            "system": system, "database": database,
            "collection": collection, "partition": partition,
            "serverId": server_id,
        }

    def get_sequence(self) -> int:
        return self._seq

    def reset_sequence(self, seq: int = 0) -> None:
        self._seq = seq

    def emit(self, op: str, id: str, before: Any, after: Any,
             txn: str | None = None) -> dict[str, Any]:
        if op not in ("c", "u", "d", "r"):
            raise ValueError(f"invalid CDC operation {op!r}")
        record = {
            "_id": str(id),
            "_seq": self._seq,
            "_op": op,
            "_before": before,
            "_after": after,
            "_ts": time.time_ns(),
            "_source": dict(self._source),
        }
        if txn is not None:
            record["_txn"] = txn
        self._seq += 1
        return record

    def create(self, id: str, data: Any,
               txn: str | None = None) -> dict[str, Any]:
        return self.emit("c", id, None, data, txn)

    def update(self, id: str, before: Any, after: Any,
               txn: str | None = None) -> dict[str, Any]:
        return self.emit("u", id, before, after, txn)

    def delete(self, id: str, before: Any,
               txn: str | None = None) -> dict[str, Any]:
        return self.emit("d", id, before, None, txn)

    def snapshot(self, records: list[tuple[str, Any]]) -> list[dict[str, Any]]:
        """Bulk read-snapshot (``r``) records for initial sync."""
        return [self.emit("r", id, None, data) for id, data in records]
