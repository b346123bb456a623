"""Kafka-style CDC consumer with offset tracking.

Mirrors the reference's CDCConsumer + OffsetStorage
(/root/reference/src/cdc/index.ts:709-1204, offset storage 502-596):
op/version/timestamp filters, ``seek_to``, commit/resume offsets, and
consumer groups (distinct offset records per group id).

The offset is the last *consumed commit version* — the exactly-once unit
of the reference's feed (ordering is by commit version, SURVEY §2.10).
Offsets persist through a pluggable storage; the file implementation keeps
one JSON per group (the Structured-Streaming equivalent is a checkpoint
dir per group, see ``deltalake_spark.delta.cdc.subscribe_stream``).
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING, Any, Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from deltalake_spark.delta.table import DeltaTable

CHANGE_TYPES = ("insert", "update_preimage", "update_postimage", "delete")


class OffsetStorage(Protocol):
    def load(self, group_id: str) -> int | None: ...
    def save(self, group_id: str, version: int) -> None: ...


class MemoryOffsetStorage:
    """In-process offsets (reference MemoryOffsetStorage,
    src/cdc/index.ts:545-596)."""

    def __init__(self) -> None:
        self._offsets: dict[str, int] = {}

    def load(self, group_id: str) -> int | None:
        return self._offsets.get(group_id)

    def save(self, group_id: str, version: int) -> None:
        self._offsets[group_id] = version


class FileOffsetStorage:
    """One JSON file per consumer group under ``offset_dir``."""

    def __init__(self, offset_dir: str) -> None:
        self.offset_dir = offset_dir
        os.makedirs(offset_dir, exist_ok=True)

    def _path(self, group_id: str) -> str:
        return os.path.join(self.offset_dir, f"{group_id}.json")

    def load(self, group_id: str) -> int | None:
        try:
            with open(self._path(group_id), encoding="utf-8") as f:
                return json.load(f)["version"]
        except (FileNotFoundError, KeyError, json.JSONDecodeError):
            return None

    def save(self, group_id: str, version: int) -> None:
        tmp = self._path(group_id) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self._path(group_id))


class CDCConsumer:
    """Pull-style change-feed consumer.

    >>> consumer = CDCConsumer(table, "analytics",
    ...                        storage=FileOffsetStorage(dir),
    ...                        ops=["insert", "delete"])
    >>> batch = consumer.poll()          # DataFrame of new changes
    >>> consumer.commit()                # persist high-water mark
    """

    def __init__(
        self,
        table: "DeltaTable",
        group_id: str,
        *,
        storage: OffsetStorage | None = None,
        ops: list[str] | None = None,
        starting_version: int = 0,
        auto_commit: bool = False,
    ) -> None:
        if ops:
            bad = set(ops) - set(CHANGE_TYPES)
            if bad:
                raise ValueError(f"Unknown change types: {sorted(bad)}")
        self.table = table
        self.group_id = group_id
        self.storage = storage or MemoryOffsetStorage()
        self.ops = list(ops) if ops else None
        self.auto_commit = auto_commit
        committed = self.storage.load(group_id)
        self._position = (
            committed + 1 if committed is not None else starting_version
        )
        self._last_polled: int | None = None

    @property
    def position(self) -> int:
        """Next commit version this consumer will read."""
        return self._position

    def committed(self) -> int | None:
        return self.storage.load(self.group_id)

    def seek_to(self, version: int) -> None:
        """Reposition (reference seekTo, src/cdc/index.ts:1060-1080)."""
        self._position = version

    def poll(self, max_versions: int | None = None) -> DataFrame:
        """Changes from the current position up to the table head (or
        ``max_versions`` commits), filtered to subscribed ops."""
        head = self.table.version()
        end = head if max_versions is None else min(
            head, self._position + max_versions - 1
        )
        df = self.table.read_changes(self._position, end)
        if self.ops is not None:
            df = df.filter(F.col("_change_type").isin(self.ops))
        self._last_polled = end
        if self.auto_commit:
            self.commit()
        return df

    def commit(self, version: int | None = None) -> None:
        """Persist the consumed high-water mark; next poll resumes after
        it (reference commitOffset/resume, src/cdc/index.ts:1090-1204)."""
        v = version if version is not None else self._last_polled
        if v is None:
            return
        self.storage.save(self.group_id, v)
        self._position = v + 1
