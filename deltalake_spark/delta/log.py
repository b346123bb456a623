"""Transaction log: NDJSON commit files + optimistic concurrency.

Log layout mirrors the reference (/root/reference/src/delta/index.ts:1-729,
version formatting src/utils/index.ts:140-184):

    <table>/_delta_log/00000000000000000000.json     # NDJSON actions
    <table>/_delta_log/00000000000000000010.checkpoint.parquet
    <table>/_delta_log/_last_checkpoint               # {"version": N}

Actions (src/delta/types.ts:61-126): ``add``, ``remove``, ``metaData``,
``protocol``, ``commitInfo`` — one JSON object per line.

Commits are atomic via create-if-not-exists (``O_CREAT|O_EXCL``), the POSIX
equivalent of the reference's conditional PUT
(src/storage/types.ts:208, src/delta/table.ts:795-816). A lost race raises
:class:`ConcurrencyError` exactly like the reference's version-conflict path
(src/delta/table.ts:807-814).
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Any, Iterator

from deltalake_spark.errors import (
    ConcurrencyError,
    TableNotFoundError,
    ValidationError,
)

LOG_DIR = "_delta_log"
_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
# single-part:  <v>.checkpoint.parquet
# multi-part:   <v>.checkpoint.<part>.<total>.parquet  (reference
# multi-part checkpoints, src/delta/checkpoint.ts:250-340)
_CHECKPOINT_RE = re.compile(
    r"^(\d{20})\.checkpoint(?:\.(\d{10})\.(\d{10}))?\.parquet$"
)


def log_dir(table_path: str) -> str:
    return os.path.join(table_path, LOG_DIR)


def commit_file(table_path: str, version: int) -> str:
    return os.path.join(log_dir(table_path), f"{version:020d}.json")


def checkpoint_file(table_path: str, version: int) -> str:
    return os.path.join(log_dir(table_path), f"{version:020d}.checkpoint.parquet")


def checkpoint_part_file(table_path: str, version: int,
                         part: int, total: int) -> str:
    return os.path.join(
        log_dir(table_path),
        f"{version:020d}.checkpoint.{part:010d}.{total:010d}.parquet",
    )


def checkpoint_files(table_path: str, version: int) -> list[str]:
    """All parquet files of the checkpoint at ``version`` (one for
    single-part, ``total`` for multi-part), sorted by part."""
    d = log_dir(table_path)
    out = []
    for f in os.listdir(d):
        m = _CHECKPOINT_RE.match(f)
        if m and int(m.group(1)) == version:
            out.append((int(m.group(2) or 0), os.path.join(d, f)))
    return [p for _i, p in sorted(out)]


def last_checkpoint_file(table_path: str) -> str:
    return os.path.join(log_dir(table_path), "_last_checkpoint")


def table_exists(table_path: str) -> bool:
    d = log_dir(table_path)
    return os.path.isdir(d) and any(
        _COMMIT_RE.match(f) or _CHECKPOINT_RE.match(f) for f in os.listdir(d)
    )


def list_commit_versions(table_path: str) -> list[int]:
    d = log_dir(table_path)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(m.group(1))
        for f in os.listdir(d)
        if (m := _COMMIT_RE.match(f))
    )


def list_checkpoint_versions(table_path: str) -> list[int]:
    d = log_dir(table_path)
    if not os.path.isdir(d):
        return []
    return sorted({
        int(m.group(1))
        for f in os.listdir(d)
        if (m := _CHECKPOINT_RE.match(f))
    })


def latest_version(table_path: str) -> int:
    versions = list_commit_versions(table_path)
    cps = list_checkpoint_versions(table_path)
    candidates = versions + cps
    if not candidates:
        return -1
    return max(candidates)


def read_commit(table_path: str, version: int) -> list[dict[str, Any]]:
    path = commit_file(table_path, version)
    actions = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                actions.append(json.loads(line))
    return actions


def validate_action(action: dict[str, Any]) -> list[str]:
    """Structural validation of a single log action (reference
    validateAction, src/delta/index.ts:353-452): returns a list of
    problems, empty when valid. Protects the log from malformed
    raw/foreign commits — our own writers always produce valid shapes."""
    errors: list[str] = []
    if not isinstance(action, dict) or len(action) != 1:
        return ["action must be a single-key object"]
    kind, body = next(iter(action.items()))
    if not isinstance(body, dict):
        return [f"{kind} body must be an object"]
    if kind == "add":
        if not body.get("path"):
            errors.append("add.path must not be empty")
        if body.get("size", 0) < 0:
            errors.append("add.size must be non-negative")
        if body.get("modificationTime", 0) < 0:
            errors.append("add.modificationTime must be non-negative")
        if "stats" in body and body["stats"] is not None:
            try:
                parsed = json.loads(body["stats"])
                if not isinstance(parsed, dict):
                    errors.append("add.stats must be a JSON object")
            except (TypeError, ValueError):
                errors.append("add.stats must be valid JSON")
    elif kind == "remove":
        if not body.get("path"):
            errors.append("remove.path must not be empty")
        if body.get("deletionTimestamp", 0) < 0:
            errors.append("remove.deletionTimestamp must be non-negative")
    elif kind == "metaData":
        if not body.get("id"):
            errors.append("metaData.id must not be empty")
        fmt = body.get("format") or {}
        if not fmt.get("provider"):
            errors.append("metaData.format.provider must not be empty")
        if "schemaString" in body and body["schemaString"]:
            try:
                json.loads(body["schemaString"])
            except (TypeError, ValueError):
                errors.append("metaData.schemaString must be valid JSON")
    elif kind == "protocol":
        for k in ("minReaderVersion", "minWriterVersion"):
            v = body.get(k)
            if not isinstance(v, int) or isinstance(v, bool):
                errors.append(f"protocol.{k} must be an integer")
            elif v < 1:
                errors.append(f"protocol.{k} must be at least 1")
    elif kind == "commitInfo":
        if body.get("timestamp", 0) < 0:
            errors.append("commitInfo.timestamp must be non-negative")
        if not body.get("operation"):
            errors.append("commitInfo.operation must not be empty")
    elif kind == "txn":
        if not body.get("appId"):
            errors.append("txn.appId must not be empty")
        if not isinstance(body.get("version"), int):
            errors.append("txn.version must be an integer")
    else:
        errors.append(f"unknown action type {kind!r}")
    return errors


def write_commit(
    table_path: str, version: int, actions: list[dict[str, Any]],
    *, validate: bool = True,
) -> None:
    """Atomically create commit file ``version``; raise ConcurrencyError if
    another writer got there first. Actions are structurally validated
    first (``validate=False`` to skip, e.g. replaying a trusted log)."""
    if validate:
        problems = [
            p for a in actions for p in validate_action(a)
        ]
        if problems:
            raise ValidationError(
                "invalid commit actions: " + "; ".join(problems[:8]),
                field="actions",
            )
    os.makedirs(log_dir(table_path), exist_ok=True)
    path = commit_file(table_path, version)
    payload = "\n".join(json.dumps(a, separators=(",", ":")) for a in actions)
    # the OCC race is decided by ONE conditional write, routed through
    # the pluggable CommitStore seam (reference writeConditional,
    # src/storage/types.ts:208) so object stores without atomic
    # create-if-absent can supply their own precondition mapping
    from deltalake_spark.delta.commitstore import (
        CommitConflictError,
        get_commit_store,
    )

    try:
        get_commit_store().write_if_absent(path, payload.encode("utf-8"))
    except CommitConflictError:
        raise ConcurrencyError(table_path, version) from None


def iter_commits(
    table_path: str, start: int, end: int
) -> Iterator[tuple[int, list[dict[str, Any]]]]:
    """Yield (version, actions) for versions in [start, end] that exist."""
    for v in list_commit_versions(table_path):
        if start <= v <= end:
            yield v, read_commit(table_path, v)


def commit_info_action(operation: str, parameters: dict[str, Any] | None = None,
                       **metrics: Any) -> dict[str, Any]:
    return {
        "commitInfo": {
            "timestamp": int(time.time() * 1000),
            "operation": operation,
            "operationParameters": parameters or {},
            "operationMetrics": {k: v for k, v in metrics.items()
                                 if v is not None},
            "engineInfo": "deltalake-spark/0.1.0",
        }
    }


def protocol_action(min_reader: int = 1,
                    min_writer: int = 2) -> dict[str, Any]:
    return {"protocol": {"minReaderVersion": min_reader,
                         "minWriterVersion": min_writer}}


def metadata_action(
    table_id: str,
    schema_string: str,
    partition_columns: list[str],
    configuration: dict[str, str] | None = None,
) -> dict[str, Any]:
    return {
        "metaData": {
            "id": table_id,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": list(partition_columns),
            "configuration": dict(configuration or {}),
            "createdTime": int(time.time() * 1000),
        }
    }


def require_table(table_path: str) -> None:
    if not table_exists(table_path):
        raise TableNotFoundError(f"No Delta table at {table_path}")
