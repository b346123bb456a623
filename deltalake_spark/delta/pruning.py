"""File-level data skipping: prune snapshot files by partition values and
per-file min/max stats BEFORE building the scan.

The reference prunes by partition values only ($eq/$in,
/root/reference/src/delta/table.ts:1624-1687) and merely *scaffolds*
stats-based zone-map skipping without wiring it into query()
(SURVEY §4). We do both for real: an eliminated file never appears in
the reader's path list, so at 100 TB a selective filter touches a
fraction of the data before Spark even plans the scan (this composes
with — it does not replace — Parquet row-group skipping inside the
files that remain).

Only provably-disjoint files are dropped: unknown ops, missing stats,
or type mismatches keep the file (pruning must never change results).
"""

from __future__ import annotations

from typing import Any, Mapping

__all__ = ["extract_predicates", "prune_files"]

_RANGE_OPS = ("$eq", "$gt", "$gte", "$lt", "$lte", "$in")


def extract_predicates(
    filter_doc: Mapping[str, Any] | None,
) -> list[tuple[str, str, Any]]:
    """Top-level AND-semantics predicates usable for pruning:
    (column, op, value). $and branches are merged; $or/$not/$nor and
    unknown ops contribute nothing (conservative)."""
    preds: list[tuple[str, str, Any]] = []
    if not filter_doc:
        return preds
    for key, value in filter_doc.items():
        if key == "$and" and isinstance(value, list):
            for sub in value:
                preds.extend(extract_predicates(sub))
        elif key.startswith("$"):
            continue  # $or/$nor/$not: no sound file-level pruning
        elif isinstance(value, Mapping) and value and \
                all(k.startswith("$") for k in value):
            for op, operand in value.items():
                if op in _RANGE_OPS:
                    preds.append((key, op, operand))
        elif not isinstance(value, Mapping):
            preds.append((key, "$eq", value))
    return preds


def _comparable(a: Any, b: Any) -> bool:
    num = (int, float)
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool)
    if isinstance(a, num) and isinstance(b, num):
        return True
    return isinstance(a, str) and isinstance(b, str)


def _range_disjoint(op: str, v: Any, mn: Any, mx: Any) -> bool:
    """True only when NO value in [mn, mx] can satisfy ``op v``."""
    if op == "$eq":
        return (mn is not None and _comparable(v, mn) and v < mn) or \
               (mx is not None and _comparable(v, mx) and v > mx)
    if op == "$gt":
        return mx is not None and _comparable(v, mx) and mx <= v
    if op == "$gte":
        return mx is not None and _comparable(v, mx) and mx < v
    if op == "$lt":
        return mn is not None and _comparable(v, mn) and mn >= v
    if op == "$lte":
        return mn is not None and _comparable(v, mn) and mn > v
    if op == "$in":
        if not isinstance(v, (list, tuple)):
            return False
        return all(_range_disjoint("$eq", x, mn, mx) for x in v) \
            if v else True
    return False


def _file_can_match(
    add: Mapping[str, Any],
    preds: list[tuple[str, str, Any]],
    partition_cols: list[str],
) -> bool:
    import json

    pv = add.get("partitionValues") or {}
    stats = add.get("stats")
    stats = json.loads(stats) if isinstance(stats, str) else (stats or {})
    mins = stats.get("minValues", {})
    maxs = stats.get("maxValues", {})

    for col, op, v in preds:
        if col in partition_cols:
            # partition values are strings (Hive dirs); string-compare
            val = pv.get(col)
            if val is None:
                # null partition: $eq/$in with non-null operands can
                # never match (engine equality excludes nulls, matching
                # Mongo bare-equality semantics); other ops stay
                # conservative
                if op == "$eq" and v is not None:
                    return False
                if op == "$in" and isinstance(v, (list, tuple)) and \
                        None not in v:
                    return False
                continue
            if op == "$eq" and str(v) != val:
                return False
            if op == "$in" and isinstance(v, (list, tuple)) and \
                    all(str(x) != val for x in v):
                return False
            continue
        if _range_disjoint(op, v, mins.get(col), maxs.get(col)):
            return False
    return True


def prune_files(
    files: list[dict[str, Any]],
    filter_doc: Mapping[str, Any] | None,
    partition_cols: list[str],
    column_mapping: Mapping[str, str] | None = None,
) -> tuple[list[dict[str, Any]], int]:
    """(surviving add actions, number skipped).

    ``column_mapping`` translates logical predicate columns to physical
    parquet names — add-action stats are keyed by physical names, and
    after a rename + schema-evolution write that reuses the retired
    logical name, the logical and physical namespaces genuinely diverge
    (pruning against the wrong column's stats would silently drop files).
    """
    preds = extract_predicates(filter_doc)
    if column_mapping:
        preds = [(column_mapping.get(c, c), op, v) for c, op, v in preds]
    if not preds:
        return list(files), 0
    kept = [f for f in files if _file_can_match(f, preds, partition_cols)]
    return kept, len(files) - len(kept)
