"""Mongo-style filter documents → Catalyst ``Column`` expressions.

Parity target: the reference's row-at-a-time matcher
(/root/reference/src/query/index.ts:255-494) and its filter validator
(/root/reference/src/delta/table.ts:1847-1893). Where the reference
interprets one row at a time in JS, we emit a single Column expression so
Catalyst gets predicate pushdown / partition pruning / codegen for free.

Semantics deliberately preserved from the reference:

- ``$ne`` matches rows where the field is null/missing
  (src/query/index.ts:387-389) → null-safe ``~(col <=> lit)``.
- ``$nin`` also passes nulls (src/query/index.ts:411-413)
  → ``~isin | isNull``.
- Range operators never match null (src/query/index.ts:443-455) — Spark's
  default comparison semantics already do this.
- ``$exists`` maps absent-or-undefined to Spark null
  (src/query/index.ts:415-417).
- ``$type`` is accepted but is a documented no-op in the reference (declared
  in the validator whitelist, no matcher case) → translated to ``lit(True)``.
- Unknown ``$`` operators are rejected with the supported-operator list,
  mirroring src/delta/table.ts:1847-1893.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

from deltalake_spark.errors import InvalidFilterError

LOGICAL_OPS = frozenset({"$and", "$or", "$not", "$nor"})
COMPARISON_OPS = frozenset(
    {"$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin",
     "$exists", "$regex", "$type", "$options",
     # array operators — engine-native extensions (the reference has no
     # array predicates beyond $in's membership test)
     "$size", "$all", "$elemMatch"}
)
VALID_OPS = LOGICAL_OPS | COMPARISON_OPS


def _field(path: str) -> Column:
    # Dot paths address struct fields natively (src/query/index.ts:312-328's
    # nested lookup); Spark's column resolution does the same walk.
    return F.col(path)


def _lit(value: Any) -> Column:
    if isinstance(value, _dt.datetime):
        return F.lit(value)
    return F.lit(value)


def _two_valued(cond: Column) -> Column:
    """Collapse Spark's three-valued logic to the reference's two-valued
    JS semantics (matchesFilter returns booleans, src/query/index.ts:
    255-297; null never satisfies a range, 443-455).

    Applied ONLY under negations ($not/$nor, and field-level $not): for
    plain AND/OR trees, a null predicate already behaves like false at the
    filter (row dropped), and leaving leaves unwrapped keeps them eligible
    for Parquet pushdown — coalesce-wrapped predicates produce
    ``PushedFilters: []``, a full scan at 100 TB.
    """
    return F.coalesce(cond, F.lit(False))


def _comparison(path: str, ops: Mapping[str, Any]) -> Column:
    conds: list[Column] = []
    col = _field(path)
    for op, operand in ops.items():
        if op == "$eq":
            conds.append(col == _lit(operand))
        elif op == "$ne":
            # null-safe: missing/null fields MATCH $ne in the reference
            conds.append(~col.eqNullSafe(_lit(operand)))
        elif op == "$gt":
            conds.append(col > _lit(operand))
        elif op == "$gte":
            conds.append(col >= _lit(operand))
        elif op == "$lt":
            conds.append(col < _lit(operand))
        elif op == "$lte":
            conds.append(col <= _lit(operand))
        elif op == "$in":
            if not isinstance(operand, (list, tuple)):
                raise InvalidFilterError(f"$in requires an array, got {operand!r}")
            conds.append(col.isin(list(operand)))
        elif op == "$nin":
            if not isinstance(operand, (list, tuple)):
                raise InvalidFilterError(f"$nin requires an array, got {operand!r}")
            # nulls pass $nin in the reference
            conds.append(~col.isin(list(operand)) | col.isNull())
        elif op == "$exists":
            conds.append(col.isNotNull() if operand else col.isNull())
        elif op == "$regex":
            pattern = operand.pattern if hasattr(operand, "pattern") else str(operand)
            if "i" in str(ops.get("$options", "")):
                pattern = f"(?i){pattern}"
            conds.append(col.rlike(pattern))
        elif op == "$options":
            continue  # consumed by $regex above
        elif op == "$type":
            # documented no-op in the reference — always passes
            conds.append(F.lit(True))
        elif op == "$size":
            if not isinstance(operand, int) or isinstance(operand, bool):
                raise InvalidFilterError(
                    f"$size requires an integer, got {operand!r}"
                )
            conds.append(F.size(col) == F.lit(operand))
        elif op == "$all":
            if not isinstance(operand, (list, tuple)):
                raise InvalidFilterError(
                    f"$all requires an array, got {operand!r}"
                )
            if not operand:
                # Mongo: {$all: []} matches NOTHING — falling through
                # would leave no condition and match everything
                conds.append(F.lit(False))
            for v in operand:
                conds.append(F.array_contains(col, _lit(v)))
        elif op == "$elemMatch":
            if not isinstance(operand, Mapping) or not operand:
                raise InvalidFilterError(
                    f"$elemMatch requires a non-empty mapping, got "
                    f"{operand!r}"
                )
            # condition over each element: {op: val} comparisons applied
            # to the element itself via exists() (stays JVM-side)
            def _elem_cond(e: Column) -> Column:
                sub: Column | None = None
                for eop, ev in operand.items():
                    if eop not in COMPARISON_OPS or eop in (
                            "$elemMatch", "$size", "$all"):
                        raise InvalidFilterError(
                            f"$elemMatch supports scalar comparison "
                            f"operators only, got {eop!r}"
                        )
                    if eop == "$eq":
                        c = e == _lit(ev)
                    elif eop == "$ne":
                        c = ~e.eqNullSafe(_lit(ev))
                    elif eop == "$gt":
                        c = e > _lit(ev)
                    elif eop == "$gte":
                        c = e >= _lit(ev)
                    elif eop == "$lt":
                        c = e < _lit(ev)
                    elif eop == "$lte":
                        c = e <= _lit(ev)
                    elif eop == "$in":
                        c = e.isin(list(ev))
                    elif eop == "$regex":
                        c = e.rlike(str(ev))
                    else:
                        raise InvalidFilterError(
                            f"$elemMatch does not support {eop!r}"
                        )
                    sub = c if sub is None else sub & c
                return sub if sub is not None else F.lit(True)

            conds.append(F.exists(col, _elem_cond))
        elif op == "$not":
            conds.append(~_two_valued(_comparison(path, operand)))
        else:
            raise InvalidFilterError(
                f"Unknown operator {op!r}. Supported: {sorted(VALID_OPS)}"
            )
    if not conds:
        return F.lit(True)
    result = conds[0]
    for c in conds[1:]:
        result = result & c
    return result


def _is_operator_object(value: Any) -> bool:
    return (
        isinstance(value, Mapping)
        and len(value) > 0
        and all(isinstance(k, str) and k.startswith("$") for k in value)
    )


def translate_filter(filter_doc: Mapping[str, Any] | None) -> Column:
    """Translate a Mongo-style filter document to a Column predicate.

    Empty / None filters match everything (reference: query() with no
    filter returns all rows, src/delta/table.ts:1482-1605).
    """
    if not filter_doc:
        return F.lit(True)
    if not isinstance(filter_doc, Mapping):
        raise InvalidFilterError(f"Filter must be a mapping, got {type(filter_doc)}")

    conds: list[Column] = []
    for key, value in filter_doc.items():
        if key.startswith("$"):
            if key == "$and":
                _require_list(key, value)
                sub = [translate_filter(v) for v in value]
                conds.append(_fold(sub, "and"))
            elif key == "$or":
                _require_list(key, value)
                sub = [translate_filter(v) for v in value]
                conds.append(_fold(sub, "or"))
            elif key == "$nor":
                _require_list(key, value)
                sub = [translate_filter(v) for v in value]
                conds.append(~_two_valued(_fold(sub, "or")))
            elif key == "$not":
                conds.append(~_two_valued(translate_filter(value)))
            else:
                raise InvalidFilterError(
                    f"Unknown logical operator {key!r}. "
                    f"Supported: {sorted(LOGICAL_OPS)}"
                )
        elif _is_operator_object(value):
            bad = [op for op in value if op not in COMPARISON_OPS and op != "$not"]
            if bad:
                raise InvalidFilterError(
                    f"Unknown operator(s) {bad} for field {key!r}. "
                    f"Supported: {sorted(COMPARISON_OPS)}"
                )
            conds.append(_comparison(key, value))
        else:
            # bare equality — strict === in the reference
            # (src/query/index.ts:290-293,383-385)
            conds.append(_field(key) == _lit(value))
    return _fold(conds, "and")


def _require_list(op: str, value: Any) -> None:
    if not isinstance(value, (list, tuple)) or not value:
        raise InvalidFilterError(f"{op} requires a non-empty array of filters")


def _fold(conds: list[Column], how: str) -> Column:
    if not conds:
        return F.lit(True)
    result = conds[0]
    for c in conds[1:]:
        result = (result & c) if how == "and" else (result | c)
    return result
