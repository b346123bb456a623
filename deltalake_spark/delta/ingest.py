"""Schemaless document ingestion: Python dicts -> typed DataFrame via
the reference's type-inference lattice (src/delta/table.ts:1289-1432):

    None            -> string (default; field stays nullable)
    bool            -> boolean
    int in int32    -> int32          (INT32_MIN..INT32_MAX)
    int beyond      -> int64          (reference: bigint -> int64)
    float           -> double
    str             -> string
    datetime / date -> timestamp      (reference: Date -> timestamp)
    bytes           -> binary         (reference: Uint8Array/ArrayBuffer)
    list / dict     -> variant        (stored as canonical JSON text,
                                       revived by functions/variant.py)

Divergence from the reference, documented: the reference types a field
from the FIRST non-null value and lets JS number coercion absorb
mixed-width numerics per file (table.ts:1309-1323); Spark columns are
strongly typed, so this module unifies across ALL rows with numeric
promotion (int32 < int64 < double) and raises ``ValidationError`` on
genuinely incompatible mixes instead of silently coercing.

Scale note: ``write_rows`` is the reference's small-document API shape
(a Python list is driver-resident by construction) — it is for
KB-to-MB control-plane batches; bulk ingestion goes through
``DeltaTable.write(df)`` which never materializes rows on the driver.
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Any, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from deltalake_spark.errors import ValidationError

INT32_MIN, INT32_MAX = -(2 ** 31), 2 ** 31 - 1
INT64_MIN, INT64_MAX = -(2 ** 63), 2 ** 63 - 1

_NUMERIC_RANK = {"int32": 0, "int64": 1, "double": 2}

_SPARK_TYPES = {
    "boolean": BooleanType(),
    "int32": IntegerType(),
    "int64": LongType(),
    "double": DoubleType(),
    "string": StringType(),
    "timestamp": TimestampNTZType(),
    "binary": BinaryType(),
    "variant": StringType(),  # canonical JSON text (reference: JSON type)
}


def infer_type(value: Any) -> str:
    """Lattice type of one value (reference inferType,
    table.ts:1337-1386). ``bool`` is checked before ``int`` — Python
    bools are int subclasses and must not infer as int32."""
    if value is None:
        return "string"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        if INT32_MIN <= value <= INT32_MAX:
            return "int32"
        if INT64_MIN <= value <= INT64_MAX:
            return "int64"
        raise ValidationError(
            f"integer {value} exceeds int64 range", field="value"
        )
    if isinstance(value, float):
        return "double"
    if isinstance(value, str):
        return "string"
    if isinstance(value, _dt.datetime):
        return "timestamp"
    if isinstance(value, _dt.date):
        return "timestamp"
    if isinstance(value, (bytes, bytearray, memoryview)):
        return "binary"
    if isinstance(value, (Mapping, list, tuple)):
        return "variant"
    raise ValidationError(
        f"cannot infer a type for {type(value).__name__!r}", field="value"
    )


def _unify(a: str, b: str, name: str) -> str:
    if a == b:
        return a
    ra, rb = _NUMERIC_RANK.get(a), _NUMERIC_RANK.get(b)
    if ra is not None and rb is not None:
        return a if ra >= rb else b
    raise ValidationError(
        f'Schema mismatch: field "{name}" has incompatible types '
        f"({a} vs {b})", field=name,
    )


def infer_schema(rows: "Iterable[Mapping[str, Any]]") -> "dict[str, str]":
    """Field name -> lattice type across ALL rows (sparse fields fine —
    reference inferSchemaFromRows scans every row's keys,
    table.ts:1289-1334). All-null fields default to string."""
    types: dict[str, str | None] = {}
    for i, row in enumerate(rows):
        if not isinstance(row, Mapping):
            raise ValidationError(
                f"row {i} is not a mapping: {type(row).__name__}",
                field="rows",
            )
        for name, value in row.items():
            if value is None:
                types.setdefault(name, None)
                continue
            t = infer_type(value)
            prev = types.get(name)
            types[name] = t if prev is None else _unify(prev, t, name)
    return {n: (t or "string") for n, t in types.items()}


def _normalize(value: Any, lattice: str) -> Any:
    if value is None:
        return None
    if lattice == "variant":
        # canonical JSON text; datetimes serialize as ISO strings
        return json.dumps(value, default=_json_default,
                          separators=(",", ":"), sort_keys=True)
    if lattice == "double":
        return float(value)
    if lattice == "int64":
        return int(value)
    if lattice == "timestamp":
        if isinstance(value, _dt.datetime):
            if value.tzinfo is not None:
                value = value.astimezone(_dt.timezone.utc) \
                    .replace(tzinfo=None)
            return value
        return _dt.datetime(value.year, value.month, value.day)
    if lattice == "binary":
        return bytes(value)
    if lattice == "string" and not isinstance(value, str):
        # all-null-so-far fields defaulted to string; a late non-string
        # value was already unified above, so this only hits true strings
        return str(value)
    return value


def _json_default(o: Any) -> Any:
    if isinstance(o, (_dt.datetime, _dt.date)):
        return o.isoformat()
    if isinstance(o, (bytes, bytearray, memoryview)):
        return bytes(o).hex()
    raise TypeError(f"not JSON serializable: {type(o).__name__}")


def rows_to_dataframe(
    spark: SparkSession, rows: "list[Mapping[str, Any]]",
) -> DataFrame:
    """Infer a schema, normalize values, and build a typed DataFrame.
    Field order: first-seen order across rows (deterministic)."""
    lattice = infer_schema(rows)
    schema = StructType([
        StructField(
            name, _SPARK_TYPES[t], True,
            {"deltalake_spark.variant": True} if t == "variant" else {},
        )
        for name, t in lattice.items()
    ])
    data = [
        tuple(_normalize(row.get(name), lattice[name])
              for name in lattice)
        for row in rows
    ]
    return spark.createDataFrame(data, schema)
