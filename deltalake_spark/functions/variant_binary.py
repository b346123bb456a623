"""Parquet VARIANT binary codec + shredding writer.

Parity target: the reference's full binary Variant implementation
(/root/reference/src/parquet/variant.ts:80-217 encode, 447-684 decode)
and its shredding helpers (src/parquet/index.ts:290-326). Both follow
the public Apache Parquet VariantEncoding / VariantShredding specs:
https://github.com/apache/parquet-format/blob/master/VariantEncoding.md

Layout summary (little-endian throughout):

- **metadata**: ``0x01 | ((offset_size-1) << 6)`` header, dictionary
  size, ``n+1`` offsets, then the concatenated UTF-8 key bytes.
- **value**: self-describing. ``header & 0x03`` selects primitive (0),
  short string (1), object (2) or array (3); primitives carry a 6-bit
  type id (null/bool/int8..64/double/timestamp-micros/binary/long-str).

Spark-first shape: the codec itself is plain Python over ``bytes`` (it
is a per-row binary format — there is nothing to vectorize JVM-side),
and it enters plans only through Arrow-batched pandas UDFs
(:func:`encode_variant_udf` / :func:`decode_variant_udf`), never
row-at-a-time Python UDFs. Shredded *typed* subcolumns are real Spark
columns extracted with JVM-side ``from_json`` so Parquet writes genuine
column chunks with min/max stats — scans filtering on a shredded path
get row-group skipping and predicate pushdown for free, which is the
entire point of the reference's shredding machinery.
"""

from __future__ import annotations

import datetime as _dt
import json
import struct as _struct
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "encode_variant",
    "decode_variant",
    "encode_variant_udf",
    "decode_variant_udf",
    "shred_to_binary",
    "get_statistics_paths",
    "map_filter_path_to_stats",
]

_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


class VariantError(ValueError):
    """Malformed or unsupported variant data."""


# ---------------------------------------------------------------------------
# encode (reference encodeVariant, variant.ts:80-217)
# ---------------------------------------------------------------------------

def _collect_keys(value: Any, dictionary: list[str],
                  index: dict[str, int]) -> None:
    # only object KEYS enter the metadata dictionary (reference
    # collectStrings, variant.ts:98-123)
    if isinstance(value, dict):
        for k, v in value.items():
            if not isinstance(k, str):
                raise VariantError(f"object keys must be strings, got {k!r}")
            if k not in index:
                index[k] = len(dictionary)
                dictionary.append(k)
            _collect_keys(v, dictionary, index)
    elif isinstance(value, (list, tuple)):
        for item in value:
            _collect_keys(item, dictionary, index)


def _uint(value: int, width: int) -> bytes:
    return value.to_bytes(width, "little")


def _offset_width(total: int) -> int:
    return 1 if total <= 0xFF else 2 if total <= 0xFFFF else 4


def _encode_metadata(dictionary: list[str]) -> bytes:
    if not dictionary:
        return b"\x01\x00"
    blobs = [s.encode("utf-8") for s in dictionary]
    total = sum(len(b) for b in blobs)
    w = _offset_width(total)
    out = bytearray([0x01 | ((w - 1) << 6)])
    out += _uint(len(dictionary), w)
    off = 0
    for b in blobs:
        out += _uint(off, w)
        off += len(b)
    out += _uint(off, w)
    for b in blobs:
        out += b
    return bytes(out)


def _encode_value(value: Any, index: dict[str, int]) -> bytes:
    if value is None:
        return b"\x00"
    if isinstance(value, bool):  # before int: bool is an int subclass
        return b"\x04" if value else b"\x08"
    if isinstance(value, int):
        return _encode_int(value)
    if isinstance(value, float):
        return b"\x1c" + _struct.pack("<d", value)
    if isinstance(value, str):
        return _encode_str(value)
    if isinstance(value, _dt.datetime):
        if value.tzinfo is None:
            value = value.replace(tzinfo=_dt.timezone.utc)
        micros = round((value - _EPOCH).total_seconds() * 1_000_000)
        return b"\x30" + _struct.pack("<q", micros)
    if isinstance(value, (bytes, bytearray)):
        return b"\x3c" + _struct.pack("<I", len(value)) + bytes(value)
    if isinstance(value, (list, tuple)):
        return _encode_array(list(value), index)
    if isinstance(value, dict):
        return _encode_object(value, index)
    raise VariantError(f"unsupported variant type {type(value).__name__}")


def _encode_int(value: int) -> bytes:
    if -0x80 <= value <= 0x7F:
        return b"\x0c" + _struct.pack("<b", value)
    if -0x8000 <= value <= 0x7FFF:
        return b"\x10" + _struct.pack("<h", value)
    if -0x8000_0000 <= value <= 0x7FFF_FFFF:
        return b"\x14" + _struct.pack("<i", value)
    if -(1 << 63) <= value <= (1 << 63) - 1:
        return b"\x18" + _struct.pack("<q", value)
    raise VariantError(f"integer out of int64 range: {value}")


def _encode_str(value: str) -> bytes:
    blob = value.encode("utf-8")
    if len(blob) < 64:
        return bytes([0x01 | (len(blob) << 2)]) + blob
    return b"\x40" + _struct.pack("<I", len(blob)) + blob


def _encode_array(items: list, index: dict[str, int]) -> bytes:
    blobs = [_encode_value(v, index) for v in items]
    total = sum(len(b) for b in blobs)
    w = _offset_width(total)
    large = len(items) > 0xFF
    out = bytearray([0x03 | ((w - 1) << 2) | (0x10 if large else 0)])
    out += _uint(len(items), 4 if large else 1)
    off = 0
    for b in blobs:
        out += _uint(off, w)
        off += len(b)
    out += _uint(off, w)
    for b in blobs:
        out += b
    return bytes(out)


def _encode_object(value: dict, index: dict[str, int]) -> bytes:
    keys = sorted(value.keys(), key=lambda k: index[k])
    blobs = [_encode_value(value[k], index) for k in keys]
    total = sum(len(b) for b in blobs)
    max_id = max((index[k] for k in keys), default=0)
    id_w = _offset_width(max_id)
    w = _offset_width(total)
    large = len(keys) > 0xFF
    out = bytearray([
        0x02 | ((w - 1) << 2) | ((id_w - 1) << 4) | (0x40 if large else 0)
    ])
    out += _uint(len(keys), 4 if large else 1)
    for k in keys:
        out += _uint(index[k], id_w)
    off = 0
    for b in blobs:
        out += _uint(off, w)
        off += len(b)
    out += _uint(off, w)
    for b in blobs:
        out += b
    return bytes(out)


def encode_variant(value: Any) -> tuple[bytes, bytes]:
    """Encode a JSON-compatible Python value as Parquet Variant binary.

    Returns ``(metadata, value)`` — the string dictionary and the
    self-describing value bytes (reference encodeVariant,
    variant.ts:80-96).
    """
    dictionary: list[str] = []
    index: dict[str, int] = {}
    _collect_keys(value, dictionary, index)
    return _encode_metadata(dictionary), _encode_value(value, index)


# ---------------------------------------------------------------------------
# decode (reference decodeVariant, variant.ts:447-684)
# ---------------------------------------------------------------------------

def _read_uint(data: bytes, pos: int, width: int) -> int:
    return int.from_bytes(data[pos:pos + width], "little")


def _decode_metadata(metadata: bytes) -> list[str]:
    if len(metadata) < 2:
        return []
    w = ((metadata[0] >> 6) & 0x03) + 1
    pos = 1
    n = _read_uint(metadata, pos, w)
    pos += w
    if n == 0:
        return []
    offsets = [_read_uint(metadata, pos + i * w, w) for i in range(n + 1)]
    base = pos + (n + 1) * w
    return [
        metadata[base + offsets[i]:base + offsets[i + 1]].decode("utf-8")
        for i in range(n)
    ]


def _need(data: bytes, pos: int, n: int, what: str) -> None:
    if pos + n > len(data):
        raise VariantError(f"malformed variant: insufficient bytes for {what}")


def _decode_value(data: bytes, pos: int,
                  dictionary: list[str]) -> tuple[Any, int]:
    _need(data, pos, 1, "header")
    header = data[pos]
    basic = header & 0x03
    if basic == 0:
        return _decode_primitive(data, pos, (header >> 2) & 0x3F)
    if basic == 1:  # short string
        n = (header >> 2) & 0x3F
        _need(data, pos + 1, n, "short string")
        return data[pos + 1:pos + 1 + n].decode("utf-8"), 1 + n
    if basic == 2:
        return _decode_object(data, pos, dictionary)
    return _decode_array(data, pos, dictionary)


def _decode_primitive(data: bytes, pos: int, tid: int) -> tuple[Any, int]:
    if tid == 0:
        return None, 1
    if tid == 1:
        return True, 1
    if tid == 2:
        return False, 1
    if tid == 3:
        _need(data, pos, 2, "INT8")
        return _struct.unpack_from("<b", data, pos + 1)[0], 2
    if tid == 4:
        _need(data, pos, 3, "INT16")
        return _struct.unpack_from("<h", data, pos + 1)[0], 3
    if tid == 5:
        _need(data, pos, 5, "INT32")
        return _struct.unpack_from("<i", data, pos + 1)[0], 5
    if tid == 6:
        _need(data, pos, 9, "INT64")
        return _struct.unpack_from("<q", data, pos + 1)[0], 9
    if tid == 7:
        _need(data, pos, 9, "DOUBLE")
        return _struct.unpack_from("<d", data, pos + 1)[0], 9
    if tid == 12:
        _need(data, pos, 9, "TIMESTAMP_MICROS")
        micros = _struct.unpack_from("<q", data, pos + 1)[0]
        return _EPOCH + _dt.timedelta(microseconds=micros), 9
    if tid == 15:
        _need(data, pos, 5, "BINARY length")
        n = _struct.unpack_from("<I", data, pos + 1)[0]
        _need(data, pos + 5, n, "BINARY data")
        return data[pos + 5:pos + 5 + n], 5 + n
    if tid == 16:
        _need(data, pos, 5, "LONG_STRING length")
        n = _struct.unpack_from("<I", data, pos + 1)[0]
        _need(data, pos + 5, n, "LONG_STRING data")
        return data[pos + 5:pos + 5 + n].decode("utf-8"), 5 + n
    raise VariantError(f"unknown primitive type id {tid}")


def _decode_object(data: bytes, pos: int,
                   dictionary: list[str]) -> tuple[Any, int]:
    header = data[pos]
    w = ((header >> 2) & 0x03) + 1
    id_w = ((header >> 4) & 0x03) + 1
    large = bool(header & 0x40)
    p = pos + 1
    n = _read_uint(data, p, 4 if large else 1)
    p += 4 if large else 1
    ids = [_read_uint(data, p + i * id_w, id_w) for i in range(n)]
    p += n * id_w
    offsets = [_read_uint(data, p + i * w, w) for i in range(n + 1)]
    p += (n + 1) * w
    obj = {}
    for i in range(n):
        key = (dictionary[ids[i]] if ids[i] < len(dictionary)
               else f"__field_{ids[i]}")
        obj[key], _ = _decode_value(data, p + offsets[i], dictionary)
    return obj, p + offsets[n] - pos


def _decode_array(data: bytes, pos: int,
                  dictionary: list[str]) -> tuple[Any, int]:
    header = data[pos]
    w = ((header >> 2) & 0x03) + 1
    large = bool(header & 0x10)
    p = pos + 1
    n = _read_uint(data, p, 4 if large else 1)
    p += 4 if large else 1
    offsets = [_read_uint(data, p + i * w, w) for i in range(n + 1)]
    p += (n + 1) * w
    arr = [
        _decode_value(data, p + offsets[i], dictionary)[0] for i in range(n)
    ]
    return arr, p + offsets[n] - pos


def decode_variant(metadata: bytes, value: bytes) -> Any:
    """Inverse of :func:`encode_variant` (reference decodeVariant,
    variant.ts:447-451)."""
    return _decode_value(bytes(value), 0, _decode_metadata(bytes(metadata)))[0]


# ---------------------------------------------------------------------------
# Spark plumbing: Arrow-batched UDFs + shredding writer
# ---------------------------------------------------------------------------

_VARIANT_STRUCT = "metadata: binary, value: binary"


def _json_default(o: Any) -> Any:
    if isinstance(o, (bytes, bytearray)):
        return o.hex()
    if isinstance(o, _dt.datetime):
        return o.isoformat()
    raise TypeError(type(o).__name__)


def encode_variant_udf(json_col: Column | str) -> Column:
    """JSON-string column → ``struct<metadata binary, value binary>``
    (Arrow-batched pandas UDF — per-row binary packing can't run
    JVM-side, but the transfer is vectorized)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_VARIANT_STRUCT)
    def _enc(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in batches:
            metas, vals = [], []
            for doc in s:
                if doc is None:
                    metas.append(None)
                    vals.append(None)
                else:
                    m, v = encode_variant(json.loads(doc))
                    metas.append(m)
                    vals.append(v)
            yield pd.DataFrame({"metadata": metas, "value": vals})

    c = F.col(json_col) if isinstance(json_col, str) else json_col
    return _enc(c)


def decode_variant_udf(variant_col: Column | str) -> Column:
    """``struct<metadata,value>`` → canonical JSON string."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        for df in batches:
            out = []
            for m, v in zip(df["metadata"], df["value"]):
                if m is None or v is None:
                    out.append(None)
                else:
                    out.append(json.dumps(
                        decode_variant(bytes(m), bytes(v)),
                        separators=(",", ":"), sort_keys=True,
                        default=_json_default,
                    ))
            yield pd.Series(out, dtype=object)

    c = F.col(variant_col) if isinstance(variant_col, str) else variant_col
    return _dec(c)


def shred_to_binary(
    df: DataFrame,
    json_col: str,
    out_col: str,
    field_types: dict[str, str],
) -> DataFrame:
    """Build a shredded binary-variant column per the VariantShredding
    layout the reference tracks (src/parquet/index.ts:283-326):

    ``out_col = struct<metadata binary, value binary,
    typed_value struct<f: struct<typed_value T>, ...>>``

    The typed subcolumns are extracted JVM-side (``from_json``), so when
    the result is written to Parquet each shredded path gets a real
    column chunk with min/max statistics — filterable and prunable. The
    binary pair keeps full fidelity for non-shredded paths.
    """
    ddl = ", ".join(f"`{f}` {t}" for f, t in field_types.items())
    parsed = F.from_json(F.col(json_col), ddl)
    typed = F.struct(*[
        F.struct(parsed[f].alias("typed_value")).alias(f)
        for f in field_types
    ])
    # materialize the UDF result once (a shared projected column), then
    # restructure — inlining it twice would run the encode UDF twice
    bin_col = f"__{out_col}_bin"
    return (
        df.withColumn(bin_col, encode_variant_udf(json_col))
        .withColumn(out_col, F.struct(
            F.col(f"{bin_col}.metadata").alias("metadata"),
            F.col(f"{bin_col}.value").alias("value"),
            typed.alias("typed_value"),
        ))
        .drop(bin_col)
    )


def get_statistics_paths(column_name: str, shred_fields: list[str]) -> list[str]:
    """Column paths carrying stats after shredding (reference
    getStatisticsPaths, src/parquet/index.ts:298-304)."""
    return [f"{column_name}.typed_value.{f}.typed_value"
            for f in shred_fields]


def map_filter_path_to_stats(
    filter_path: str, column_name: str, shred_fields: list[str],
) -> str | None:
    """User filter path → stats column path, or None if not shredded
    (reference mapFilterPathToStats, src/parquet/index.ts:306-326)."""
    if not filter_path.startswith(f"{column_name}."):
        return None
    field = filter_path[len(column_name) + 1:]
    if field in shred_fields:
        return f"{column_name}.typed_value.{field}.typed_value"
    return None
