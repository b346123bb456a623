"""Delta-protocol deletion vectors: Z85 codec + 64-bit RoaringBitmap
("RoaringTreemap") portable serialization + the on-disk DV file layout.

Reference: src/delta/deletion-vectors.ts:48-101 (Z85), 154-439 (bitmap
parse + file layout), descriptor type src/delta/types.ts:24-55. The
reference only READS this format; this module also writes it so tables
produced here interop with any spec-compliant Delta reader.

On-disk layout of a DV .bin file (Delta PROTOCOL.md, and what the
reference's reader skips over):

    [1 byte  ] format version (1)
    per stored DV, at descriptor.offset:
    [4 bytes ] dataSize, big-endian  == descriptor.sizeInBytes
    [dataSize] bitmap data: [4-byte LE magic 1681511377]
               [8-byte LE bucket count]
               per bucket: [4-byte LE high-32 key]
                           [portable 32-bit RoaringBitmap]
    [4 bytes ] CRC-32 of the bitmap data, big-endian

The reference reader skips ``offset + 8`` bytes — dataSize(4) + magic(4)
— and parses the treemap from the bucket count on
(deletion-vectors.ts:424-438), so files written here round-trip through
it byte-identically.

Scale note: serialization/parsing operate on ONE file's bitmap at a
time (KB–MB compressed, bounded by rows-per-parquet-file), never on the
table's full delete set; the table-level fan-out lives in
``DeltaTable`` as distributed Spark jobs.
"""

from __future__ import annotations

import os
import struct
import uuid as uuid_mod
import zlib
from typing import Any, Iterable

from deltalake_spark.errors import ValidationError

# Z85 (ZeroMQ base-85, JSON-safe): 4 bytes <-> 5 chars
Z85_CHARS = ("0123456789abcdefghijklmnopqrstuvwxyz"
             "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_DECODE = {c: i for i, c in enumerate(Z85_CHARS)}

# bitmap-data magic (little-endian) used by Delta DV files
DV_MAGIC = 1681511377
# the reference's lenient reader also treats these as magics
# (deletion-vectors.ts:173); accepted on read, never written
_ALT_MAGICS = (0x64, 0x3A300000, 0x303A)

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_DV_FILE_VERSION = 1


def z85_encode(data: bytes) -> str:
    if len(data) % 4 != 0:
        raise ValidationError(
            f"Z85 input length must be a multiple of 4, got {len(data)}"
        )
    out = []
    for i in range(0, len(data), 4):
        value = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            value, rem = divmod(value, 85)
            chunk.append(Z85_CHARS[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(encoded: str) -> bytes:
    if len(encoded) % 5 != 0:
        raise ValidationError(
            f"Z85 input length must be a multiple of 5, got {len(encoded)}"
        )
    out = bytearray()
    for i in range(0, len(encoded), 5):
        value = 0
        for ch in encoded[i:i + 5]:
            d = _Z85_DECODE.get(ch)
            if d is None:
                raise ValidationError(
                    f"Invalid Z85 character {ch!r} at position {i}"
                )
            value = value * 85 + d
        out += value.to_bytes(4, "big")
    return bytes(out)


def encode_uuid_z85(u: "uuid_mod.UUID") -> str:
    """16-byte UUID -> 20-char Z85 (descriptor pathOrInlineDv form)."""
    return z85_encode(u.bytes)


def decode_uuid_z85(path_or_inline: str) -> tuple[str, str]:
    """pathOrInlineDv -> (optional prefix, canonical uuid string).
    The LAST 20 chars are the encoded UUID; anything before is a random
    prefix (deletion-vectors.ts:88-101)."""
    if len(path_or_inline) < 20:
        raise ValidationError(
            f"pathOrInlineDv too short for a Z85 uuid: {path_or_inline!r}"
        )
    prefix = path_or_inline[:-20]
    raw = z85_decode(path_or_inline[-20:])
    return prefix, str(uuid_mod.UUID(bytes=raw))


def dv_file_candidates(table_path: str, descriptor: dict) -> list[str]:
    """Possible on-disk locations for a 'u'/'p' descriptor. The
    reference joins prefix INTO the filename
    (deletion_vector_<prefix><uuid>.bin, deletion-vectors.ts:114-128);
    standard Delta writers use the prefix as a SUBDIRECTORY
    (<prefix>/deletion_vector_<uuid>.bin) — try both on read."""
    st = descriptor.get("storageType")
    if st == "p":
        return [descriptor["pathOrInlineDv"]]
    if st != "u":
        raise ValidationError(
            f"storageType {st!r} has no file path (inline?)"
        )
    prefix, uid = decode_uuid_z85(descriptor["pathOrInlineDv"])
    cands = [os.path.join(table_path,
                          f"deletion_vector_{prefix}{uid}.bin")]
    if prefix:
        cands.append(os.path.join(
            table_path, prefix, f"deletion_vector_{uid}.bin"))
    else:
        cands = [os.path.join(table_path, f"deletion_vector_{uid}.bin")]
    return cands


# -- 32-bit RoaringBitmap (portable format) -------------------------------

def serialize_bitmap32(values: "list[int]") -> bytes:
    """Portable-format serialization of SORTED, DISTINCT uint32 values.
    Array containers for cardinality <= 4096, bitset containers above —
    run containers are never written (always-valid choice; readers must
    support all three)."""
    containers: list[tuple[int, list[int]]] = []
    cur_key, cur_vals = -1, []
    for v in values:
        key = v >> 16
        if key != cur_key:
            if cur_vals:
                containers.append((cur_key, cur_vals))
            cur_key, cur_vals = key, []
        cur_vals.append(v & 0xFFFF)
    if cur_vals:
        containers.append((cur_key, cur_vals))

    n = len(containers)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(struct.pack("<HH", key, len(vals) - 1)
                    for key, vals in containers)
    bodies = []
    for _key, vals in containers:
        if len(vals) > 4096:
            words = [0] * 1024
            for lv in vals:
                words[lv >> 6] |= 1 << (lv & 63)
            bodies.append(struct.pack("<1024Q", *words))
        else:
            bodies.append(struct.pack(f"<{len(vals)}H", *vals))
    # offset header: byte position of each container from the start of
    # this bitmap's serialization (cookie included)
    base = len(head) + len(desc) + 4 * n
    offsets, pos = [], base
    for b in bodies:
        offsets.append(pos)
        pos += len(b)
    offs = struct.pack(f"<{n}I", *offsets) if n else b""
    return head + desc + offs + b"".join(bodies)


def parse_bitmap32(data: bytes, start: int = 0) -> tuple[list[int], int]:
    """Parse one portable 32-bit RoaringBitmap at ``data[start:]``.
    Returns (values, bytes consumed). Handles array, bitset, and run
    containers plus both cookies (deletion-vectors.ts:228-395)."""
    values: list[int] = []
    if len(data) - start < 4:
        return values, 0
    off = start
    (cookie,) = struct.unpack_from("<I", data, off)
    off += 4
    run_bitset = None
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = ((cookie >> 16) & 0xFFFF) + 1
        nbytes = (n + 7) // 8
        run_bitset = data[off:off + nbytes]
        off += nbytes
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", data, off)
        off += 4
    else:
        return values, off - start
    if n == 0 or n > 65536:
        return values, off - start

    keys, cards = [], []
    for _ in range(n):
        k, c = struct.unpack_from("<HH", data, off)
        off += 4
        keys.append(k)
        cards.append(c + 1)
    if cookie == _SERIAL_COOKIE_NO_RUN or n >= 4:
        off += 4 * n  # offset header (positions are recomputable)

    for i in range(n):
        high = keys[i] << 16
        card = cards[i]
        is_run = (run_bitset is not None
                  and (run_bitset[i // 8] >> (i % 8)) & 1)
        if is_run:
            (nruns,) = struct.unpack_from("<H", data, off)
            off += 2
            for _ in range(nruns):
                s, ln = struct.unpack_from("<HH", data, off)
                off += 4
                values.extend(high | v
                              for v in range(s, min(s + ln + 1, 65536)))
        elif card > 4096:
            words = struct.unpack_from("<1024Q", data, off)
            off += 8192
            for wi, word in enumerate(words):
                while word:
                    low = word & -word
                    values.append(high | (wi * 64 + low.bit_length() - 1))
                    word ^= low
        else:
            vals = struct.unpack_from(f"<{card}H", data, off)
            off += 2 * card
            values.extend(high | v for v in vals)
    return values, off - start


# -- 64-bit RoaringTreemap ------------------------------------------------

def serialize_treemap(indices: Iterable[int]) -> bytes:
    """Sorted-deduped row indices -> magic + treemap bytes (the
    ``bitmap data`` blob; descriptor.sizeInBytes is its length)."""
    idx = sorted(set(int(i) for i in indices))
    if idx and idx[0] < 0:
        raise ValidationError("row indices must be non-negative")
    buckets: list[tuple[int, list[int]]] = []
    cur_high, cur = -1, []
    for v in idx:
        high = v >> 32
        if high != cur_high:
            if cur:
                buckets.append((cur_high, cur))
            cur_high, cur = high, []
        cur.append(v & 0xFFFFFFFF)
    if cur:
        buckets.append((cur_high, cur))
    out = [struct.pack("<I", DV_MAGIC), struct.pack("<Q", len(buckets))]
    for high, vals in buckets:
        out.append(struct.pack("<I", high))
        out.append(serialize_bitmap32(vals))
    return b"".join(out)


def parse_treemap(data: bytes) -> list[int]:
    """Bitmap-data blob -> sorted deleted row indices. The leading magic
    is optional (the reference accepts magic-less blobs,
    deletion-vectors.ts:165-176)."""
    if len(data) < 4:
        return []
    off = 0
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic == DV_MAGIC or magic in _ALT_MAGICS:
        off = 4
    if len(data) - off < 8:
        return []
    (nbuckets,) = struct.unpack_from("<Q", data, off)
    off += 8
    if nbuckets > 1_000_000:
        return []
    out: list[int] = []
    for _ in range(nbuckets):
        if len(data) - off < 4:
            break
        (high,) = struct.unpack_from("<I", data, off)
        off += 4
        vals, consumed = parse_bitmap32(data, off)
        if consumed == 0:
            break
        off += consumed
        base = high << 32
        out.extend(base + v for v in vals)
    return out


# -- DV file write/read ---------------------------------------------------

def write_dv_file(
    table_path: str, blobs: "list[tuple[str, bytes, int]]",
) -> "tuple[str, dict[str, dict[str, Any]]]":
    """Pack per-parquet-file bitmap blobs into ONE spec .bin file.

    ``blobs``: (data_file_rel_path, bitmap_data, cardinality) per file.
    Returns (dv file rel path, {data_file_rel_path: descriptor}).
    Layout per blob: [4B BE dataSize][bitmap data][4B BE CRC-32]."""
    u = uuid_mod.uuid4()
    rel = f"deletion_vector_{u}.bin"
    dest = os.path.join(table_path, rel)
    descriptors: dict[str, dict[str, Any]] = {}
    tmp = dest + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes([_DV_FILE_VERSION]))
        offset = 1
        for data_file, blob, cardinality in blobs:
            f.write(struct.pack(">I", len(blob)))
            f.write(blob)
            f.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
            descriptors[data_file] = {
                "storageType": "u",
                "pathOrInlineDv": encode_uuid_z85(u),
                "offset": offset,
                "sizeInBytes": len(blob),
                "cardinality": int(cardinality),
            }
            offset += 4 + len(blob) + 4
    os.replace(tmp, dest)
    return rel, descriptors


def inline_descriptor(blob: bytes, cardinality: int) -> "dict[str, Any]":
    """'i'-type descriptor: bitmap data Z85-encoded directly in the log
    (reference reads these, deletion-vectors.ts:414-417). Z85 needs a
    multiple of 4 bytes — zero-pad; parse_treemap ignores trailing
    bytes because it parses exactly the declared bucket count."""
    pad = (-len(blob)) % 4
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(blob + b"\x00" * pad),
        "sizeInBytes": len(blob),
        "cardinality": int(cardinality),
    }


def load_dv_indices(table_path: str, descriptor: dict) -> list[int]:
    """Descriptor -> sorted deleted row indices (reference
    loadDeletionVector, deletion-vectors.ts:409-439)."""
    st = descriptor.get("storageType")
    if st == "i":
        return parse_treemap(z85_decode(descriptor["pathOrInlineDv"]))
    last_err: Exception | None = None
    for cand in dv_file_candidates(table_path, descriptor):
        try:
            with open(cand, "rb") as f:
                raw = f.read()
            start = int(descriptor.get("offset") or 0)
            # skip the 4-byte dataSize int; parse_treemap then consumes
            # the optional magic itself (tolerates both the spec layout
            # and magic-less foreign blobs)
            size = descriptor.get("sizeInBytes")
            if size is not None and start + 4 + int(size) <= len(raw):
                blob = raw[start + 4:start + 4 + int(size)]
            else:
                blob = raw[start + 4:]
            return parse_treemap(blob)
        except FileNotFoundError as exc:
            last_err = exc
    raise FileNotFoundError(
        f"deletion vector file not found for descriptor "
        f"{descriptor.get('pathOrInlineDv')!r}: {last_err}"
    )
