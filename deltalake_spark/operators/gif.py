"""REAL GIF codec — pure-stdlib LZW decode/encode, palette expansion,
and interlace handling. Completes the uncompressed-container media
matrix (PNG zlib, WAV PCM, baseline JPEG, MP3 frame walk) with the one
remaining classic raster format; the reference repo has no media
operators at all (north-star surface, like ``operators/jpeg.py``).

Spec: GIF89a (CompuServe, 1990), Appendix F LZW variant — variable
code width starting at ``min_code_size+1`` bits, LSB-first packing,
CLEAR/EOI control codes, early width growth when the next free slot
reaches ``2^width``, 12-bit cap, and the KwKwK self-referencing case.
The encoder here SIMULATES the decoder's dictionary/width state to
stay bit-synchronized (the decoder lags one dictionary entry behind
the encoder — deriving emission widths from the decoder mirror kills
the classic off-by-one family). Interlaced images use the standard
4-pass row schedule (8/0, 8/4, 4/2, 2/1).

Scale shape: decode runs inside ``mapInPandas`` batches via
``multimodal.media_decode`` (GIF added to the magic-byte dispatch) —
map-only, per-partition, pixel buffers never shuffle. Errors raise
``ValueError`` (the codec error contract shared by png/jpeg decode).
"""

from __future__ import annotations

__all__ = ["make_gif", "gif_decode", "lzw_encode", "lzw_decode"]

_MAX_WIDTH = 12
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW compression of an index stream. Emits CLEAR
    first, resets the dictionary when the 12-bit space fills, and
    packs codes LSB-first. ``min_code_size`` must be 2..8 (GIF spec
    floor of 2 even for 1-bit palettes)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError("min_code_size must be in 2..8")
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    # decoder-mirror state: the decoder adds its dictionary entry one
    # code later than the encoder, so emission widths come from HERE
    dec_width = min_code_size + 1
    dec_next = clear + 2
    dec_seen_first = False

    def emit(code: int) -> None:
        nonlocal acc, nbits, dec_width, dec_next, dec_seen_first
        acc |= code << nbits
        nbits += dec_width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if code == clear:
            dec_width = min_code_size + 1
            dec_next = clear + 2
            dec_seen_first = False
        elif code != eoi:
            if dec_seen_first:
                if dec_next < (1 << _MAX_WIDTH):
                    dec_next += 1
                    if (dec_next == (1 << dec_width)
                            and dec_width < _MAX_WIDTH):
                        dec_width += 1
            else:
                dec_seen_first = True

    table: dict[bytes, int] = {
        bytes([i]): i for i in range(clear)}
    next_code = clear + 2

    emit(clear)
    w = b""
    for sym in indices:
        if sym >= clear:
            raise ValueError(
                f"index {sym} exceeds {min_code_size}-bit palette")
        wk = w + bytes([sym])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < (1 << _MAX_WIDTH):
            table[wk] = next_code
            next_code += 1
        else:
            # dictionary full: reset both sides
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
        w = bytes([sym])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int,
               expected: int | None = None) -> bytes:
    """GIF-variant LZW decompression: returns the index stream.
    Handles CLEAR resets, the KwKwK case (``code == next_free``), the
    early width bump at ``next_free == 2^width``, and the 12-bit cap.
    Raises ``ValueError`` on out-of-range codes or truncation (when
    ``expected`` pixels are known)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError("min_code_size must be in 2..8")
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                if expected is not None and len(out) < expected:
                    raise ValueError("LZW stream truncated before EOI")
                return bytes(out)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            if expected is not None and len(out) != expected:
                raise ValueError(
                    f"LZW decoded {len(out)} indices, "
                    f"expected {expected}")
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError(f"bad first LZW code {code}")
            entry = table[code]
            out += entry
            prev = entry
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]           # KwKwK
        else:
            raise ValueError(f"LZW code {code} beyond table")
        out += entry
        if len(table) < (1 << _MAX_WIDTH):
            table.append(prev + entry[:1])
            if (len(table) == (1 << width)
                    and width < _MAX_WIDTH):
                width += 1
        prev = entry


def _interlace_rows(height: int) -> list[int]:
    rows: list[int] = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return rows


def make_gif(width: int, height: int, indices: bytes, palette: bytes,
             *, interlace: bool = False) -> bytes:
    """Encode a REAL GIF89a file: logical screen descriptor, global
    color table (padded to a power of two), image descriptor (with the
    interlace flag and spec row reordering when asked), and genuinely
    LZW-compressed image data in ≤255-byte sub-blocks."""
    if len(indices) != width * height:
        raise ValueError("indices length must be width*height")
    if len(palette) % 3:
        raise ValueError("palette must be RGB triples")
    n_colors = len(palette) // 3
    if n_colors == 0 or n_colors > 256:
        raise ValueError("palette must hold 1..256 colors")
    if max(indices, default=0) >= n_colors:
        raise ValueError("index exceeds palette")
    # GCT size field: 2^(k+1) entries
    k = 0
    while (2 << k) < n_colors:
        k += 1
    gct = palette + b"\x00" * ((2 << k) * 3 - len(palette))
    min_code_size = max(2, k + 1)

    if interlace:
        body = bytearray()
        for y in _interlace_rows(height):
            body += indices[y * width:(y + 1) * width]
        indices = bytes(body)

    lzw = lzw_encode(indices, min_code_size)
    out = bytearray()
    out += b"GIF89a"
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x80 | k)              # GCT present, size field k
    out += b"\x00\x00"                # bg color, aspect
    out += gct
    out.append(0x2C)                  # image descriptor
    out += (0).to_bytes(2, "little") * 2
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x40 if interlace else 0x00)
    out.append(min_code_size)
    for i in range(0, len(lzw), 255):
        block = lzw[i:i + 255]
        out.append(len(block))
        out += block
    out.append(0x00)                  # block terminator
    out.append(0x3B)                  # trailer
    return bytes(out)


def gif_decode(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """Decode a GIF87a/89a payload to
    ``(width, height, 3, 8, rgb_bytes)`` — first image frame, palette
    expanded, interlace untangled. Extensions (0x21 blocks) are
    skipped per spec. Raises ``ValueError`` on malformed input (the
    shared codec error contract)."""
    try:
        return _gif_decode_inner(payload)
    except ValueError:
        raise
    except Exception as exc:           # truncation etc. → ValueError
        raise ValueError(f"malformed GIF: {exc}") from exc


def _gif_decode_inner(payload: bytes) -> tuple[int, int, int, int, bytes]:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF truncated in header")
    pos = 6
    pos += 4  # logical screen width/height (frame uses its own)
    packed = payload[pos]
    pos += 3  # packed, bg, aspect
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos:pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("GIF truncated in global color table")
        pos += 3 * n

    while True:
        if pos >= len(payload):
            raise ValueError("GIF ended before image data")
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            raise ValueError("GIF has no image frame")
        if block == 0x21:              # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("GIF truncated in extension")
                sz = payload[pos]
                pos += 1 + sz
                if sz == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        break

    if pos + 9 > len(payload):
        raise ValueError("GIF truncated in image descriptor")
    width = int.from_bytes(payload[pos + 4:pos + 6], "little")
    height = int.from_bytes(payload[pos + 6:pos + 8], "little")
    ipacked = payload[pos + 8]
    pos += 9
    interlaced = bool(ipacked & 0x40)
    palette = gct
    if ipacked & 0x80:                 # local color table wins
        n = 2 << (ipacked & 0x07)
        palette = payload[pos:pos + 3 * n]
        if len(palette) < 3 * n:
            raise ValueError("GIF truncated in local color table")
        pos += 3 * n
    if not palette:
        raise ValueError("GIF frame has no color table")
    if width == 0 or height == 0:
        raise ValueError("GIF frame has zero dimension")

    if pos >= len(payload):
        raise ValueError("GIF truncated before LZW data")
    min_code_size = payload[pos]
    pos += 1
    lzw = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("GIF truncated in image sub-blocks")
        sz = payload[pos]
        pos += 1
        if sz == 0:
            break
        if len(payload) < pos + sz:
            raise ValueError("GIF truncated in image sub-block")
        lzw += payload[pos:pos + sz]
        pos += sz

    indices = lzw_decode(bytes(lzw), min_code_size,
                         expected=width * height)
    if interlaced:
        ordered = bytearray(width * height)
        for src, y in enumerate(_interlace_rows(height)):
            ordered[y * width:(y + 1) * width] = (
                indices[src * width:(src + 1) * width])
        indices = bytes(ordered)

    n_colors = len(palette) // 3
    rgb = bytearray(width * height * 3)
    for i, idx in enumerate(indices):
        if idx >= n_colors:
            raise ValueError(f"pixel index {idx} beyond palette")
        rgb[3 * i:3 * i + 3] = palette[3 * idx:3 * idx + 3]
    return width, height, 3, 8, bytes(rgb)
