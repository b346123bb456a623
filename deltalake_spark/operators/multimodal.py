"""Multimodal column plumbing: image/audio/video as opaque binary columns.

North-star functionality for LLM data pipelines. Media payloads live in
``binary`` columns beside typed metadata (a struct of format/width/height/
duration/...), and per-item processing runs as Arrow-batched pandas UDFs
over ``mapInPandas`` — the only sane shape at 100 TB:

- the binary column stays off the Python heap until its batch is processed;
- batch size is controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (set lower for large payloads);
- decode/resize/frame-sample parallelize per partition with zero shuffle.

PNG, BMP and WAV are decoded for REAL with no media library: PNG via stdlib
``zlib`` inflate + full scanline unfiltering (None/Sub/Up/Average/Paeth)
across the ENTIRE spec matrix — 1/2/4/8/16-bit, gray/gray+alpha/RGB/
RGBA/palette, non-interlaced and Adam7 (``decode_pixels``,
``pixel_channel_stats``), WAV via raw PCM sample decode
plus REAL G.711 mu-law/A-law expansion from the ITU-T spec formulas
(``wav_pcm``, ``audio_sample_stats``, ``audio_features``), BMP via
``bmp_decode`` (8/24/32 bpp, both row orders), and baseline
JPEG via the pure-numpy codec in ``operators/jpeg.py`` (Huffman +
dequant + IDCT, arbitrary sampling factors, restart markers). The
remaining essence codecs (mp3/mp4 audio-video) are not implementable
without media libraries, so those decode steps stay STUBBED:
``decode_audio_meta``/``decode_video_meta`` parse real container
headers in pure Python, and ``fake_decode`` is a deterministic stand-in
used by tests. The Spark-side plumbing — schema, UDF signatures,
batching — is real everywhere.
"""

from __future__ import annotations

import struct
import zlib
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("format", StringType()),        # png | jpeg | wav | ...
    StructField("payload", BinaryType()),
    StructField("meta_width", IntegerType()),
    StructField("meta_height", IntegerType()),
    StructField("meta_duration_ms", IntegerType()),
])


def make_media_df(spark, items: list[dict[str, Any]]) -> DataFrame:
    """Build a media table from dicts (tests/ingest helper)."""
    rows = [
        (
            int(it["media_id"]), it.get("kind", "image"),
            it.get("format"), it.get("payload"),
            it.get("meta_width"), it.get("meta_height"),
            it.get("meta_duration_ms"),
        )
        for it in items
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def sniff_format(payload: bytes | None) -> str | None:
    """Pure-Python magic-byte sniffing (no codec libraries)."""
    if not payload:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"BM" and len(payload) >= 54:
        return "bmp"
    if payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:3] == b"ID3" or (len(payload) >= 2 and payload[0] == 0xFF
                                 and (payload[1] & 0xE0) == 0xE0):
        return "mp3"
    return "unknown"


def png_dimensions(payload: bytes) -> tuple[int, int] | None:
    """PNG IHDR width/height from header bytes — a real (if minimal)
    decode of metadata without image libraries."""
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", payload[16:24])
        return w, h
    return None


def decode_image_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Extract sniffed format + dimensions via mapInPandas (Arrow batches).

    Header metadata only — for full pixel/sample decodes use
    ``media_decode`` / ``pixel_channel_stats`` (PNG incl. 16-bit +
    Adam7 + palette, baseline JPEG, GIF LZW, WAV PCM are all decoded
    for real, pure-Python; only MP3/MP4 *essence* stays out of scope —
    see COVERAGE.md).
    """
    schema = StructType(
        df.schema.fields
        + [StructField("sniffed_format", StringType()),
           StructField("width", IntegerType()),
           StructField("height", IntegerType())]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            formats, widths, heights = [], [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else None
                formats.append(sniff_format(raw))
                dims = png_dimensions(raw) if raw else None
                widths.append(dims[0] if dims else None)
                heights.append(dims[1] if dims else None)
            pdf = pdf.assign(
                sniffed_format=formats,
                width=pd.array(widths, dtype="Int32"),
                height=pd.array(heights, dtype="Int32"),
            )
            yield pdf

    return df.mapInPandas(process, schema)


def wav_meta(payload: bytes) -> dict[str, int] | None:
    """RIFF/WAVE header parse (fmt + data chunks) — real audio metadata
    without codec libraries: sample rate, channels, bit depth, frame
    count, duration."""
    if not payload or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if cid == b"fmt " and pos + 8 + 16 <= len(payload):
            tag, ch, sr, _, block, bits = struct.unpack(
                "<HHIIHH", payload[pos + 8:pos + 24])
            fmt = (tag, ch, sr, block, bits)
        elif cid == b"data" and data_size is None:
            # FIRST data chunk wins — wav_pcm decodes the first one, so
            # meta and decode must agree on nonstandard multi-data WAVs
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        return None
    tag, ch, sr, block, bits = fmt
    frames = (data_size // block) if (data_size and block) else 0
    return {
        "channels": ch, "sample_rate": sr, "bits": bits,
        "n_frames": frames,
        "duration_ms": int(frames * 1000 / sr) if sr else 0,
        "audio_format": tag,
    }


def decode_audio_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Extract audio metadata via mapInPandas — same Arrow-batched shape
    as :func:`decode_image_meta`, audio flavor. WAV via the RIFF header
    parse; MP3 via the real MPEG frame-header walk (:func:`mp3_meta` —
    ``bits`` is null there, compressed streams have no PCM width).
    Sample DECODE for compressed formats would need a codec library
    (absent by design); metadata is real for both."""
    schema = StructType(
        df.schema.fields
        + [StructField("sample_rate", IntegerType()),
           StructField("channels", IntegerType()),
           StructField("bits", IntegerType()),
           StructField("duration_ms_parsed", IntegerType())]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srs, chs, bits, durs = [], [], [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else None
                m = wav_meta(raw) if raw else None
                if m is None and raw:
                    m = mp3_meta(raw)
                srs.append(m["sample_rate"] if m else None)
                chs.append(m["channels"] if m else None)
                bits.append(m.get("bits") if m else None)
                durs.append(m["duration_ms"] if m else None)
            yield pdf.assign(
                sample_rate=pd.array(srs, dtype="Int32"),
                channels=pd.array(chs, dtype="Int32"),
                bits=pd.array(bits, dtype="Int32"),
                duration_ms_parsed=pd.array(durs, dtype="Int32"),
            )

    return df.mapInPandas(process, schema)


# --- MPEG audio (MP3) frame-header parse ----------------------------------
# Header layout and tables from the public MPEG-1/2 audio spec
# (ISO 11172-3 / 13818-3). Bitrates in kbps, indexed by the 4-bit field;
# row selected by (version, layer). 0 = "free"/invalid for our purposes.

_MP3_BITRATES = {
    # MPEG-1
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    # MPEG-2 / 2.5
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
}
_MP3_RATES = {3: (44100, 48000, 32000),    # version bits 11 = MPEG-1
              2: (22050, 24000, 16000),    # 10 = MPEG-2
              0: (11025, 12000, 8000)}     # 00 = MPEG-2.5


def _mp3_frame(payload: bytes, pos: int):
    """Parse one MPEG audio frame header at pos; returns
    (frame_len, sample_rate, samples_per_frame, channels, bitrate_kbps)
    or None if the 4 bytes at pos are not a valid header."""
    if pos + 4 > len(payload):
        return None
    b1, b2, b3, b4 = payload[pos:pos + 4]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        return None
    vbits = (b2 >> 3) & 0x3
    lbits = (b2 >> 1) & 0x3
    if vbits == 1 or lbits == 0:
        return None  # reserved version/layer
    version = 1 if vbits == 3 else 2      # 2.5 uses the MPEG-2 tables
    layer = 4 - lbits                     # bits 11→L1, 10→L2, 01→L3
    br_idx = (b3 >> 4) & 0xF
    sr_idx = (b3 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    bitrate = _MP3_BITRATES[(version, layer)][br_idx] * 1000
    sample_rate = _MP3_RATES[vbits][sr_idx]
    padding = (b3 >> 1) & 1
    channels = 1 if ((b4 >> 6) & 0x3) == 3 else 2
    if layer == 1:
        frame_len = (12 * bitrate // sample_rate + padding) * 4
        spf = 384
    else:
        spf = 1152 if (layer == 2 or version == 1) else 576
        frame_len = spf // 8 * bitrate // sample_rate + padding
    return frame_len, sample_rate, spf, channels, bitrate // 1000


def mp3_meta(payload: bytes) -> dict[str, int] | None:
    """MPEG audio (MP3) stream metadata by walking frame headers — real
    parsing with no codec library (the essence stays undecoded): skips
    an ID3v2 tag, syncs on the first valid header, then counts
    contiguous frames. Returns sample rate, channels, frame count,
    bitrate of the first frame, and exact duration from
    frames x samples_per_frame / rate; ``None`` if no frame syncs."""
    if not payload:
        return None
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = ((payload[6] & 0x7F) << 21 | (payload[7] & 0x7F) << 14
                | (payload[8] & 0x7F) << 7 | (payload[9] & 0x7F))
        pos = 10 + size
    first = None
    while pos + 4 <= len(payload):
        hdr = _mp3_frame(payload, pos)
        if hdr:
            first = hdr
            break
        pos += 1
    if first is None:
        return None
    _, sample_rate, spf, channels, bitrate = first
    n_frames = 0
    samples = 0
    while pos + 4 <= len(payload):
        hdr = _mp3_frame(payload, pos)
        if not hdr:
            break
        flen, _, fspf, _, _ = hdr
        if flen <= 0 or pos + flen > len(payload):
            break
        n_frames += 1
        samples += fspf
        pos += flen
    return {
        "sample_rate": sample_rate, "channels": channels,
        "bitrate_kbps": bitrate, "n_frames": n_frames,
        "duration_ms": int(samples * 1000 / sample_rate),
    }


def make_mp3(n_frames: int = 10, *, bitrate_kbps: int = 128,
             sample_rate: int = 44100, mono: bool = False,
             id3_bytes: int = 0) -> bytes:
    """Minimal valid MPEG-1 Layer III frame stream (tests/fixtures —
    deterministic): correct headers, zeroed side-info/main data, optional
    leading ID3v2 tag."""
    br_idx = _MP3_BITRATES[(1, 3)].index(bitrate_kbps)
    sr_idx = _MP3_RATES[3].index(sample_rate)
    hdr = bytes([
        0xFF,
        0xFB,  # sync + MPEG-1 + Layer III + no CRC
        (br_idx << 4) | (sr_idx << 2),
        0xC0 if mono else 0x00,
    ])
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = hdr + bytes(frame_len - 4)
    out = b""
    if id3_bytes:
        out += (b"ID3" + bytes([4, 0, 0]) +
                bytes([(id3_bytes >> 21) & 0x7F, (id3_bytes >> 14) & 0x7F,
                       (id3_bytes >> 7) & 0x7F, id3_bytes & 0x7F])
                + bytes(id3_bytes))
    return out + frame * n_frames


def make_wav(sample_rate: int = 8000, channels: int = 1, bits: int = 16,
             n_frames: int = 8000, fill: int = 0,
             data: bytes | None = None, audio_format: int = 1) -> bytes:
    """Minimal valid WAV payload (tests/fixtures — deterministic).
    Pass ``data`` to embed specific sample bytes; otherwise a
    byte-counter pattern of ``n_frames`` frames is used.
    ``audio_format``: 1 = linear PCM (default), 6 = G.711 A-law,
    7 = G.711 mu-law (compressed formats are 8-bit, one code byte per
    sample)."""
    block = channels * bits // 8
    if data is None:
        data = bytes((fill + i) % 256 for i in range(n_frames * block))
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, int(audio_format),
                                channels, sample_rate,
                                sample_rate * block, block, bits)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def ulaw_decode_value(code: int) -> int:
    """ITU-T G.711 mu-law expansion of ONE code byte to a linear
    sample (int, 16-bit linear domain, ±32124 max). Pure spec formula
    (complement, 3-bit exponent, 4-bit mantissa, bias 0x84) — the same
    arithmetic the SQL oracle twin replays."""
    u = (~code) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return -mag if sign else mag


def alaw_decode_value(code: int) -> int:
    """ITU-T G.711 A-law expansion of ONE code byte to a linear sample
    (int, 16-bit linear domain, ±32256 max). Pure spec formula
    (0x55 XOR, exponent 0 special case; sign bit set = positive)."""
    v = code ^ 0x55
    sign = v & 0x80
    exp = (v >> 4) & 0x07
    mant = v & 0x0F
    if exp == 0:
        mag = (mant << 4) + 8
    else:
        mag = ((mant << 4) + 0x108) << (exp - 1)
    # A-law sign bit SET means positive — opposite of mu-law
    return mag if sign else -mag


def _g711_table(audio_format: int):
    import numpy as np

    fn = ulaw_decode_value if audio_format == 7 else alaw_decode_value
    return np.array([fn(c) for c in range(256)], dtype=np.float64)


def make_bmp(width: int, height: int, *, bpp: int = 24,
             top_down: bool = False,
             pixel_fn=None,
             palette: list[tuple[int, int, int]] | None = None) -> bytes:
    """Minimal valid uncompressed BMP (BITMAPINFOHEADER) for tests and
    closed-form oracles. ``pixel_fn(x, y)`` returns an (r, g, b[, a])
    tuple for 24/32 bpp or a palette index for 8 bpp; defaults to a
    deterministic gradient. Rows padded to 4 bytes; bottom-up unless
    ``top_down``."""
    if bpp not in (8, 24, 32):
        raise ValueError("bpp must be 8, 24 or 32")
    if pixel_fn is None:
        if bpp == 8:
            pixel_fn = lambda x, y: (x + y) % 256  # noqa: E731
        else:
            pixel_fn = lambda x, y: (  # noqa: E731
                x % 256, y % 256, (x + y) % 256, 255)[: bpp // 8]
    pal = b""
    n_colors = 0
    if bpp == 8:
        palette = palette or [(i, (2 * i) % 256, (3 * i) % 256)
                              for i in range(256)]
        n_colors = len(palette)
        pal = b"".join(bytes((b_, g, r, 0)) for r, g, b_ in palette)
    row_bytes = (width * bpp // 8 + 3) & ~3
    rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            px = pixel_fn(x, y)
            if bpp == 8:
                row.append(px & 0xFF)
            elif bpp == 24:
                r, g, b_ = px[:3]
                row += bytes((b_, g, r))
            else:
                r, g, b_, a = (list(px) + [255])[:4]
                row += bytes((b_, g, r, a))
        row += bytes(row_bytes - len(row))
        rows.append(bytes(row))
    if not top_down:
        rows.reverse()
    data = b"".join(rows)
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    ih = struct.pack("<IiiHHIIiiII", 40, width,
                     -height if top_down else height, 1, bpp, 0,
                     len(data), 2835, 2835, n_colors, 0)
    return hdr + ih + pal + data


def bmp_decode(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """REAL BMP decode (no image library): BITMAPFILEHEADER +
    BITMAPINFOHEADER, uncompressed (BI_RGB) 8-bit palette / 24-bit
    BGR / 32-bit BGRA, bottom-up AND top-down (negative height),
    4-byte row padding. Returns ``(width, height, channels, depth,
    pixels)`` with row-major top-down RGB/RGBA bytes — the same
    contract as ``png_decode``. Raises ValueError on anything
    malformed or out of matrix (compressed BI_RLE/BI_BITFIELDS)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack("<I", payload[10:14])
    (ih_size, width, height, planes, bpp, comp) = struct.unpack(
        "<IiiHHI", payload[14:34])
    if ih_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP unsupported")
    if comp != 0:
        raise ValueError("compressed BMP out of decode matrix")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bpp {bpp}")
    if width <= 0 or height == 0 or planes != 1:
        raise ValueError("malformed BMP dimensions")
    top_down = height < 0
    height = abs(height)
    palette = None
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", payload[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + ih_size
        pal = payload[pal_off:pal_off + 4 * n_colors]
        if len(pal) < 4 * n_colors:
            raise ValueError("truncated BMP palette")
        palette = [(pal[4 * i + 2], pal[4 * i + 1], pal[4 * i])
                   for i in range(n_colors)]
    row_bytes = (width * bpp // 8 + 3) & ~3
    need = pix_off + row_bytes * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    channels = 3 if bpp in (8, 24) else 4
    out = bytearray()
    order = range(height) if top_down else range(height - 1, -1, -1)
    for y in order:
        row = payload[pix_off + y * row_bytes:]
        for x in range(width):
            if bpp == 8:
                idx = row[x]
                if idx >= len(palette):
                    raise ValueError("BMP palette index out of range")
                out += bytes(palette[idx])
            elif bpp == 24:
                b_, g, r = row[3 * x:3 * x + 3]
                out += bytes((r, g, b_))
            else:
                b_, g, r, a = row[4 * x:4 * x + 4]
                out += bytes((r, g, b_, a))
    return width, height, channels, 8, bytes(out)


def wav_pcm(payload: bytes):
    """REAL PCM decode: WAV payloads carry raw samples, so stdlib struct
    + numpy decode them exactly — no codec library. Returns
    ``(meta, samples)`` with ``samples`` a float64 ndarray of shape
    (frames, channels) in native amplitude units (int16 values, or
    uint8 shifted to be zero-centered), or ``None`` for non-WAV /
    non-PCM payloads."""
    import numpy as np

    m = wav_meta(payload)
    if not m or not m["n_frames"]:
        return None
    if m.get("audio_format", 1) not in (1, 6, 7):
        return None  # compressed essence (e.g. MP3-in-WAV): out of scope
    if m.get("audio_format", 1) == 1 and m["bits"] not in (8, 16):
        return None
    if m.get("audio_format", 1) in (6, 7) and m["bits"] != 8:
        return None
    # find the data chunk offset
    pos = 12
    data_off = data_size = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if cid == b"data":
            data_off, data_size = pos + 8, size
            break
        pos += 8 + size + (size & 1)
    if data_off is None:
        return None
    raw = payload[data_off:data_off + data_size]
    tag = m.get("audio_format", 1)
    if tag in (6, 7):
        # REAL G.711 expansion: 256-entry table from the spec formula
        arr = _g711_table(tag)[
            np.frombuffer(raw, dtype=np.uint8)]
    elif m["bits"] == 16:
        arr = np.frombuffer(raw[:len(raw) // 2 * 2], dtype="<i2") \
            .astype(np.float64)
    else:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    frames = len(arr) // m["channels"]
    # meta reflects the chunk actually decoded (truncated payloads and
    # multi-data-chunk WAVs would otherwise disagree with sample count)
    m = dict(m, n_frames=frames,
             duration_ms=int(frames * 1000 / m["sample_rate"])
             if m["sample_rate"] else 0)
    return m, arr[:frames * m["channels"]].reshape(frames, m["channels"])


def audio_features(df: DataFrame, payload_col: str = "payload",
                   *, window_ms: int = 250,
                   max_windows: int = 16) -> DataFrame:
    """REAL per-window audio features over PCM WAV payloads in one Arrow
    pass: ``power`` (mean squared amplitude per window, across channels)
    and ``rms`` (its square root) as ``array<double>`` — the canonical
    cheap audio features for corpus filtering (silence/clipping
    detection). Non-WAV payloads yield nulls. Same mapInPandas shape as
    :func:`pixel_channel_stats`; compressed formats (mp3/flac) would
    decode here via soundfile on a real cluster
    (:func:`audio_feature_stub` remains the deterministic stand-in for
    that path)."""
    import numpy as np

    from pyspark.sql.types import ArrayType

    schema = StructType(
        df.schema.fields
        + [StructField("power", ArrayType(DoubleType())),
           StructField("rms", ArrayType(DoubleType()))]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            powers, rmss = [], []
            for payload in pdf[payload_col]:
                dec = wav_pcm(bytes(payload)) if payload is not None \
                    else None
                if dec is None:
                    powers.append(None)
                    rmss.append(None)
                    continue
                m, arr = dec
                win = max(1, m["sample_rate"] * window_ms // 1000)
                n = min(max_windows, arr.shape[0] // win)
                if n == 0:
                    powers.append([])
                    rmss.append([])
                    continue
                w = arr[:n * win].reshape(n, win * arr.shape[1])
                p = np.mean(np.square(w), axis=1)
                powers.append([float(v) for v in p])
                rmss.append([float(v) for v in np.sqrt(p)])
            yield pdf.assign(power=powers, rms=rmss)

    return df.mapInPandas(process, schema)


def audio_feature_stub(df: DataFrame, payload_col: str = "payload",
                       *, window_ms: int = 250,
                       max_windows: int = 16) -> DataFrame:
    """Per-window audio features (RMS-like) — deterministic stand-in with
    the REAL distributed shape: Arrow batch in, ``array<double>`` feature
    column out, one value per time window. On a real cluster the body
    would run soundfile/librosa over the same batches."""
    from pyspark.sql.types import ArrayType, DoubleType

    schema = StructType(
        df.schema.fields + [StructField("features", ArrayType(DoubleType()))]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                m = wav_meta(bytes(payload)) if payload is not None else None
                if not m or not m["duration_ms"]:
                    feats.append(None)
                    continue
                n = min(max_windows,
                        max(1, m["duration_ms"] // window_ms))
                raw = bytes(payload)
                feats.append([
                    round(sum(raw[64 + i::max(1, len(raw) // 97)][:32])
                          % 1000 / 1000, 6)
                    for i in range(n)
                ])
            yield pdf.assign(features=feats)

    return df.mapInPandas(process, schema)


# --- real PNG codec (stdlib zlib, no image libraries) ---------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        typ = payload[pos + 4:pos + 8]
        yield typ, payload[pos + 8:pos + 8 + length]
        if typ == b"IEND":
            return
        pos += 12 + length  # len + type + data + crc


# Adam7 pass grids: (x_start, x_step, y_start, y_step), PNG spec §8.2
_ADAM7 = [
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
]


def _unfilter(raw: bytes, pos: int, n_rows: int, stride: int,
              bpp: int) -> tuple[bytearray, int]:
    """Reverse the five scanline filters over ``n_rows`` lines of
    ``stride`` bytes each, starting at ``raw[pos]`` (each line is
    prefixed by its filter-type byte). ``bpp`` is bytes per pixel —
    filters operate on bytes at pixel distance, so 16-bit samples work
    unchanged with doubled bpp. Returns ``(recon, next_pos)``."""
    recon = bytearray(n_rows * stride)
    prev_off = -stride
    for y in range(n_rows):
        if pos + 1 + stride > len(raw):
            raise ValueError("PNG data truncated")
        f = raw[pos]
        line = raw[pos + 1:pos + 1 + stride]
        pos += 1 + stride
        off = y * stride
        if f == 0:  # None
            recon[off:off + stride] = line
        elif f == 1:  # Sub
            for i in range(stride):
                a = recon[off + i - bpp] if i >= bpp else 0
                recon[off + i] = (line[i] + a) & 0xFF
        elif f == 2:  # Up
            if y == 0:
                recon[off:off + stride] = line
            else:
                for i in range(stride):
                    recon[off + i] = (line[i]
                                      + recon[off + prev_off + i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = recon[off + i - bpp] if i >= bpp else 0
                b = recon[off + prev_off + i] if y > 0 else 0
                recon[off + i] = (line[i] + ((a + b) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = recon[off + i - bpp] if i >= bpp else 0
                b = recon[off + prev_off + i] if y > 0 else 0
                c = recon[off + prev_off + i - bpp] \
                    if (y > 0 and i >= bpp) else 0
                recon[off + i] = (line[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
    return recon, pos


def png_decode(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """Decode a PNG to raw interleaved pixel bytes — a REAL decode with
    no image library: zlib inflate + the spec's five scanline filters
    (PNG spec §9 'Filtering'; filter recon as in RFC 2083 §6) and the
    seven-pass Adam7 deinterlace (spec §8.2).

    Supports EVERY spec depth/color combination: 1/2/4/8/16-bit, color
    types 0/2/3/4/6 (gray, RGB, palette, gray+alpha, RGBA), interlace
    methods 0 and Adam7. Palette images are expanded to RGB via the
    PLTE lookup; sub-byte grayscale samples are unpacked MSB-first and
    scaled by left-bit replication (exact 255·v/(2^d−1)).

    Returns ``(width, height, channels, depth, pixels)`` with
    ``pixels`` row-major: one byte per sample for depth ≤ 8 (sub-byte
    gray pre-scaled to 0-255), big-endian pairs for 16-bit; ``depth``
    is the SOURCE bit depth (palette output is 8). Malformed streams
    raise ValueError — never a leaked struct/index/zlib error.
    """
    import struct as _struct
    try:
        return _png_decode_impl(payload)
    except (_struct.error, IndexError) as exc:
        raise ValueError(f"malformed PNG stream: "
                         f"{type(exc).__name__}: {exc}") from exc


def _png_decode_impl(payload: bytes) -> tuple[int, int, int, int, bytes]:
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    width = height = None
    channels = 0
    color_type = depth = None
    interlace = 0
    palette = None
    idat = bytearray()
    for typ, data in _png_chunks(payload):
        if typ == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data[:13])
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color_type not in _CHANNELS and color_type != 3:
                raise ValueError(
                    f"unsupported PNG color type {color_type}")
            if depth < 8 and color_type not in (0, 3):
                # spec: sub-byte depths exist only for grayscale/palette
                raise ValueError(
                    f"depth {depth} invalid for color type {color_type}")
            if color_type == 3 and depth == 16:
                raise ValueError("palette PNG cannot be 16-bit")
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace method {interlace}")
            channels = 1 if color_type == 3 else _CHANNELS[color_type]
        elif typ == b"PLTE":
            palette = data
        elif typ == b"IDAT":
            idat += data
    if width is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    if color_type == 3 and (palette is None or len(palette) % 3):
        raise ValueError("palette PNG missing/invalid PLTE")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    bpp = max(1, channels * depth // 8)  # filters act on packed bytes
    if interlace == 0:
        stride = (width * channels * depth + 7) // 8
        if len(raw) != height * (stride + 1):
            raise ValueError("PNG data length mismatch")
        packed, _ = _unfilter(raw, 0, height, stride, bpp)
        if depth < 8:
            recon = bytearray(width * height)
            for y in range(height):
                recon[y * width:(y + 1) * width] = _unpack_bits(
                    packed[y * stride:(y + 1) * stride], width, depth)
        else:
            recon = packed
    else:
        # Adam7: seven independently-filtered sub-images, scattered
        # into the full grid at (x0 + i*xs, y0 + j*ys). Sub-byte rows
        # are unpacked to one byte per sample BEFORE scatter, so the
        # scatter granularity is uniform.
        spp = bpp if depth >= 8 else 1  # bytes per pixel after unpack
        recon = bytearray(width * height * spp)
        pos = 0
        for x0, xs, y0, ys in _ADAM7:
            pw = (width - x0 + xs - 1) // xs
            ph = (height - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * channels * depth + 7) // 8
            sub, pos = _unfilter(raw, pos, ph, stride, bpp)
            for ry in range(ph):
                base = ((y0 + ry * ys) * width + x0) * spp
                row = sub[ry * stride:(ry + 1) * stride]
                if depth < 8:
                    row = _unpack_bits(row, pw, depth)
                for rx in range(pw):
                    dst = base + rx * xs * spp
                    recon[dst:dst + spp] = row[rx * spp:rx * spp + spp]
        if pos != len(raw):
            raise ValueError("PNG data length mismatch")
    if depth < 8 and color_type == 0:
        # left-bit-replication scaling: exact 255*v/(2^d-1) for d=1/2/4
        factor = 255 // ((1 << depth) - 1)
        recon = bytearray(v * factor for v in recon)
    if color_type == 3:
        # expand palette indices to RGB triples
        n_entries = len(palette) // 3
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(recon):
            if idx >= n_entries:
                raise ValueError(f"palette index {idx} out of range")
            rgb[3 * i:3 * i + 3] = palette[3 * idx:3 * idx + 3]
        return width, height, 3, 8, bytes(rgb)
    return width, height, channels, depth, bytes(recon)


def _unpack_bits(row: bytes, n_samples: int, depth: int) -> bytearray:
    """MSB-first sub-byte sample unpacking of one packed scanline
    (PNG spec §7.2: pixels are packed left-to-right, high bits
    first)."""
    out = bytearray(n_samples)
    mask = (1 << depth) - 1
    per = 8 // depth
    for x in range(n_samples):
        shift = 8 - depth * (x % per + 1)
        out[x] = (row[x // per] >> shift) & mask
    return out


def _pack_bits(samples: bytes, depth: int) -> bytes:
    """Inverse of :func:`_unpack_bits` (encoder side)."""
    per = 8 // depth
    out = bytearray((len(samples) + per - 1) // per)
    for x, v in enumerate(samples):
        out[x // per] |= (v & ((1 << depth) - 1)) \
            << (8 - depth * (x % per + 1))
    return bytes(out)


def _filter_line(f: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, c)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def make_png(width: int, height: int, pixels: bytes, *,
             channels: int = 3, filter_cycle: bool = True,
             depth: int = 8, interlace: int = 0) -> bytes:
    """Encode raw interleaved pixel bytes as a spec-conformant PNG
    (tests/synthesis helper). ``filter_cycle=True`` filters scanline y
    with type ``y % 5``, so a decode round-trip exercises ALL five
    unfilter paths. ``depth=16`` takes big-endian 16-bit samples;
    ``interlace=1`` emits Adam7 (each pass filtered independently)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"unsupported depth {depth}")
    if depth < 8 and channels != 1:
        raise ValueError("sub-byte depths are grayscale-only")
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    # sub-byte input: one RAW sample value (< 2^depth) per byte, packed
    # here; >= 8-bit input: already-interleaved sample bytes
    spp = max(1, channels * depth // 8)  # bytes per pixel, pre-packing
    bpp = spp
    if len(pixels) != height * width * spp:
        raise ValueError("pixel buffer size mismatch")
    body = bytearray()
    if interlace == 0:
        row_w = width * spp
        prev = bytes((width * channels * depth + 7) // 8)
        for y in range(height):
            line = pixels[y * row_w:(y + 1) * row_w]
            if depth < 8:
                line = _pack_bits(line, depth)
            f = (y % 5) if filter_cycle else 0
            body.append(f)
            body += _filter_line(f, line, prev, bpp)
            prev = line
    else:
        for x0, xs, y0, ys in _ADAM7:
            pw = (width - x0 + xs - 1) // xs
            ph = (height - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            prev = bytes((pw * channels * depth + 7) // 8)
            for ry in range(ph):
                y = y0 + ry * ys
                line = b"".join(
                    pixels[(y * width + x0 + rx * xs) * spp:
                           (y * width + x0 + rx * xs) * spp + spp]
                    for rx in range(pw))
                if depth < 8:
                    line = _pack_bits(line, depth)
                f = (ry % 5) if filter_cycle else 0
                body.append(f)
                body += _filter_line(f, line, prev, bpp)
                prev = line

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type,
                       0, 0, interlace)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(body)))
            + chunk(b"IEND", b""))


def make_png_indexed(width: int, height: int, indices: bytes,
                     palette: bytes, *,
                     filter_cycle: bool = True) -> bytes:
    """Encode a palette (color type 3) PNG: one index byte per pixel
    plus a PLTE of RGB triples (tests/synthesis helper)."""
    if len(indices) != width * height:
        raise ValueError("index buffer size mismatch")
    if len(palette) % 3 or not palette:
        raise ValueError("palette must be non-empty RGB triples")
    body = bytearray()
    prev = bytes(width)
    for y in range(height):
        line = indices[y * width:(y + 1) * width]
        f = (y % 5) if filter_cycle else 0
        body.append(f)
        body += _filter_line(f, line, prev, 1)
        prev = line

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", palette)
            + chunk(b"IDAT", zlib.compress(bytes(body)))
            + chunk(b"IEND", b""))


def media_decode(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """Dispatch a raw image payload to the matching REAL codec by magic
    bytes: PNG → :func:`png_decode`, baseline JPEG →
    ``operators.jpeg.jpeg_decode``, GIF →
    ``operators.gif.gif_decode`` (LZW + palette + interlace). Returns
    ``(width, height, channels, depth, pixels)``; raises ValueError for
    other formats."""
    if payload[:8] == _PNG_SIG:
        return png_decode(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from deltalake_spark.operators.jpeg import jpeg_decode
        w, h, c, px = jpeg_decode(payload)
        return w, h, c, 8, px
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from deltalake_spark.operators.gif import gif_decode
        return gif_decode(payload)
    if payload[:2] == b"BM" and len(payload) >= 54:
        return bmp_decode(payload)
    raise ValueError("unsupported image payload")


def decode_pixels(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Full image pixel decode via mapInPandas (Arrow batches): appends
    ``pix_width``/``pix_height``/``pix_channels``/``pix_depth`` and the
    raw row-major ``pixels`` binary. PNG and baseline JPEG decode for
    real (stdlib/numpy codecs); other or undecodable payloads yield
    nulls (filter on ``pix_width IS NOT NULL`` downstream).
    Per-partition, zero shuffle."""
    schema = StructType(
        df.schema.fields
        + [StructField("pix_width", IntegerType()),
           StructField("pix_height", IntegerType()),
           StructField("pix_channels", IntegerType()),
           StructField("pix_depth", IntegerType()),
           StructField("pixels", BinaryType())]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, cs, ds, px = [], [], [], [], []
            for payload in pdf[payload_col]:
                try:
                    w, h, c, d, p = media_decode(bytes(payload))
                    ws.append(w); hs.append(h); cs.append(c)
                    ds.append(d); px.append(p)
                except Exception:
                    ws.append(None); hs.append(None)
                    cs.append(None); ds.append(None); px.append(None)
            yield pdf.assign(
                pix_width=pd.array(ws, dtype="Int32"),
                pix_height=pd.array(hs, dtype="Int32"),
                pix_channels=pd.array(cs, dtype="Int32"),
                pix_depth=pd.array(ds, dtype="Int32"),
                pixels=px,
            )

    return df.mapInPandas(process, schema)


def audio_sample_stats(df: DataFrame,
                       payload_col: str = "payload") -> DataFrame:
    """Decode WAV payloads (linear PCM 8/16-bit AND G.711 mu-law/A-law
    via the real spec-formula expansion) and emit whole-stream sample
    statistics in ONE Arrow pass: ``n_samples``, ``sum_amp`` (exact —
    integer-valued float64, |sum| << 2^53), ``min_amp``/``max_amp``,
    plus the parsed ``audio_format`` tag. Nulls for undecodable
    payloads. Same fused decode+reduce shape as
    :func:`pixel_channel_stats` — raw sample buffers never leave
    their batch."""
    schema = StructType(
        df.schema.fields
        + [StructField("audio_format", IntegerType()),
           StructField("n_samples", LongType()),
           StructField("sum_amp", LongType()),
           StructField("min_amp", LongType()),
           StructField("max_amp", LongType())]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tags, ns, sm, mn, mx = [], [], [], [], []
            for payload in pdf[payload_col]:
                dec = wav_pcm(bytes(payload)) if payload is not None \
                    else None
                if dec is None:
                    tags.append(None); ns.append(None); sm.append(None)
                    mn.append(None); mx.append(None)
                    continue
                m, arr = dec
                flat = arr.ravel()
                tags.append(m.get("audio_format", 1))
                ns.append(int(flat.size))
                sm.append(int(flat.sum()))
                mn.append(int(flat.min()) if flat.size else None)
                mx.append(int(flat.max()) if flat.size else None)
            yield pdf.assign(
                audio_format=pd.array(tags, dtype="Int32"),
                n_samples=pd.array(ns, dtype="Int64"),
                sum_amp=pd.array(sm, dtype="Int64"),
                min_amp=pd.array(mn, dtype="Int64"),
                max_amp=pd.array(mx, dtype="Int64"),
            )

    return df.mapInPandas(process, schema)


def pixel_channel_stats(df: DataFrame,
                        payload_col: str = "payload") -> DataFrame:
    """Decode PNG payloads and emit per-channel mean pixel values (the
    canonical cheap image feature) in ONE Arrow pass — decode and
    reduction fused so raw pixel buffers never cross a batch boundary.
    Appends ``pix_width``/``pix_height``/``pix_channels``/``pix_depth``
    and ``mean_c0``/``mean_c1``/``mean_c2`` (null when the image has
    fewer channels or the payload isn't decodable PNG). Means are in
    NATIVE sample units: 0–255 for 8-bit, 0–65535 for 16-bit — check
    ``pix_depth`` to normalize downstream."""
    import numpy as np

    schema = StructType(
        df.schema.fields
        + [StructField("pix_width", IntegerType()),
           StructField("pix_height", IntegerType()),
           StructField("pix_channels", IntegerType()),
           StructField("pix_depth", IntegerType()),
           StructField("mean_c0", DoubleType()),
           StructField("mean_c1", DoubleType()),
           StructField("mean_c2", DoubleType())]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, cs, ds = [], [], [], []
            m0, m1, m2 = [], [], []
            for payload in pdf[payload_col]:
                try:
                    w, h, c, d, p = media_decode(bytes(payload))
                except Exception:
                    ws.append(None); hs.append(None); cs.append(None)
                    ds.append(None)
                    m0.append(None); m1.append(None); m2.append(None)
                    continue
                dtype = np.dtype(">u2") if d == 16 else np.uint8
                arr = np.frombuffer(p, dtype=dtype).reshape(h, w, c)
                means = arr.mean(axis=(0, 1), dtype=np.float64)
                ws.append(w); hs.append(h); cs.append(c); ds.append(d)
                m0.append(float(means[0]))
                m1.append(float(means[1]) if c > 1 else None)
                m2.append(float(means[2]) if c > 2 else None)
            yield pdf.assign(
                pix_width=pd.array(ws, dtype="Int32"),
                pix_height=pd.array(hs, dtype="Int32"),
                pix_channels=pd.array(cs, dtype="Int32"),
                pix_depth=pd.array(ds, dtype="Int32"),
                mean_c0=pd.array(m0, dtype="float64"),
                mean_c1=pd.array(m1, dtype="float64"),
                mean_c2=pd.array(m2, dtype="float64"),
            )

    return df.mapInPandas(process, schema)


def fake_decode(df: DataFrame, payload_col: str = "payload",
                *, thumb_size: int = 4) -> DataFrame:
    """Deterministic stand-in for decode+resize: emits a pseudo-thumbnail
    (xxhash-seeded byte grid) per row. Exercises the REAL pipeline shape —
    Arrow batch in, binary column out — with fake pixel math."""
    schema = StructType(
        df.schema.fields + [StructField("thumbnail", BinaryType())]
    )
    n = thumb_size * thumb_size

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for payload in pdf[payload_col]:
                if payload is None:
                    thumbs.append(None)
                    continue
                raw = bytes(payload)
                seed = sum(raw[:64]) % 251 if raw else 0
                thumbs.append(bytes(((seed + i) % 256) for i in range(n)))
            yield pdf.assign(thumbnail=thumbs)

    return df.mapInPandas(process, schema)


def frame_sample_plan(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame-
    timestamp rows JVM-side (sequence+explode); the per-frame decode would
    then run through the same mapInPandas shape as fake_decode."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta_duration_ms"),
                                          F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
    )


def mp4_meta(payload: bytes) -> dict[str, int] | None:
    """ISO-BMFF (MP4) box-structure parse — real container metadata
    without codec libraries: walks top-level boxes to ``moov``, reads
    ``mvhd`` (timescale, duration) and counts ``trak`` children.
    Version-1 mvhd (64-bit times) is handled; codec payloads are never
    touched."""
    if not payload or len(payload) < 8:
        return None

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", buf[pos:pos + 4])
            ctype = buf[pos + 4:pos + 8]
            if size < 8 or pos + size > end:
                return
            yield ctype, pos + 8, pos + size
            pos += size

    if payload[4:8] != b"ftyp":
        return None
    timescale = duration = None
    n_tracks = 0
    for ctype, body_start, body_end in walk(payload, 0, len(payload)):
        if ctype != b"moov":
            continue
        for sub, s, e in walk(payload, body_start, body_end):
            if sub == b"mvhd" and e - s >= 4:
                version = payload[s]
                if version == 1 and e - s >= 4 + 8 + 8 + 4 + 8:
                    timescale, = struct.unpack(">I", payload[s + 20:s + 24])
                    duration, = struct.unpack(">Q", payload[s + 24:s + 32])
                elif e - s >= 4 + 4 + 4 + 4 + 4:
                    timescale, = struct.unpack(">I", payload[s + 12:s + 16])
                    duration, = struct.unpack(">I", payload[s + 16:s + 20])
            elif sub == b"trak":
                n_tracks += 1
    if timescale is None:
        return None
    return {
        "timescale": timescale,
        "duration": duration or 0,
        "n_tracks": n_tracks,
        "duration_ms": int((duration or 0) * 1000 // timescale)
        if timescale else 0,
    }


def decode_video_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """MP4 container metadata via mapInPandas — the video member of the
    decode_image_meta / decode_audio_meta family. Frame pixel decode is
    out of scope here by design (no codecs in this container); pair with
    :func:`frame_sample_plan` for the sampling plan."""
    schema = StructType(
        df.schema.fields
        + [StructField("timescale", IntegerType()),
           StructField("duration_ms_parsed", IntegerType()),
           StructField("n_tracks", IntegerType())]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ts, durs, trks = [], [], []
            for payload in pdf[payload_col]:
                m = mp4_meta(bytes(payload)) if payload is not None else None
                ts.append(m["timescale"] if m else None)
                durs.append(m["duration_ms"] if m else None)
                trks.append(m["n_tracks"] if m else None)
            yield pdf.assign(
                timescale=pd.array(ts, dtype="Int32"),
                duration_ms_parsed=pd.array(durs, dtype="Int32"),
                n_tracks=pd.array(trks, dtype="Int32"),
            )

    return df.mapInPandas(process, schema)


def make_mp4(timescale: int = 600, duration: int = 1200,
             n_tracks: int = 1) -> bytes:
    """Minimal valid ISO-BMFF payload (ftyp + moov[mvhd + empty traks])
    for tests/fixtures — deterministic, codec-free."""
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
    mvhd_body = (
        bytes(4)                      # version 0 + flags
        + struct.pack(">II", 0, 0)    # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + bytes(108 - 8 - 4 - 8 - 8)  # rate/volume/matrix/next_track pad
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    traks = (struct.pack(">I", 8) + b"trak") * n_tracks
    moov = struct.pack(">I", 8 + len(mvhd) + len(traks)) + b"moov" \
        + mvhd + traks
    return ftyp + moov
