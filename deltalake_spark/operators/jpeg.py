"""Baseline JPEG codec — pure Python/numpy, no image library.

Closes the compressed-codec boundary the r3/r4 verdicts tracked
(`operators/multimodal.py` stub note): like the PNG and WAV codecs, this
is built from the public format spec (ITU-T T.81 / ISO 10918-1), not a
media library. Scope:

- ``jpeg_decode``: baseline sequential DCT (SOF0), 8-bit, grayscale or
  YCbCr with ARBITRARY sampling factors (4:4:4, 4:2:0, 4:2:2, ...),
  arbitrary DQT/DHT tables, restart markers, single interleaved scan.
  Progressive (SOF2), arithmetic coding, and 12-bit raise ``ValueError``.
- ``make_jpeg``: a real encoder for fixtures/tests — forward DCT,
  quantization, zigzag run-length, canonical Huffman tables built from
  the data, optional 2x2 chroma subsampling. Flat 8x8 blocks are DC-only
  and quantize exactly with a unit table, so flat-block images
  round-trip BIT-EXACTLY — that is what makes a closed-form value
  oracle possible for the gate query.

The reference engine (dot-do/deltalake) has no media operators at all
(src/query/index.ts covers filters/projections/pipelines only); this is
engine-native north-star surface for multimodal training-data pipelines.
At cluster scale this runs inside the same Arrow-batched ``mapInPandas``
shape as the PNG path — per-partition, zero shuffle.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["jpeg_decode", "make_jpeg"]

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# orthonormal 8-point DCT-II basis: C[u, x] = c(u) * cos((2x+1)u*pi/16)
_DCT = np.array([
    [(math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8))
     * math.cos((2 * x + 1) * u * math.pi / 16)
     for x in range(8)]
    for u in range(8)
])


def _fdct2(block: np.ndarray) -> np.ndarray:
    """JPEG forward DCT of one 8x8 block (level-shifted input)."""
    return _DCT @ block @ _DCT.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _DCT.T @ coef @ _DCT


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-stuffing removal; stops at any non-RST marker."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.buf):
                # spec: pad with 1-bits at the end of the stream
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.buf[self.pos]
            if b == 0xFF:
                nxt = self.buf[self.pos + 1] if self.pos + 1 < len(
                    self.buf) else 0xD9
                if nxt == 0x00:          # stuffed 0xFF data byte
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break                # restart marker: handled upstream
                else:
                    break                # real marker (EOI/next segment)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                raise ValueError("JPEG entropy stream truncated")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_restart(self) -> None:
        """Discard bit remainder and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.buf) and not (
                self.buf[self.pos] == 0xFF
                and 0xD0 <= self.buf[self.pos + 1] <= 0xD7):
            self.pos += 1
        if self.pos + 1 >= len(self.buf):
            raise ValueError("JPEG missing restart marker")
        self.pos += 2


def _build_huff(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 Annex C: map (length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG to interleaved 8-bit pixels.

    Returns ``(width, height, channels, pixels)`` — channels is 1
    (grayscale) or 3 (YCbCr converted to RGB with the JFIF/BT.601
    inverse, rounded and clamped). Raises ``ValueError`` for
    non-baseline streams (progressive, arithmetic, 12-bit) and for
    malformed data — truncated segments never leak struct/index
    errors.
    """
    try:
        return _jpeg_decode_impl(payload)
    except (struct.error, IndexError, KeyError,
            ZeroDivisionError) as exc:
        raise ValueError(f"malformed JPEG stream: "
                         f"{type(exc).__name__}: {exc}") from exc


def _jpeg_decode_impl(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        seg = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG SOF marker 0xFF{marker:02X} "
                f"(progressive/arithmetic/lossless)")
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                vals = np.zeros((8, 8))
                for i in range(64):
                    vals[_ZIGZAG[i]] = seg[p + 1 + i]
                qt[tq] = vals
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                symbols = bytes(seg[p + 17:p + 17 + n])
                table = _build_huff(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i:3 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if width is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    maxh = max(h for _, h, _, _ in comps)
    maxv = max(v for _, _, v, _ in comps)
    mcux = (width + 8 * maxh - 1) // (8 * maxh)
    mcuy = (height + 8 * maxv - 1) // (8 * maxv)

    # per-component coefficient planes (padded to whole MCUs)
    planes = {}
    for cid, h, v, tq in comps:
        planes[cid] = np.zeros((mcuy * v * 8, mcux * h * 8))

    br = _BitReader(payload, pos)
    pred = {cid: 0 for cid, _, _, _ in comps}
    comp_by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.align_to_restart()
                pred = {cid: 0 for cid in pred}
            n_mcu += 1
            for cs, td, ta in scan:
                h, v, tq = comp_by_id[cs]
                for by in range(v):
                    for bx in range(h):
                        coef = np.zeros((8, 8))
                        t = _huff_decode(br, huff_dc[td])
                        if t > 11:
                            raise ValueError("bad JPEG DC category")
                        diff = _extend(br.receive(t), t)
                        pred[cs] += diff
                        coef[0, 0] = pred[cs]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, huff_ac[ta])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break        # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            coef[_ZIGZAG[k]] = _extend(br.receive(s), s)
                            k += 1
                        block = _idct2(coef * qt[tq]) + 128.0
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        planes[cs][y0:y0 + 8, x0:x0 + 8] = block

    # upsample each component to full resolution and crop
    full = []
    for cid, h, v, tq in comps:
        p = planes[cid]
        if h != maxh or v != maxv:
            p = np.repeat(np.repeat(p, maxv // v, axis=0), maxh // h, axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        out = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, out.tobytes()


# --- encoder (fixtures/tests) ---------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _canonical_table(symbols_used: set[int]) -> tuple[list[int], bytes]:
    """Fixed-length canonical Huffman over the used symbols: all codes
    get the same length L = ceil(log2(n+1)) (the +1 keeps the all-ones
    code unused, as T.81 requires). Valid, simple, deterministic."""
    syms = sorted(symbols_used)
    n = len(syms)
    length = max(1, (n + 1 - 1).bit_length())
    if (1 << length) - 1 < n:
        length += 1
    counts = [0] * 16
    counts[length - 1] = n
    return counts, bytes(syms)


def _encode_component_block(w: _BitWriter, coef: np.ndarray, pred: int,
                            dc_codes, ac_codes) -> int:
    """Entropy-encode one quantized block; returns the new DC pred."""
    dc = int(coef[0, 0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(coef[_ZIGZAG[k]])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            w.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]
        w.write(code, ln)
    return dc


def _codes_from_table(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def make_jpeg(width: int, height: int, pixels: bytes, *,
              channels: int = 1, subsample: bool = False,
              quant: int = 1, restart_interval: int = 0) -> bytes:
    """Encode interleaved 8-bit pixels as a baseline JPEG
    (tests/synthesis helper — a REAL encoder: forward DCT, quantization,
    zigzag RLE, canonical Huffman built from the data).

    ``channels=1`` grayscale; ``channels=3`` RGB→YCbCr (BT.601),
    optionally 2x2 chroma-subsampled (``subsample=True`` → 4:2:0).
    ``quant`` fills the whole quant table (1 = near-lossless; flat 8x8
    blocks round-trip exactly). Edge blocks are padded by replication.
    """
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    arr = arr.reshape(height, width, channels)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        comps = [np.rint(y), np.rint(cb), np.rint(cr)]
        if subsample:
            def ds(p):
                h2 = (p.shape[0] + 1) // 2 * 2
                w2 = (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, h2 - p.shape[0]), (0, w2 - p.shape[1])),
                            mode="edge")
                return np.rint((pp[0::2, 0::2] + pp[0::2, 1::2]
                                + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0)
            comps = [comps[0], ds(comps[1]), ds(comps[2])]
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            sampling = [(1, 1)] * 3
    else:
        comps = [arr[..., 0]]
        sampling = [(1, 1)]

    maxh = max(h for h, _ in sampling)
    maxv = max(v for _, v in sampling)
    mcux = (width + 8 * maxh - 1) // (8 * maxh)
    mcuy = (height + 8 * maxv - 1) // (8 * maxv)
    qtab = np.full((8, 8), float(quant))

    # quantize every block first so Huffman tables can be built from data
    blocks: list[list[np.ndarray]] = []  # [comp][block index in MCU order]
    for ci, (p, (h, v)) in enumerate(zip(comps, sampling)):
        ph, pw = mcuy * v * 8, mcux * h * 8
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                   mode="edge")
        comp_blocks = []
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(v):
                    for bx in range(h):
                        y0, x0 = (my * v + by) * 8, (mx * h + bx) * 8
                        blk = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                        comp_blocks.append(np.rint(_fdct2(blk) / qtab))
        blocks.append(comp_blocks)

    # collect used symbols: luma tables (0) for comp 0, chroma (1) others
    dc_syms: list[set[int]] = [set(), set()]
    ac_syms: list[set[int]] = [set(), set()]
    for ci, comp_blocks in enumerate(blocks):
        ti = 0 if ci == 0 else 1
        pred = 0
        for i, coef in enumerate(comp_blocks):
            if restart_interval:
                n_per_mcu = sampling[ci][0] * sampling[ci][1]
                if (i // n_per_mcu) % restart_interval == 0 \
                        and i % n_per_mcu == 0:
                    pred = 0
            dc = int(coef[0, 0])
            dc_syms[ti].add(_category(dc - pred))
            pred = dc
            run = 0
            for k in range(1, 64):
                vv = int(coef[_ZIGZAG[k]])
                if vv == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms[ti].add(0xF0)
                    run -= 16
                ac_syms[ti].add((run << 4) | _category(vv))
                run = 0
            if run:
                ac_syms[ti].add(0x00)
    for ti in range(2):
        if not dc_syms[ti]:
            dc_syms[ti].add(0)
        if not ac_syms[ti]:
            ac_syms[ti].add(0x00)

    n_tables = 1 if channels == 1 else 2
    dc_tables = [_canonical_table(dc_syms[t]) for t in range(n_tables)]
    ac_tables = [_canonical_table(ac_syms[t]) for t in range(n_tables)]
    dc_codes = [_codes_from_table(*t) for t in dc_tables]
    ac_codes = [_codes_from_table(*t) for t in ac_tables]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    zz = bytes(int(qtab[_ZIGZAG[i]]) for i in range(64))
    out += seg(0xDB, bytes([0x00]) + zz)  # DQT id 0
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([channels])
    for ci in range(channels):
        h, v = sampling[ci]
        sof += bytes([ci + 1, (h << 4) | v, 0])
    out += seg(0xC0, sof)
    for ti in range(n_tables):
        counts, syms = dc_tables[ti]
        out += seg(0xC4, bytes([ti]) + bytes(counts) + syms)
        counts, syms = ac_tables[ti]
        out += seg(0xC4, bytes([0x10 | ti]) + bytes(counts) + syms)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([channels])
    for ci in range(channels):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    w = _BitWriter()
    pred = [0] * channels
    idx = [0] * channels
    n_mcu_total = mcux * mcuy
    for m in range(n_mcu_total):
        if restart_interval and m and m % restart_interval == 0:
            w.flush()
            out += w.out
            w = _BitWriter()
            out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            pred = [0] * channels
        for ci in range(channels):
            ti = 0 if ci == 0 else 1
            h, v = sampling[ci]
            for _ in range(h * v):
                pred[ci] = _encode_component_block(
                    w, blocks[ci][idx[ci]], pred[ci],
                    dc_codes[ti], ac_codes[ti])
                idx[ci] += 1
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
