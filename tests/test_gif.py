"""GIF codec tests: LZW round-trips (including KwKwK and the early
width change), hand-computed spec-conformance bytes, interlace
untangling, palette expansion, media_decode dispatch, and the
ValueError contract on malformed input."""

import random

import pytest

from deltalake_spark.operators.gif import (
    gif_decode,
    lzw_decode,
    lzw_encode,
    make_gif,
)


def test_lzw_hand_computed_spec_bytes():
    # min_code_size=2: clear=4, eoi=5, width starts at 3.
    # Stream [0,1,0,1] → codes CLEAR,0,1,'01'(=6),EOI; the decoder
    # mirror bumps to 4 bits after adding entry 7, so EOI is 4 bits:
    # bits 100 000 001 110 0101 (LSB-first) → 0x44 0x5c.
    assert lzw_encode(bytes([0, 1, 0, 1]), 2) == bytes.fromhex("445c")
    assert lzw_decode(bytes.fromhex("445c"), 2) == bytes([0, 1, 0, 1])


def test_lzw_roundtrip_fuzz_all_code_sizes():
    rng = random.Random(3)
    for trial in range(60):
        mcs = rng.randint(2, 8)
        n = rng.randint(0, 2000)
        data = bytes(rng.randrange(1 << mcs) for _ in range(n))
        assert lzw_decode(lzw_encode(data, mcs), mcs,
                          expected=n) == data


def test_lzw_kwkwk_and_dictionary_reset():
    # runs of one symbol hit the code==next_free case immediately
    data = b"\x01" * 300
    assert lzw_decode(lzw_encode(data, 2), 2) == data
    # long low-entropy stream at mcs=2 exercises width growth; a
    # stream long enough to fill the 12-bit table forces a mid-stream
    # CLEAR on the encoder side
    rng = random.Random(1)
    big = bytes(rng.randrange(4) for _ in range(120_000))
    assert lzw_decode(lzw_encode(big, 2), 2, expected=len(big)) == big


def test_lzw_rejects_bad_input():
    with pytest.raises(ValueError):
        lzw_encode(b"\x09", 3)        # index beyond palette
    with pytest.raises(ValueError):
        lzw_encode(b"", 1)            # code size below spec floor
    with pytest.raises(ValueError):
        # truncated stream with expected count
        enc = lzw_encode(bytes(range(8)) * 4, 3)
        lzw_decode(enc[:2], 3, expected=32)


def test_gif_roundtrip_plain_and_interlaced():
    rng = random.Random(9)
    for interlace in (False, True):
        for (w, h) in [(1, 1), (3, 5), (11, 8), (7, 13)]:
            idx = bytes(rng.randrange(64) for _ in range(w * h))
            pal = bytes(rng.randrange(256) for _ in range(64 * 3))
            g = make_gif(w, h, idx, pal, interlace=interlace)
            W, H, c, d, rgb = gif_decode(g)
            assert (W, H, c, d) == (w, h, 3, 8)
            assert rgb == b"".join(pal[3 * i:3 * i + 3] for i in idx)


def test_gif_interlace_actually_reorders_rows():
    # 1-wide column: interlaced file stores rows 0,4? (h=5: passes
    # give 0,4,2,1,3) — the raw index stream must differ from the
    # plain file while decoding identically
    idx = bytes(range(5))
    pal = bytes(range(5)) * 3  # 5 gray-ish entries (any triples)
    pal = bytes(v for i in range(5) for v in (i, i, i))
    plain = make_gif(1, 5, idx, pal, interlace=False)
    inter = make_gif(1, 5, idx, pal, interlace=True)
    assert plain != inter
    assert gif_decode(plain) == gif_decode(inter)


def test_gif_skips_extension_blocks():
    idx = bytes([0, 1, 2, 3])
    pal = bytes(v for i in range(4) for v in (i * 10, i * 20, i * 30))
    g = bytearray(make_gif(2, 2, idx, pal))
    # splice a Graphic Control Extension after the screen descriptor +
    # GCT (6 + 7 + 4*3 = 25 bytes in)
    ext = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    spliced = bytes(g[:25]) + ext + bytes(g[25:])
    assert gif_decode(spliced) == gif_decode(bytes(g))


def test_gif_media_decode_dispatch():
    from deltalake_spark.operators.multimodal import media_decode

    idx = bytes([0, 1, 1, 0])
    pal = bytes([10, 20, 30, 40, 50, 60])
    w, h, c, d, rgb = media_decode(make_gif(2, 2, idx, pal))
    assert (w, h, c, d) == (2, 2, 3, 8)
    assert rgb == bytes([10, 20, 30, 40, 50, 60, 40, 50, 60,
                         10, 20, 30])


def test_gif_error_contract_mutations():
    idx = bytes(range(12))
    pal = bytes(v for i in range(12) for v in (i, i + 1, i + 2))
    good = make_gif(4, 3, idx, pal)
    cases = [
        b"NOTGIF" + good[6:],            # bad magic
        good[:10],                       # truncated header
        good[:-4],                       # truncated data stream
        good[:6] + good[6:].replace(b"\x2c", b"\x7c", 1),  # no frame
    ]
    for bad in cases:
        with pytest.raises(ValueError):
            gif_decode(bad)
    with pytest.raises(ValueError):
        make_gif(2, 2, b"\x00" * 3, b"\x00\x00\x00")  # wrong length
    with pytest.raises(ValueError):
        make_gif(2, 2, bytes([0, 0, 0, 5]), b"\x00\x00\x00")  # idx>pal