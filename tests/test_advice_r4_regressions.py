"""Regressions for the four r4 ADVICE findings.

1. ``_grade_ordered`` must treat a crashed rows-only query (err ==
   'no_oracle' with null spark_rows) as red so it re-enters the window.
2. ``wav_pcm`` and ``wav_meta`` must agree on which data chunk a
   multi-data-chunk WAV describes (both pick the FIRST).
3. ``png_decode`` raises ValueError (not zlib.error) on corrupt or
   missing IDAT — covered in test_multimodal_retry.py
   (test_png_decode_corrupt_idat_raises_valueerror); a signature-level
   check lives here too.
4. The stale palette-fixture comment was documentation-only; the
   palette decode path itself is pinned by test_png_palette_decode.
"""

import struct

import pytest

from __spark_entry__ import _grade_is_red
from deltalake_spark.operators.multimodal import (
    make_png,
    make_wav,
    png_decode,
    wav_meta,
    wav_pcm,
)


def test_crashed_rows_only_record_is_red():
    # healthy rows-only: no oracle but the query produced rows
    assert not _grade_is_red({"err": "no_oracle", "spark_rows": 100})
    assert not _grade_is_red({"err": "no_oracle", "spark_rows": 0})
    # crashed before producing rows: must re-front as red
    assert _grade_is_red({"err": "no_oracle", "spark_rows": None})
    assert _grade_is_red({"err": "no_oracle"})
    # ordinary green / red records keep their classification
    assert not _grade_is_red({"err": None, "hash_match": True,
                              "rows_match": True, "schema_match": True,
                              "spark_rows": 5})
    assert _grade_is_red({"err": None, "hash_match": False,
                          "rows_match": True, "spark_rows": 5})
    assert _grade_is_red({"err": "Py4JJavaError: boom"})


def test_wav_multi_data_chunk_first_wins():
    """Nonstandard WAV with two data chunks: meta and decode agree on
    the FIRST chunk, and decoded frame count matches returned meta."""
    w = make_wav(sample_rate=8000, channels=1, bits=16, n_frames=100)
    second = b"data" + struct.pack("<I", 64) + bytes(64)
    w2 = w + second
    m = wav_meta(w2)
    assert m["n_frames"] == 100
    mm, arr = wav_pcm(w2)
    assert arr.shape == (100, 1)
    assert mm["n_frames"] == 100
    assert mm["duration_ms"] == m["duration_ms"]


def test_wav_pcm_meta_matches_truncated_decode():
    """A data chunk whose declared size exceeds the payload decodes the
    bytes that exist, and the returned meta reflects that."""
    w = bytearray(make_wav(sample_rate=8000, channels=1, bits=16,
                           n_frames=100))
    truncated = bytes(w[:-40])  # drop 20 frames of sample bytes
    mm, arr = wav_pcm(truncated)
    assert arr.shape[0] == mm["n_frames"] == 80


def test_png_decode_corrupt_idat_is_valueerror():
    import zlib

    good = make_png(3, 3, bytes(27), channels=3)
    bad = bytearray(good)
    for i in range(41, 49):  # first IDAT payload bytes
        bad[i] ^= 0xFF
    try:
        png_decode(bytes(bad))
    except ValueError:
        pass
    except zlib.error:
        pytest.fail("png_decode leaked zlib.error on corrupt IDAT")
    else:
        pytest.fail("corrupt IDAT must raise")
