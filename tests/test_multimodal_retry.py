"""Multimodal binary-column plumbing + retry helper."""

from __future__ import annotations

import struct

import pytest

from deltalake_spark.delta.retry import RetryConfig, with_retry
from deltalake_spark.errors import ConcurrencyError
from deltalake_spark.operators.multimodal import (
    decode_image_meta,
    decode_pixels,
    fake_decode,
    frame_sample_plan,
    make_media_df,
)


def _png(w: int, h: int) -> bytes:
    return (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
            + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00" + b"\x00" * 16)


@pytest.fixture(scope="module")
def media(spark):
    return make_media_df(spark, [
        {"media_id": 1, "kind": "image", "format": "png",
         "payload": _png(640, 480), "meta_width": 640, "meta_height": 480},
        {"media_id": 2, "kind": "image", "format": "jpeg",
         "payload": b"\xff\xd8\xff\xe0" + b"\x00" * 100},
        {"media_id": 3, "kind": "video", "format": "mp4",
         "payload": b"\x00\x00\x00\x20ftypisom" + b"\x00" * 64,
         "meta_duration_ms": 3500},
        {"media_id": 4, "kind": "image", "format": None, "payload": None},
    ])


def test_decode_image_meta(media):
    out = {r["media_id"]: r for r in decode_image_meta(media).collect()}
    assert out[1]["sniffed_format"] == "png"
    assert (out[1]["width"], out[1]["height"]) == (640, 480)
    assert out[2]["sniffed_format"] == "jpeg"
    assert out[3]["sniffed_format"] == "mp4"
    assert out[4]["sniffed_format"] is None


def test_fake_decode_batch_shape(media):
    out = fake_decode(media, thumb_size=4).collect()
    by_id = {r["media_id"]: r["thumbnail"] for r in out}
    assert len(by_id[1]) == 16
    assert by_id[4] is None
    # deterministic
    again = {r["media_id"]: r["thumbnail"]
             for r in fake_decode(media, thumb_size=4).collect()}
    assert by_id == again


def test_decode_pixels_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        decode_pixels(media)


def test_frame_sample_plan(media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    ts = sorted(r["frame_ts_ms"] for r in frames)
    assert ts == [0, 1000, 2000, 3000]


def test_with_retry_succeeds_after_conflicts():
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise ConcurrencyError("/t", 1)
        return "ok"

    cfg = RetryConfig(max_attempts=5, initial_delay=0.001)
    assert with_retry(flaky, cfg) == "ok"
    assert len(attempts) == 3


def test_with_retry_exhausts():
    def always_fails():
        raise ConcurrencyError("/t", 1)

    with pytest.raises(ConcurrencyError):
        with_retry(always_fails, RetryConfig(max_attempts=2,
                                             initial_delay=0.001))


def test_with_retry_non_retryable():
    def boom():
        raise ValueError("no")

    with pytest.raises(ValueError):
        with_retry(boom, RetryConfig(initial_delay=0.001))
