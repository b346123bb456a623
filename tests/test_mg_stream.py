"""Streaming Misra-Gries heavy hitters: the mergeable-summaries
compress rule (mg_merge_summaries) pinned against a Python reference,
and the foreachBatch sink pinned batch-for-batch against the same
reference with the classic MG bound checked vs exact counts."""
from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.sketches import mg_merge_summaries


def _ref_merge(a: dict, b: dict, capacity: int) -> dict:
    d = dict(a)
    for t, c in b.items():
        d[t] = d.get(t, 0) + c
    if len(d) <= capacity:
        return d
    thr = sorted(d.values(), reverse=True)[capacity]
    return {t: c - thr for t, c in d.items() if c - thr > 0}


def _df(spark, d: dict):
    rows = [(t, int(c)) for t, c in sorted(d.items())]
    return spark.createDataFrame(rows, "tok string, mg_count long")


def test_merge_matches_python_reference(spark):
    import random

    rng = random.Random(13)
    vocab = [f"t{i}" for i in range(40)]
    a = {t: rng.randint(1, 50) for t in rng.sample(vocab, 25)}
    b = {t: rng.randint(1, 50) for t in rng.sample(vocab, 25)}
    for cap in (8, 16, 64):
        got = {
            r["tok"]: r["mg_count"]
            for r in mg_merge_summaries(
                _df(spark, a), _df(spark, b), col="tok", capacity=cap
            ).collect()
        }
        assert got == _ref_merge(a, b, cap)


def test_merge_no_compression_is_exact(spark):
    a, b = {"x": 3, "y": 1}, {"x": 2, "z": 5}
    got = {r["tok"]: r["mg_count"]
           for r in mg_merge_summaries(
               _df(spark, a), _df(spark, b), col="tok", capacity=16
           ).collect()}
    assert got == {"x": 5, "y": 1, "z": 5}


def test_stream_sink_matches_reference_and_bound(spark):
    import random

    from deltalake_spark.delta.table import DeltaTable
    from deltalake_spark.streaming.sink import mg_stream_summary_sink
    from deltalake_spark.streaming.windowed import read_parquet_stream

    rng = random.Random(29)
    vocab = [f"w{i}" for i in range(30)]
    weights = [1 + (30 - i) ** 2 for i in range(30)]  # skewed
    batches = [
        rng.choices(vocab, weights=weights, k=400) for _ in range(3)
    ]
    d = tempfile.mkdtemp(prefix="mgstream_")
    for b, toks in enumerate(batches):
        pdf = spark.createDataFrame(
            [(t,) for t in toks], "tok string").toPandas()
        path = os.path.join(d, f"b{b}.parquet")
        pdf.to_parquet(path)
        os.utime(path, (1_600_000_000 + b, 1_600_000_000 + b))

    table = DeltaTable(
        spark, tempfile.mkdtemp(prefix="mgsum_") + "/t")
    stream = read_parquet_stream(
        spark, d, max_files_per_trigger=1, nanos_cols=())
    mg_stream_summary_sink(
        stream, table, col="tok", capacity=12, app_id="mg-test")

    got = {r["tok"]: r["mg_count"] for r in table.to_df().collect()}

    # reference: sequential merge in file (mtime) order
    ref: dict = {}
    from collections import Counter
    for toks in batches:
        ref = _ref_merge(ref, Counter(toks), 12)
    assert got == ref
    assert len(got) <= 12

    # classic MG bound vs exact counts over the whole stream
    exact = Counter(t for toks in batches for t in toks)
    n = sum(exact.values())
    for t, c in got.items():
        assert c <= exact[t]
        assert exact[t] - c <= n // 13 + 1
    # every true heavy hitter above n/(capacity+1) must be present
    for t, c in exact.items():
        if c > n / 13:
            assert t in got
