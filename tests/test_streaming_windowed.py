"""Structured Streaming operators: watermark windows + stateful sessions.

The key property under test: ``stateful_sessions`` emits the same closed
sessions no matter how the input is split into micro-batches — per-key
state (open session) crosses batch boundaries via applyInPandasWithState.
"""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.temporal import sessionize
from deltalake_spark.streaming.windowed import (
    read_parquet_stream,
    run_available_now,
    stateful_sessions,
    windowed_agg,
)

GAP = 1_800_000_000_000  # 30 min in ns
HOUR = 3_600_000_000_000


@pytest.fixture(scope="module")
def event_dir(spark):
    """Events written as several files so maxFilesPerTrigger can force
    multi-batch execution with sessions straddling batch boundaries."""
    base = int(1.7e18)
    rows = []
    eid = 0
    for user in range(4):
        t = base + user * 7_000_000_000
        for s in range(5):  # 5 sessions per user
            for k in range(6):  # 6 events per session, 5 min apart
                rows.append((eid, t, user))
                eid += 1
                t += 300_000_000_000
            t += GAP + 60_000_000_000  # gap closes the session
    d = tempfile.mkdtemp(prefix="events_stream_")
    df = spark.createDataFrame(rows, "event_id long, ts long, user_id long")
    # time-ordered split: sessions span file boundaries
    pdf = df.orderBy("ts", "event_id").toPandas()
    out = os.path.join(d, "files")
    os.makedirs(out)
    for i in range(4):
        chunk = pdf.iloc[i * len(pdf) // 4:(i + 1) * len(pdf) // 4]
        chunk.to_parquet(os.path.join(out, f"part-{i}.parquet"),
                         index=False)
    yield out
    shutil.rmtree(d, ignore_errors=True)


def _closed_sessions_batch(spark, event_dir):
    """Ground truth via the batch sessionize operator: all sessions
    except each user's last (still-open) one."""
    df = spark.read.parquet(event_dir)
    s = sessionize(df, key="user_id", time_col="ts", gap=GAP,
                   tiebreak=["event_id"])
    per = s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        ((F.max("ts") - F.min("ts")) / F.lit(1e9)).alias("span_s"),
    )
    w_max = per.groupBy("user_id").agg(
        F.max("session_seq").alias("max_seq")
    )
    return (
        per.join(w_max, "user_id")
        .filter(F.col("session_seq") < F.col("max_seq"))
        .select("user_id", "session_seq", "n_events", "span_s")
    )


def test_stateful_sessions_match_batch_single_batch(spark, event_dir):
    stream = read_parquet_stream(spark, event_dir)
    out = run_available_now(stateful_sessions(stream, gap_ns=GAP))
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in _closed_sessions_batch(spark, event_dir).collect()}
    assert got == want and len(want) == 4 * 4  # 4 users × 4 closed


def test_stateful_sessions_cross_batch_state(spark, event_dir):
    # one file per micro-batch → sessions straddle batch boundaries;
    # results must be identical to the single-batch run
    stream = read_parquet_stream(spark, event_dir, max_files_per_trigger=1)
    out = run_available_now(stateful_sessions(stream, gap_ns=GAP))
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in _closed_sessions_batch(spark, event_dir).collect()}
    assert got == want


def test_windowed_agg_watermark_bounds_state(spark, event_dir):
    stream = read_parquet_stream(spark, event_dir).withColumn(
        "event_ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )
    win = windowed_agg(
        stream, time_col="event_ts", window="1 hour", watermark="2 hours",
        aggs={"n": "count(*)"},
    )
    out = run_available_now(
        win.select(F.col("window.start").alias("ws"), "n"),
        output_mode="complete",
    )
    batch = (
        spark.read.parquet(event_dir)
        .withColumn("event_ts",
                    F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        .groupBy(F.window("event_ts", "1 hour").start.alias("ws"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert ({tuple(r) for r in out.collect()}
            == {tuple(r) for r in batch.collect()})


def test_session_window_builtin_multi_batch(spark, event_dir):
    """Built-in session_window agrees with the batch sessionize ground
    truth on (user, n_events) multisets for emitted sessions, and is
    invariant to how the input is split into micro-batches."""
    from deltalake_spark.streaming.windowed import session_windows

    def run(max_files=None):
        stream = read_parquet_stream(
            spark, event_dir, max_files_per_trigger=max_files
        ).withColumn("ets", F.timestamp_micros(F.expr("ts div 1000")))
        sess = session_windows(
            stream, time_col="ets", gap="30 minutes", watermark="2 hours",
            group_cols=["user_id"], aggs={"n_events": "count(*)"},
        )
        return run_available_now(sess, output_mode="append")

    single = run()
    got = sorted(
        (r["user_id"], r["n_events"]) for r in single.collect()
    )
    # watermark = max ts - 2h. Each user's session cycle is ~56 min
    # (25 min of events + 31 min gap) and the window end pads +30 min,
    # so exactly the first 2 of 5 sessions per user have
    # end <= max_ts - 2h; later ones are held in state (they'd emit
    # when more data arrives on a live stream)
    assert set(got) <= {(u, 6) for u in range(4)}
    assert got == sorted([(u, 6) for u in range(4)] * 2)

    # multi-batch run must produce the identical result
    multi = run(max_files=1)
    got_multi = sorted(
        (r["user_id"], r["n_events"]) for r in multi.collect()
    )
    assert got_multi == got
    # span sanity: every emitted session covers 5 gaps of 5 min
    spans = {
        int((r["session_end"] - r["session_start"]).total_seconds())
        for r in single.collect()
    }
    assert spans == {5 * 300 + 1800}


def test_stream_stream_interval_join_matches_batch(spark, event_dir):
    """Stream-stream interval join (watermark-bounded state) returns
    exactly the batch interval-join pairs, single- or multi-batch.

    Pairing rule: right events at t join left events in [t-2gap, t)
    of the same user — each event acts as both sides, so every
    consecutive in-session pair qualifies."""
    from deltalake_spark.streaming.windowed import (
        stream_stream_interval_join,
    )

    def run(max_files=None):
        left = read_parquet_stream(
            spark, event_dir, max_files_per_trigger=max_files
        ).select(
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("l_ts"),
            F.col("event_id").alias("l_id"),
        )
        right = read_parquet_stream(
            spark, event_dir, max_files_per_trigger=max_files
        )
        j = stream_stream_interval_join(
            left, right,
            on=("l_user", "user_id"),
            left_time="l_ts", right_time="ts",
            lower_ns=-2 * GAP, upper_ns=0,
            watermark="4 hours",
        )
        return run_available_now(j.select("user_id", "event_id", "l_id"))

    batch = spark.read.parquet(event_dir)
    l = batch.select(F.col("user_id").alias("l_user"),
                     F.col("ts").alias("l_ts"),
                     F.col("event_id").alias("l_id"))
    want = {
        tuple(r)
        for r in l.join(
            batch,
            (F.col("l_user") == F.col("user_id"))
            & (F.col("l_ts") >= F.col("ts") - 2 * GAP)
            & (F.col("l_ts") < F.col("ts")),
        ).select("user_id", "event_id", "l_id").collect()
    }
    got_single = {tuple(r) for r in run().collect()}
    assert got_single == want and len(want) > 0
    got_multi = {tuple(r) for r in run(max_files=1).collect()}
    assert got_multi == want


def test_stream_dedup_replay_exactly_once(spark, event_dir):
    """Every row delivered twice (two file sources over the same dir);
    dropDuplicatesWithinWatermark must emit exactly the single-copy
    set."""
    from deltalake_spark.streaming.windowed import stream_dedup

    def src():
        return read_parquet_stream(spark, event_dir).withColumn(
            "event_ts",
            F.timestamp_micros((F.col("ts") / 1000).cast("long")))

    doubled = src().unionAll(src())
    out = run_available_now(stream_dedup(
        doubled, key_cols=["event_id"], time_col="event_ts",
        watermark="1000 hours"))
    base = spark.read.parquet(event_dir)
    assert out.count() == base.count()
    got = {r["event_id"] for r in out.select("event_id").collect()}
    want = {r["event_id"] for r in base.select("event_id").collect()}
    assert got == want


def test_stream_dedup_across_micro_batches(spark, event_dir):
    """Duplicates split across micro-batches (maxFilesPerTrigger=1 on
    each source) still dedup — key state crosses batch boundaries."""
    from deltalake_spark.streaming.windowed import stream_dedup

    def src():
        return read_parquet_stream(
            spark, event_dir, max_files_per_trigger=1
        ).withColumn(
            "event_ts",
            F.timestamp_micros((F.col("ts") / 1000).cast("long")))

    doubled = src().unionAll(src())
    out = run_available_now(stream_dedup(
        doubled, key_cols=["event_id"], time_col="event_ts",
        watermark="1000 hours"))
    base_n = spark.read.parquet(event_dir).count()
    assert out.count() == base_n


def test_stateful_cusum_matches_batch_closed_form(spark, tmp_path):
    """Cross-batch state: the same input split into MULTIPLE
    micro-batches (maxFilesPerTrigger=1 over several files) must emit
    exactly the batch closed-form crossings."""
    import os

    from deltalake_spark.streaming.windowed import (
        read_parquet_stream,
        run_available_now,
        stateful_cusum,
    )
    from pyspark.sql import functions as F

    # deterministic sawtooth: drift up, crash down, repeat -> several
    # upward crossings under re-arm semantics
    rows = []
    t = 0
    for cycle in range(4):
        for i in range(30):
            rows.append((t, t, "k", 40.0))  # +30/step over target 10
            t += 1
        rows.append((t, t, "k", -2000.0))  # crash resets the statistic
        t += 1
    src = tmp_path / "cusum_src"
    os.makedirs(src)
    df = spark.createDataFrame(
        rows, "event_id long, ts long, event_type string, value double")
    # several files so availableNow takes multiple micro-batches;
    # files partition CONTIGUOUS time ranges (the documented in-order
    # batch contract — an interleaved split would feed state out of
    # event-time order)
    n = len(rows)
    for part in range(4):
        lo, hi = part * n // 4, (part + 1) * n // 4
        df.filter((F.col("event_id") >= lo)
                  & (F.col("event_id") < hi)) \
            .coalesce(1).write.mode("append").parquet(str(src))

    stream = read_parquet_stream(spark, str(src), nanos_cols=(),
                                 max_files_per_trigger=1)
    stream = stream.withColumn(
        "__units", F.round(F.col("value") * 100).cast("long"))
    out = run_available_now(
        stateful_cusum(stream, key="event_type", target_units=1000,
                       threshold_units=50000),
        output_mode="append").collect()
    got = sorted((r["ts"], r["cusum_units"]) for r in out)

    # python closed-form replay with the same re-arm rule
    s_run, mins, alarmed = 0, 0, False
    want = []
    for eid, ts, _, v in sorted(rows):
        s_run += round(v * 100) - 1000
        mins = min(mins, s_run)
        c = s_run - min(mins, 0)
        if c > 50000:
            if not alarmed:
                want.append((ts, c))
                alarmed = True
        else:
            alarmed = False
    assert got == want
    assert len(want) >= 3   # the sawtooth really re-arms


def test_stream_sliding_distinct_identical_to_batch(spark, sf_dir):
    """r9: the streaming DAU/WAU twin must equal the batch operator
    row-for-row — the stream maintains per-day state; the trailing
    RANGE merge over drained state is the same arithmetic as
    operators/sketches.sliding_distinct over the batch daily grain."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    s = sorted(map(tuple, qs["stream_sliding_distinct"](
        spark, sf_dir).collect()))
    b = sorted(map(tuple, qs["sliding_distinct_users"](
        spark, sf_dir).collect()))
    assert s == b
