"""ts_to_long_nanos: the read-boundary normalization every time-domain
query depends on. Must be correct for long / timestamp / timestamp_ntz
inputs and independent of the session timezone (the driver constructs
its own SparkSession; a tz-sensitive conversion would silently shift
every event time by the host offset)."""

import pyspark.sql.functions as F

from deltalake_spark.session import ts_to_long_nanos


def test_long_passthrough(spark):
    df = spark.createDataFrame([(1, 12345)], "id int, ts long")
    out = ts_to_long_nanos(df)
    assert dict(out.dtypes)["ts"] == "bigint"
    assert out.first().ts == 12345


def test_missing_column_noop(spark):
    df = spark.createDataFrame([(1,)], "id int")
    assert ts_to_long_nanos(df).columns == ["id"]


def test_ntz_is_treated_as_utc_epoch(spark):
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-01 00:00:01.5' AS ts"
    )
    out = ts_to_long_nanos(df)
    assert dict(out.dtypes)["ts"] == "bigint"
    assert out.first().ts == 1_704_067_201_500_000_000


def test_ntz_conversion_ignores_session_timezone(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.sql(
            "SELECT TIMESTAMP_NTZ '2024-01-01 00:00:01.5' AS ts"
        )
        got = ts_to_long_nanos(df).first().ts
        assert got == 1_704_067_201_500_000_000  # NOT shifted by -5h
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_events_fixture_round_trip(spark):
    df = ts_to_long_nanos(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    )
    assert dict(df.dtypes)["ts"] == "bigint"
    lo, hi = df.agg(F.min("ts"), F.max("ts")).first()
    # fixture events live in 2024 (sanity: epoch-ns magnitude + ordering)
    assert 1_700_000_000_000_000_000 < lo <= hi < 1_800_000_000_000_000_000


def test_repeated_gate_queries_do_not_leak_temp_views(spark, sf_dir):
    """Gate queries that register temp views must use deterministic
    names (replace, not accumulate): repeated invocation leaves the
    catalog size unchanged (r2 advisor nit on tfidf_top_terms)."""
    import __spark_entry__ as entry

    q = entry.queries()["tfidf_top_terms"]
    q(spark, sf_dir).collect()
    before = len(spark.catalog.listTables())
    for _ in range(3):
        q(spark, sf_dir).collect()
    assert len(spark.catalog.listTables()) == before
