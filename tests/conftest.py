from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from deltalake_spark.session import get_spark

    # fixed memory envelope (r6 verdict ask #6): the 400k-row dbscan/CC
    # volume smokes need real heap headroom, and the suite must not
    # depend on machine solitude — a co-tenant Spark JVM holding half
    # the box OOM'd exactly one test in r6. 16g is ~1/8 of the box:
    # enough for the smokes, small enough to coexist with another
    # full-size JVM. Env-overridable for smaller machines.
    spark = get_spark(
        "deltalake-spark-tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory":
                os.environ.get("SPARK_GRAFT_TEST_DRIVER_MEM", "16g"),
        },
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from deltalake_spark.session import load_tables

    return load_tables(spark, sf_dir)
