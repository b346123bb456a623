"""Oracle-twin result-type lint (r3 verdict item 3).

Rounds 1–3 carried driver-hash-red gate rows whose only cause was a
DuckDB HUGEINT column in the oracle twin: DuckDB widens SUM(INTEGER/
BIGINT) — aggregate AND window — to int128, and the driver's value hash
is type-sensitive, so a value-identical result still hash-mismatches.
These tests pin (a) the lint catches a deliberately-HUGEINT fixture,
(b) every registered oracle twin is type-clean at sf0.001.
"""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_oracle import TABLES, lint_oracle_types

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _types(con, sql):
    res = con.sql(sql)
    return list(res.columns), list(res.types)


def test_lint_catches_hugeint_fixture(con):
    # SUM(BIGINT) widens to HUGEINT — the exact shape that sat red
    # in CORRECTNESS_r01..r03 (sessionize_events et al.)
    cols, types = _types(con, "SELECT sum(o_orderkey) AS s FROM orders")
    bad = lint_oracle_types(cols, types)
    assert bad == [("s", "HUGEINT")]


def test_lint_catches_window_sum_hugeint(con):
    # window SUM widens too (shard_assignment_stats's original bug)
    cols, types = _types(
        con,
        "SELECT sum(o_orderkey) OVER (ORDER BY o_orderkey) AS c "
        "FROM orders LIMIT 1")
    assert lint_oracle_types(cols, types) == [("c", "HUGEINT")]


def test_lint_catches_decimal(con):
    cols, types = _types(
        con, "SELECT CAST(1.5 AS DECIMAL(10,2)) AS d")
    bad = lint_oracle_types(cols, types)
    assert bad and bad[0][0] == "d" and "DECIMAL" in bad[0][1]


def test_lint_passes_cast_bigint(con):
    cols, types = _types(
        con, "SELECT CAST(sum(o_orderkey) AS BIGINT) AS s FROM orders")
    assert lint_oracle_types(cols, types) == []


def test_all_registered_twins_are_type_clean(con):
    """No oracle twin may return HUGEINT/DECIMAL — ever again."""
    flagged = {}
    for name, sql in entry_mod.oracle_sql().items():
        cols, types = _types(con, sql)
        bad = lint_oracle_types(cols, types)
        if bad:
            flagged[name] = bad
    assert flagged == {}, (
        f"oracle twins with driver-hash-unsafe types: {flagged}")
