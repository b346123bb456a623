"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at the given
scale factor, compares row counts, column names, and order-insensitive
exact values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
Env:   ORACLE_JOBS=N  — run N queries concurrently (default 4; Spark
       schedules concurrent jobs from threads fine, DuckDB gets a cursor
       per worker). Streaming queries are serialized within a worker.
       ORACLE_JSON=path — also write a per-query JSON artifact
       {query: {status, seconds, rows, message}, ...} plus totals —
       the committed per-round gate record (ORACLE_SF01_rN.json; the
       r7 CC bug was caught only by a full sf0.1 value-level sweep,
       so the sweep is now a standing artifact, not builder memory).
       ORACLE_EXCLUDE=a,b — skip named gates (the sf1 sweep runs the
       few spill-monster twins serially in a second pass).
"""

from __future__ import annotations

import json
import math
import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from deltalake_spark.session import get_spark

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


# Oracle result types the driver's hash treats differently from the
# matching Spark type even when values are identical. DuckDB widens
# SUM(INTEGER/BIGINT) — aggregate AND window — to HUGEINT (int128);
# the r1–r3 sessionize_events reds were exactly this, not float drift.
# Twins must CAST(... AS BIGINT) (or ::DOUBLE for decimals).
BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "INT128")


def lint_oracle_types(ocols, otypes):
    """Return list of (col, type) pairs whose DuckDB type the driver
    hashes differently from Spark's. Empty list = clean."""
    bad = []
    for col, t in zip(ocols, otypes):
        ts = str(t).upper()
        if any(b in ts for b in BANNED_ORACLE_TYPES):
            bad.append((col, str(t)))
    return bad


def norm_value(v):
    # exact-repr compare: the driver hashes exact values AND their types,
    # so a %.6g-style normalization here would hide drift the driver
    # still catches. (The r1 "1-ulp drift" post-mortem for
    # sessionize_events was a misdiagnosis — the real cause was a
    # HUGEINT oracle column, now caught by lint_oracle_types.)
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(norm_value(row[i]) for i in order))
    return sorted(out)


def check_one(spark, con, sf_dir, name, fn, oracles):
    """Returns (status, message) where status ∈ {PASS, FAIL, WEAK}."""
    try:
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:
        return "FAIL", f"{name}: spark error {type(e).__name__}: {e}"
    if name not in oracles:
        return "WEAK", f"{name}: rows-only ({len(srows)} rows)"
    try:
        res = con.sql(oracles[name])
        ocols = list(res.columns)
        otypes = list(res.types)
        orows = res.fetchall()
    except Exception as e:
        return "FAIL", f"{name}: duckdb error: {e}"
    bad_types = lint_oracle_types(ocols, otypes)
    if bad_types:
        return "FAIL", (f"{name}: oracle result has driver-hash-unsafe "
                        f"type(s) {bad_types} — CAST to BIGINT/DOUBLE "
                        f"in oracle_sql()")
    if sorted(scols) != sorted(ocols):
        return "FAIL", (f"{name}: columns spark={sorted(scols)} "
                        f"oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        return "FAIL", (f"{name}: rowcount spark={len(srows)} "
                        f"oracle={len(orows)}")
    sn = norm_rows(scols, srows)
    on = norm_rows(ocols, orows)
    if sn != on:
        diffs = [(a, b) for a, b in zip(sn, on) if a != b][:3]
        return "FAIL", f"{name}: value mismatch, first diffs: {diffs}"
    return "PASS", f"{name} ({len(srows)} rows)"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    jobs = int(os.environ.get("ORACLE_JOBS", "4"))

    base = duckdb.connect()
    # ORACLE_DUCKDB_MEM caps the oracle's memory so huge twins SPILL to
    # temp disk instead of tripping the machine OOM killer (a 66 GB
    # twin RSS killed an sf1 patch pass mid-round-11; DuckDB's default
    # limit is a fraction of total RAM, which overcommits when several
    # engines share the box)
    mem = os.environ.get("ORACLE_DUCKDB_MEM")
    if mem:
        base.sql(f"SET memory_limit='{mem}'")
    for t in TABLES:
        base.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    excl = set(filter(None, os.environ.get(
        "ORACLE_EXCLUDE", "").split(",")))
    todo = [(n, f) for n, f in qs.items()
            if (not only or n in only) and n not in excl]

    # streaming / stateful queries mutate session-level state (memory
    # sinks, temp tables); run them serially after the parallel batch
    serial = [(n, f) for n, f in todo
              if n.startswith("stream_") or n.startswith("delta_")
              or n.startswith("incremental")]
    parallel = [(n, f) for n, f in todo if (n, f) not in serial]

    lock = threading.Lock()
    counts = {"PASS": 0, "FAIL": 0, "WEAK": 0}
    results: dict[str, dict] = {}
    t_start = time.time()

    def run(item):
        name, fn = item
        con = base.cursor()
        t0 = time.time()
        status, msg = check_one(spark, con, sf_dir, name, fn, oracles)
        dt = round(time.time() - t0, 2)
        with lock:
            counts[status] += 1
            results[name] = {"status": status, "seconds": dt,
                             "message": msg}
            print(f"{status} {msg}", flush=True)

    if jobs > 1 and len(parallel) > 1:
        with ThreadPoolExecutor(max_workers=jobs) as ex:
            list(ex.map(run, parallel))
    else:
        for item in parallel:
            run(item)
    for item in serial:
        run(item)

    print(f"\n{counts['PASS']} pass, {counts['FAIL']} fail, "
          f"{counts['WEAK']} weak (rows-only)")
    out_path = os.environ.get("ORACLE_JSON")
    if out_path:
        artifact = {
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "pass": counts["PASS"],
            "fail": counts["FAIL"],
            "weak": counts["WEAK"],
            "wall_seconds": round(time.time() - t_start, 1),
            "jobs": jobs,
            "queries": dict(sorted(results.items())),
        }
        with open(out_path, "w") as fh:
            json.dump(artifact, fh, indent=1)
        print(f"wrote {out_path}")
    sys.exit(1 if counts["FAIL"] else 0)


if __name__ == "__main__":
    main()
