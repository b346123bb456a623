"""Generate sf1 fixtures (~10x sf0.1) for the heavy-gate scale sweep
(r10 verdict ask #1).

The driver ships sf0.001/0.01/0.1 read-only; the 128 GiB local[32]
sandbox can hold sf1 (~6M lineitem), which is the cheapest remaining
way to surface scale cliffs the sf0.1 oracle can't see (the r8 k_core
plan-growth class). This script derives sf1 from the sf0.1 tables:

- TPC-H-ish tables (customer/supplier/part/orders/lineitem): 10
  replicas with CONSISTENT key offsets, so every foreign key joins to
  the same replica's dimension row and all join/agg distributions are
  exactly the sf0.1 ones at 10x volume. region/nation copy verbatim
  (fixed 5/25 rows at every sf).
- documents/events/embeddings: regenerated at 10x size from the
  OBSERVED sf0.1 distributions (same ~30-word vocab, language mix,
  source count, doc-length range; same event-type mix, user/value
  ranges; same 10-cluster embedding structure), with planted exact
  and near duplicates so the dedup families have real work — fresh
  ids from 0, deterministic (fixed seeds), no driver data modified.

Usage: python tools/gen_sf1.py [out_dir]   (default /tmp/sf1)
"""
from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "de", "fr", "es"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"wrote {path}: {table.num_rows} rows")


def gen_tpch(con: duckdb.DuckDBPyConnection, out_dir: str) -> None:
    # key offsets: one replica stride per table, larger than max key
    offs = {}
    for t, key in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                   ("part", "p_partkey"), ("orders", "o_orderkey")]:
        offs[t] = con.execute(
            f"SELECT MAX({key}) + 1 FROM "
            f"read_parquet('{SRC}/{t}.parquet')").fetchone()[0]
    specs = {
        "customer": ("c_custkey + r * {customer} AS c_custkey, "
                     "c_name, c_nationkey, c_acctbal, c_mktsegment"),
        "supplier": ("s_suppkey + r * {supplier} AS s_suppkey, "
                     "s_name, s_nationkey, s_acctbal"),
        "part": ("p_partkey + r * {part} AS p_partkey, p_name, "
                 "p_brand, p_type, p_size, p_retailprice"),
        "orders": ("o_orderkey + r * {orders} AS o_orderkey, "
                   "o_custkey + r * {customer} AS o_custkey, "
                   "o_orderstatus, o_totalprice, o_orderdate, "
                   "o_orderpriority"),
        "lineitem": ("l_orderkey + r * {orders} AS l_orderkey, "
                     "l_partkey + r * {part} AS l_partkey, "
                     "l_suppkey + r * {supplier} AS l_suppkey, "
                     "l_linenumber, l_quantity, l_extendedprice, "
                     "l_discount, l_tax, l_returnflag, l_linestatus, "
                     "l_shipdate"),
    }
    for t, sel in specs.items():
        con.execute(f"""
            COPY (
              SELECT {sel.format(**offs)}
              FROM read_parquet('{SRC}/{t}.parquet')
              CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r)
              ORDER BY 1
            ) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET,
                                          COMPRESSION SNAPPY)
        """)
        n = con.execute(f"SELECT COUNT(*) FROM "
                        f"read_parquet('{out_dir}/{t}.parquet')"
                        ).fetchone()[0]
        print(f"wrote {out_dir}/{t}.parquet: {n} rows")
    for t in ("region", "nation"):
        con.execute(f"""
            COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))
            TO '{out_dir}/{t}.parquet' (FORMAT PARQUET,
                                        COMPRESSION SNAPPY)
        """)
        print(f"wrote {out_dir}/{t}.parquet (verbatim)")


def gen_documents(out_dir: str, n_docs: int = 50_000) -> None:
    rng = np.random.RandomState(777)
    ids, texts, langs, sources = [], [], [], []
    doc_id = 0

    def emit(words: list[str], lang: str, source: str) -> None:
        nonlocal doc_id
        ids.append(doc_id)
        texts.append(" ".join(words))
        langs.append(lang)
        sources.append(source)
        doc_id += 1

    while doc_id < n_docs:
        n_words = int(rng.randint(10, 101))
        words = [VOCAB[i] for i in rng.randint(0, len(VOCAB), n_words)]
        lang = LANGS[rng.choice(len(LANGS), p=LANG_P)]
        source = f"src{rng.randint(0, 20)}"
        emit(words, lang, source)
        if doc_id % 40 == 0 and doc_id < n_docs:
            # planted near-dup: copy with 2 token edits + a marker
            w2 = list(words)
            for pos in rng.randint(0, len(w2), 2):
                w2[pos] = "dup"
            emit(w2, lang, source)
        if doc_id % 300 == 0 and doc_id < n_docs:
            emit(words, lang, source)  # planted exact dup
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    _write(out_dir, "documents", tbl)


def gen_embeddings(out_dir: str, n_vecs: int = 20_000,
                   dim: int = 64, n_clusters: int = 10) -> None:
    rng = np.random.RandomState(778)
    centers = rng.randn(n_clusters, dim)
    labels = rng.randint(0, n_clusters, n_vecs)
    vecs = (centers[labels] + 0.6 * rng.randn(n_vecs, dim)).astype(
        np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    _write(out_dir, "embeddings", tbl)


def gen_events(out_dir: str, n_events: int = 1_000_000,
               n_users: int = 15_000) -> None:
    rng = np.random.RandomState(779)
    base_ns = np.int64(1_704_067_200_000_000_000)  # 2024-01-01 UTC
    span_ns = np.int64(90) * 24 * 3600 * 1_000_000_000
    ts = np.sort(base_ns
                 + (rng.random_sample(n_events) * span_ns).astype(
                     np.int64))
    # the driver fixtures store ts as parquet timestamp[us] — mirror
    # that EXACTLY. Full-ns values here made the two engines read
    # different data: Spark surfaces ns longs, DuckDB's TIMESTAMP is
    # µs and silently truncates, which broke the interval/as-of twins
    # at sf1 (r11 finding). Floor to µs and write timestamp[us].
    ts = (ts // 1000).astype(np.int64)
    types = np.array(["view", "click", "purchase", "signup", "error"])
    tbl = pa.table({
        "event_id": pa.array(np.arange(n_events), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(
            rng.randint(0, n_users, n_events), pa.int64()),
        "event_type": pa.array(
            types[rng.randint(0, len(types), n_events)], pa.string()),
        "value": pa.array(
            np.round(rng.exponential(100.0, n_events), 2), pa.float64()),
        "props": pa.array(
            [f'{{"k": {int(k)}}}'
             for k in rng.randint(0, 100, n_events)], pa.string()),
    })
    _write(out_dir, "events", tbl)


TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def manifest(con: duckdb.DuckDBPyConnection, out_dir: str) -> dict:
    """Per-table row counts + order-independent content hashes (sum of
    DuckDB row-struct hashes mod 2^64+) so a committed manifest proves a
    regenerated sf1 tree is bit-identical in content to the one a sweep
    artifact cites (r10 verdict: sf1 fixtures are ephemeral in /tmp)."""
    out = {}
    for t in TABLES:
        n, h = con.execute(
            f"SELECT COUNT(*), CAST(SUM(CAST(hash(t) AS HUGEINT)) "
            f"AS VARCHAR) FROM "
            f"read_parquet('{out_dir}/{t}.parquet') t").fetchone()
        out[t] = {"rows": int(n), "content_hash": h}
    return out


def main() -> None:
    import json

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    gen_tpch(con, out_dir)
    gen_documents(out_dir)
    gen_embeddings(out_dir)
    gen_events(out_dir)
    m = manifest(con, out_dir)
    path = os.path.join(out_dir, "MANIFEST.json")
    with open(path, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
    print(f"wrote {path}")
    print(json.dumps(m, sort_keys=True))


if __name__ == "__main__":
    main()
