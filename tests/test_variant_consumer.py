"""Variant helpers, CDC consumer with offsets, log cleanup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta import log as dlog
from deltalake_spark.delta.maintenance import cleanup_log
from deltalake_spark.delta.table import DeltaTable
from deltalake_spark.functions.variant import (
    parse_json_typed,
    shred,
    to_variant,
    try_variant_get,
    variant_get,
)
from deltalake_spark.streaming.consumer import (
    CDCConsumer,
    FileOffsetStorage,
    MemoryOffsetStorage,
)


# -- variant ----------------------------------------------------------------

@pytest.fixture(scope="module")
def vdf(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 5, "tag": "a", "nest": {"x": 1.5}}'),
         (2, '{"k": 9, "tag": "b", "nest": {"x": 2.5}}'),
         (3, '{"k": "oops"}')],
        "id long, j string",
    )
    return df.withColumn("v", to_variant("j"))


def test_variant_roundtrip_and_get(vdf):
    rows = vdf.select(
        "id",
        variant_get("v", "$.tag", "string").alias("tag"),
        try_variant_get("v", "$.nest.x", "double").alias("x"),
        try_variant_get("v", "$.k", "int").alias("k"),
    ).collect()
    by_id = {r.id: r for r in rows}
    assert by_id[1]["tag"] == "a" and by_id[1]["x"] == 1.5
    assert by_id[3]["k"] is None  # "oops" not castable → null, not error


def test_shred_enables_typed_columns(vdf):
    out = shred(vdf, "v", {"k": ("$.k", "int"), "x": ("$.nest.x", "double")})
    assert dict((f.name, f.dataType.typeName()) for f in out.schema.fields)[
        "k"] == "integer"
    got = {r.id: r.k for r in out.collect()}
    assert got[1] == 5 and got[3] is None


def test_parse_json_typed(spark):
    df = spark.createDataFrame(
        [('{"a": 1, "b": "x"}',), ('{"a": 2, "b": "y"}',)], "props string"
    )
    out = parse_json_typed(df, "props", out_col="p")
    assert out.schema["p"].dataType.typeName() == "struct"
    assert out.select("p.a").rdd.map(lambda r: r[0]).collect() == [1, 2]


# -- CDC consumer -----------------------------------------------------------

@pytest.fixture
def cdc_table(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "ct"))
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"))
    t.enable_cdc()
    t.write(spark.createDataFrame([(3, "c")], "id long, s string"))  # v2
    t.delete({"id": 1})                                              # v3
    return t


def test_consumer_poll_and_commit(cdc_table, tmp_path):
    storage = FileOffsetStorage(str(tmp_path / "offsets"))
    c = CDCConsumer(cdc_table, "g1", storage=storage)
    batch = c.poll()
    types = sorted(r["_change_type"] for r in batch.collect())
    assert types == ["delete", "insert"]
    c.commit()
    assert c.committed() == 3
    # nothing new
    assert c.poll().count() == 0
    # new commit arrives
    cdc_table.write(cdc_table.spark.createDataFrame(
        [(9, "z")], "id long, s string"))
    nxt = c.poll().collect()
    assert [r["_change_type"] for r in nxt] == ["insert"]
    assert nxt[0]["id"] == 9


def test_consumer_resume_from_storage(cdc_table, tmp_path):
    storage = FileOffsetStorage(str(tmp_path / "offsets"))
    c1 = CDCConsumer(cdc_table, "g2", storage=storage)
    c1.poll()
    c1.commit()
    # new consumer instance, same group → resumes after offset
    c2 = CDCConsumer(cdc_table, "g2", storage=storage)
    assert c2.position == 4
    assert c2.poll().count() == 0
    # different group sees everything
    c3 = CDCConsumer(cdc_table, "other", storage=MemoryOffsetStorage())
    assert c3.poll().count() == 2


def test_consumer_op_filter_and_seek(cdc_table):
    c = CDCConsumer(cdc_table, "g3", ops=["delete"])
    rows = c.poll().collect()
    assert [r["_change_type"] for r in rows] == ["delete"]
    c.seek_to(0)
    assert c.position == 0
    with pytest.raises(ValueError):
        CDCConsumer(cdc_table, "g4", ops=["upsert"])


# -- log cleanup ------------------------------------------------------------

def test_cleanup_log(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "cl"))
    for i in range(23):
        t.write(spark.createDataFrame([(i,)], "id long"))
    assert dlog.list_checkpoint_versions(t.path) == [10, 20]
    res = cleanup_log(t, retain_checkpoints=1)
    assert res["horizonVersion"] == 20
    assert res["checkpointsDeleted"] == 1
    remaining = dlog.list_commit_versions(t.path)
    assert min(remaining) == 20
    # current state still fully readable
    assert t.to_df().count() == 23
    assert t.to_df(version=21).count() == 22
