"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. stats pruning must translate logical predicate names to physical
   stats keys after rename + schema-evolution name reuse;
2. load_snapshot must fail loudly when the commit chain has gaps
   (post-cleanup pre-horizon versions), not return a partial snapshot;
3. DV deletes must land on files whose partition values percent-encode
   in the _metadata.file_path URI;
4. checkpoints must persist remove tombstones so vacuum protection
   survives log cleanup (and the legacy action-column layout stays
   readable);
5. DV update must be a single atomic commit (delete+append together).
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta import log as dlog
from deltalake_spark.delta import snapshot as dsnap
from deltalake_spark.delta.maintenance import cleanup_log, vacuum
from deltalake_spark.delta.table import DeltaTable
from deltalake_spark.errors import VersionNotFoundError


def test_stats_pruning_uses_physical_names_after_rename_reuse(spark, tmp_path):
    """rename a->c, then evolve with a NEW column named a: a filter on the
    reused logical name must prune against the new column's stats key
    (a_<uuid>), not old physical 'a' (which now holds c's data)."""
    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "a long, x double"))
    t.rename_column("a", "c")
    # new file: logical c has LARGE values, reused logical a has 0..9
    t.write(spark.createDataFrame(
        [(1000 + i, float(i), i) for i in range(10)],
        "c long, x double, a long"), merge_schema=True)

    res = t.query({"a": {"$lte": 9}})
    # physical 'a' (= logical c) in the new file is >= 1000: without the
    # mapping translation the new file is pruned and these rows vanish
    assert res.filter(F.col("a").isNotNull()).count() == 10
    # and pruning by the renamed column still works (logical c -> phys a)
    assert t.query({"c": {"$gte": 1000}}).count() == 10
    assert t.last_query_skipped_files >= 1  # old file(s) pruned by stats


def test_snapshot_raises_on_pruned_commit_chain(spark, tmp_path):
    """After cleanup_log removes pre-horizon commits, loading a
    pre-horizon version must raise, not silently return partial state."""
    t = DeltaTable(spark, str(tmp_path / "gap"))
    df = spark.createDataFrame([(1,)], "id long")
    for _ in range(12):  # crosses the checkpoint interval (10)
        t.write(df)
    cleanup_log(t, retain_checkpoints=1)
    assert t.snapshot().version == 11  # head still loads
    with pytest.raises(VersionNotFoundError):
        t.snapshot(version=3)


def test_dv_delete_with_percent_encoded_partition_values(spark, tmp_path):
    """Partition values with space/# percent-encode in the file URI; the
    delete must still attach DV descriptors to those files."""
    t = DeltaTable(spark, str(tmp_path / "enc"))
    t.write(
        spark.createDataFrame(
            [(i, "a b#c" if i % 2 else "plain") for i in range(10)],
            "id long, p string"),
        partition_by=["p"],
    )
    t.update_metadata({"delta.enableDeletionVectors": "true"})
    t.delete({"id": {"$lt": 4}})
    assert t.to_df().count() == 6
    assert t.query({"p": "a b#c"}).count() == 3  # ids 5,7,9
    assert t.query({"p": "plain"}).count() == 3  # ids 4,6,8
    # every touched file carries a descriptor with the right cardinality
    dv_card = {
        f["path"]: f["deletionVector"]["cardinality"]
        for f in t.snapshot().files if f.get("deletionVector")
    }
    assert sum(dv_card.values()) == 4
    assert any("a%20b" in p or "a b" in p for p in dv_card)


def test_checkpoint_persists_tombstones_for_vacuum(spark, tmp_path):
    """Remove tombstones written inside checkpoints keep recently-removed
    files protected from vacuum even after the commit JSONs are pruned."""
    t = DeltaTable(spark, str(tmp_path / "tomb"))
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    t.write(df)
    t.delete({"id": {"$lt": 50}})  # CoW rewrite -> remove tombstone
    for _ in range(10):  # force a checkpoint past the delete
        t.write(spark.createDataFrame([(999,)], "id long"))
    snap = t.snapshot()
    assert any(r for r in snap.tombstones), "tombstones replay from log"
    cleanup_log(t, retain_checkpoints=1)
    # tombstones must survive via the checkpoint now
    assert t.snapshot().tombstones, "tombstones lost with pruned commits"
    res = vacuum(t, retention_hours=1.0, dry_run=True)
    assert res["filesDeleted"] == 0  # removed file still protected


def test_legacy_action_column_checkpoint_still_readable(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "legacy"))
    t.write(spark.createDataFrame([(1,), (2,)], "id long"))
    snap = t.snapshot()
    # hand-write a legacy-layout checkpoint at version 0
    actions = []
    if snap.protocol:
        actions.append({"protocol": snap.protocol})
    actions.append({"metaData": snap.metadata})
    actions.extend({"add": f} for f in snap.files)
    encoded = [json.dumps(a) for a in actions]
    pq.write_table(pa.table({"action": encoded}),
                   dlog.checkpoint_file(t.path, 0))
    with open(dlog.last_checkpoint_file(t.path), "w") as f:
        json.dump({"version": 0, "size": len(actions)}, f)
    reloaded = dsnap.load_snapshot(t.path, 0)
    assert len(reloaded.files) == len(snap.files)
    assert reloaded.schema_string == snap.schema_string


def test_dv_update_is_single_atomic_commit(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "atomic"))
    t.write(spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id long, v double"))
    t.update_metadata({"delta.enableDeletionVectors": "true"})
    v_before = t.version()
    res = t.update({"id": {"$lt": 5}}, {"v": "v + 100"})
    assert res["numUpdatedRows"] == 5
    # exactly ONE commit for the whole delete+append
    assert t.version() == v_before + 1
    actions = dlog.read_commit(t.path, t.version())
    has_dv_add = any(
        a.get("add", {}).get("deletionVector") for a in actions)
    has_data_add = any(
        "add" in a and not a["add"].get("deletionVector") for a in actions)
    assert has_dv_add and has_data_add
    # every intermediate version is consistent: 20 rows at each
    assert t.to_df(version=v_before).count() == 20
    assert t.to_df().count() == 20
    assert t.to_df().filter("v >= 100").count() == 5
