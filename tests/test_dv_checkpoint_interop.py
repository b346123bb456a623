"""Spec DV descriptors must survive checkpointing and log cleanup:
after the commit JSONs that carried the deletionVector adds are pruned,
the checkpoint-reconstructed snapshot still masks deleted rows."""

import os

from deltalake_spark.delta.maintenance import cleanup_log
from deltalake_spark.delta.table import DeltaTable


def test_spec_dv_survives_checkpoint_and_cleanup(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(i,) for i in range(30)], "id long")
            .coalesce(1).orderBy("id"))
    t.enable_deletion_vectors()
    t.delete("id >= 25")          # spec .bin DV
    t.delete("id < 2")            # merged second DV
    survivors = list(range(2, 25))
    assert sorted(r["id"] for r in t.query({}).collect()) == survivors

    # cross the checkpoint interval (10) so a checkpoint lands after
    # the DV commits, then prune the commit JSONs beneath it
    for _ in range(10):
        t.write(spark.createDataFrame([(999,)], "id long"))
    cleanup_log(t, retain_checkpoints=1)

    # fresh snapshot replays from the checkpoint alone: descriptors and
    # the .bin file must still resolve
    snap = t.snapshot()
    descs = [f["deletionVector"] for f in snap.files
             if f.get("deletionVector")]
    assert descs and all(d["storageType"] == "u" for d in descs)
    got = sorted(r["id"] for r in t.query({"id": {"$lt": 999}}).collect())
    assert got == survivors

    # the referenced .bin exists on disk (vacuum/cleanup must not have
    # touched it)
    from deltalake_spark.delta import deletion_vectors as dvmod
    for d in descs:
        cands = dvmod.dv_file_candidates(t.path, d)
        assert any(os.path.exists(c) for c in cands)


def test_spec_dv_update_atomic_with_checkpoint(spark, tmp_path):
    """DV update (soft-delete + append in ONE commit) followed by a
    checkpoint: reconstructed state equals the post-update table."""
    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "id long, v long")
        .coalesce(1).orderBy("id"))
    t.enable_deletion_vectors()
    t.update({"id": {"$gte": 15}}, {"v": "v + 1"})
    for _ in range(10):
        t.write(spark.createDataFrame([(999, 0)], "id long, v long"))
    cleanup_log(t, retain_checkpoints=1)
    rows = {r["id"]: r["v"] for r in
            t.query({"id": {"$lt": 999}}).collect()}
    assert len(rows) == 20
    for i in range(20):
        assert rows[i] == i * 10 + (1 if i >= 15 else 0)
