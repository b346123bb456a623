"""Multi-part checkpoints (reference src/delta/checkpoint.ts:250-340)
and compaction selection strategies (compaction/index.ts:1492-1538)."""

import json
import os

import pytest

from deltalake_spark.delta import log as dlog
from deltalake_spark.delta import snapshot as dsnap
from deltalake_spark.delta.maintenance import (
    _select_bin_packing,
    _select_sort_by_size,
)
from deltalake_spark.delta.table import DeltaTable


@pytest.fixture()
def table(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id long, s string"
    )
    t.write(df.repartition(6))
    t.write(df.repartition(5), mode="append")
    return t


class TestMultiPartCheckpoint:
    def test_roundtrip(self, table):
        snap = table.snapshot()
        dsnap.write_checkpoint(table.path, snap, max_actions_per_part=4)
        parts = dlog.checkpoint_files(table.path, snap.version)
        assert len(parts) > 1
        with open(dlog.last_checkpoint_file(table.path)) as f:
            pointer = json.load(f)
        assert pointer["parts"] == len(parts)
        # snapshot reconstructed from the multi-part checkpoint alone
        reloaded = dsnap.load_snapshot(table.path, snap.version)
        assert {f["path"] for f in reloaded.files} \
            == {f["path"] for f in snap.files}
        assert table.to_df().count() == 200

    def test_single_part_unchanged(self, table):
        snap = table.snapshot()
        path = dsnap.write_checkpoint(table.path, snap)
        assert path.endswith(".checkpoint.parquet")
        assert len(dlog.checkpoint_files(table.path, snap.version)) == 1

    def test_cleanup_removes_all_parts(self, table, spark):
        snap = table.snapshot()
        dsnap.write_checkpoint(table.path, snap, max_actions_per_part=4)
        df = spark.createDataFrame([(999, "x")], "id long, s string")
        table.write(df)
        dsnap.write_checkpoint(table.path, table.snapshot())
        table.write(df)
        dsnap.write_checkpoint(table.path, table.snapshot())
        from deltalake_spark.delta.maintenance import cleanup_log

        res = cleanup_log(table, retain_checkpoints=2)
        assert res["checkpointsDeleted"] == 1
        assert dlog.checkpoint_files(table.path, snap.version) == []


class TestCompactionStrategies:
    def _mk(self, sizes):
        return [{"path": f"f{i}", "size": s} for i, s in enumerate(sizes)]

    def test_sort_by_size_orders_ascending(self):
        out = _select_sort_by_size(self._mk([30, 10, 20]), 100)
        assert [f["size"] for f in out] == [10, 20, 30]

    def test_bin_packing_skips_singletons(self):
        # 60+30 fit one bin; 90 alone → excluded (no benefit)
        out = _select_bin_packing(self._mk([60, 90, 30]), 100)
        assert sorted(f["size"] for f in out) == [30, 60]

    def test_bin_packing_multiple_bins(self):
        out = _select_bin_packing(self._mk([50, 45, 40, 35, 10]), 100)
        # FFD: 50+45 | 40+35+10 → everything selected, two bins
        assert sorted(f["size"] for f in out) == [10, 35, 40, 45, 50]

    def test_compact_with_strategy_end_to_end(self, table):
        before = len(table.snapshot().files)
        res = table.compact(strategy="bin-packing", min_files=2)
        assert res["filesCompacted"] >= 2
        assert len(table.snapshot().files) < before
        assert table.to_df().count() == 200

    def test_unknown_strategy_rejected(self, table):
        with pytest.raises(ValueError, match="Unknown strategy"):
            table.compact(strategy="quantum")
