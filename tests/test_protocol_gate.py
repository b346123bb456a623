"""Protocol version gating: tables demanding reader/writer versions
beyond this engine must be refused, not silently mis-handled."""

import json
import tempfile

import pytest

from deltalake_spark.delta import log as dlog
from deltalake_spark.delta.table import DeltaTable
from deltalake_spark.errors import UnsupportedProtocolError


def _bump_protocol(table, reader=None, writer=None):
    snap = table.snapshot()
    proto = dict(snap.protocol or {})
    if reader is not None:
        proto["minReaderVersion"] = reader
    if writer is not None:
        proto["minWriterVersion"] = writer
    dlog.write_commit(table.path, snap.version + 1, [
        dlog.commit_info_action("UPGRADE PROTOCOL", {}),
        {"protocol": proto},
    ])


@pytest.fixture()
def table(spark):
    d = tempfile.mkdtemp(prefix="proto_")
    t = DeltaTable(spark, d)
    t.write(spark.createDataFrame([(1, "a")], "id int, v string"))
    return t


def test_normal_versions_pass(table):
    assert table.snapshot().protocol["minReaderVersion"] == 1
    assert table.to_df().count() == 1


def test_high_reader_version_refused(table):
    _bump_protocol(table, reader=9)
    with pytest.raises(UnsupportedProtocolError):
        table.snapshot()


def test_high_writer_version_blocks_mutations_not_reads(spark, table):
    _bump_protocol(table, writer=9)
    assert table.to_df().count() == 1  # reads still fine
    with pytest.raises(UnsupportedProtocolError):
        table.write(spark.createDataFrame([(2, "b")], "id int, v string"))
    with pytest.raises(UnsupportedProtocolError):
        table.delete({"id": {"$eq": 1}})


def test_high_writer_version_blocks_metadata_mutations(spark, table):
    _bump_protocol(table, writer=9)
    for call in (
        lambda: table.rename_column("v", "w"),
        lambda: table.drop_column("v"),
        lambda: table.restore(0),
        lambda: table.update_metadata({"foo": "bar"}),
        lambda: table.add_check_constraint("c", "id > 0"),
    ):
        with pytest.raises(UnsupportedProtocolError):
            call()
