"""Hilbert-curve clustering: curve correctness, locality advantage over
Morton, and end-to-end table clustering."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.curves import hilbert_index_np, max_bits_per_dim
from deltalake_spark.delta.table import DeltaTable


def _morton(coords: np.ndarray, bits: int) -> np.ndarray:
    out = np.zeros(len(coords), dtype=np.int64)
    for b in range(bits - 1, -1, -1):
        for i in range(coords.shape[1]):
            out = (out << 1) | ((coords[:, i] >> b) & 1)
    return out


@pytest.mark.parametrize("d,bits", [(2, 2), (2, 4), (3, 2), (4, 2)])
def test_hilbert_is_unit_step_permutation(d, bits):
    coords = np.array(list(itertools.product(range(1 << bits), repeat=d)))
    idx = hilbert_index_np(coords, bits)
    assert sorted(idx) == list(range((1 << bits) ** d))
    order = coords[np.argsort(idx)]
    steps = np.abs(np.diff(order, axis=0)).sum(axis=1)
    assert (steps == 1).all()  # defining Hilbert property; Morton fails it


def test_hilbert_beats_morton_locality():
    """Chunk the curve into 'files'; per-file bounding-box area must be
    smaller under Hilbert (this is exactly what drives data skipping).
    Chunk counts are non-powers-of-two: real file boundaries don't align
    with Morton quadrants (at aligned splits the two tie)."""
    bits = 5
    coords = np.array(list(itertools.product(range(1 << bits), repeat=2)))

    def avg_box_area(order, nchunks):
        return np.mean([
            (c.max(axis=0) - c.min(axis=0) + 1).prod()
            for c in np.array_split(coords[order], nchunks)
        ])

    h_order = np.argsort(hilbert_index_np(coords, bits))
    m_order = np.argsort(_morton(coords, bits))
    for nchunks in (7, 17, 29):
        h = avg_box_area(h_order, nchunks)
        m = avg_box_area(m_order, nchunks)
        assert h < m, f"{nchunks} chunks: hilbert {h} vs morton {m}"

    # worst-case curve jump: Hilbert always 1, Morton crosses the grid
    h_steps = np.abs(np.diff(coords[h_order], axis=0)).sum(axis=1)
    m_steps = np.abs(np.diff(coords[m_order], axis=0)).sum(axis=1)
    assert h_steps.max() == 1 and m_steps.max() == (1 << bits)


def test_bits_capped_to_long(spark):
    assert max_bits_per_dim(2) == 31
    assert max_bits_per_dim(3) == 21


def test_cluster_table_hilbert(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "h"))
    df = spark.createDataFrame(
        [(i, i % 37, (i * 7) % 53, f"r{i}") for i in range(2000)],
        "id long, a long, b long, s string",
    )
    t.write(df)
    res = t.z_order_hilbert(["a", "b"], target_file_count=4)
    assert res["clusteredColumns"] == ["a", "b"]
    out = t.to_df()
    assert out.count() == 2000
    assert {r["id"] for r in out.collect()} == set(range(2000))
    # clustered: per-file ranges of `a` must be much tighter than global
    spans = (
        out.withColumn("__f", F.col("_metadata.file_path"))
        .groupBy("__f")
        .agg((F.max("a") - F.min("a")).alias("span"))
        .collect()
    )
    assert len(spans) >= 2
    assert min(r["span"] for r in spans) < 36  # global span is 36


def test_clustering_metrics_report_tight_zones(spark, tmp_path):
    from deltalake_spark.delta.maintenance import clustering_metrics

    t = DeltaTable(spark, str(tmp_path / "zm"))
    df = spark.createDataFrame(
        [(i, (i * 13) % 997) for i in range(4000)], "id long, a long"
    )
    t.write(df.repartition(8))  # random layout → wide zones
    before = clustering_metrics(t, ["a"])["zoneMetrics"]["a"]
    res = t.z_order(["a"], target_file_count=8)
    after = res["zoneMetrics"]["a"]
    assert after["avg_zone_width"] < before["avg_zone_width"]
    assert after["est_skip_rate"] > 0.5  # clustered files skip most scans
