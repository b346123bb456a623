"""Quantified recall bounds for the four (formerly rows-only) ANN/LSH
gate queries (minhash_neardup_groups, simhash_blocks,
embedding_knn_join, ivf_ann_topk). Since r7 all four run on portable /
exact-integer hashing and carry value-level DuckDB twins — the oracle
now proves the computation is THE declared recursion, and these tests
keep proving the recursion is a GOOD one: recall against exact ground
truth at sf0.01, so a silent recall collapse (bad banding, broken
probe) fails CI even though the twin would still match.

Measured baselines at sf0.01 (r7, portable hashing, seed-stable
synthetic data): minhash 1.00, simhash 60-bit prefix-12 ≥ 0.55 floor
(banded native twin 1.00 by pigeonhole), planted-near-dup knn ≥ 0.6
floor (8 quantized sign planes at cos≈0.99), ivf nprobe=4/8 vs
exhaustive ≥ 0.6 floor. Floors sit below the measured values so only
a real regression trips them.
"""

import collections
import itertools
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01), reason="sf0.01 fixtures not present"
)


def _pairs_from_groups(rows):
    out = set()
    for g in rows:
        mem = sorted(int(x) for x in g["member_ids"].split(","))
        out.update(itertools.combinations(mem, 2))
    return out


def test_minhash_gate_recall(spark):
    """Every true 5-shingle-Jaccard >= 0.8 pair must be recalled by the
    gate's LSH banding (32 hashes / 8 bands: theoretical candidate
    probability at s=0.8 is 1-(1-0.8^4)^8 ~ 0.985)."""
    import __spark_entry__ as entry

    docs = spark.read.parquet(SF01 + "/documents.parquet") \
        .select("doc_id", "text").collect()
    shingles = {
        r["doc_id"]: set(r["text"][i:i + 5]
                         for i in range(max(len(r["text"]) - 4, 1)))
        for r in docs
    }
    ids = sorted(shingles)
    true_pairs = set()
    for a, b in itertools.combinations(ids, 2):
        sa, sb = shingles[a], shingles[b]
        # Jaccard >= 0.8 needs size ratio >= 0.8 — skip hopeless pairs
        if min(len(sa), len(sb)) < 0.8 * max(len(sa), len(sb)):
            continue
        inter = len(sa & sb)
        if inter / (len(sa) + len(sb) - inter) >= 0.8:
            true_pairs.add((a, b))
    assert len(true_pairs) >= 10, "fixture lost its planted near-dups"

    cand = _pairs_from_groups(
        entry.queries()["minhash_neardup_groups"](spark, SF01).collect())
    recall = len(true_pairs & cand) / len(true_pairs)
    assert recall >= 0.9, f"minhash recall collapsed: {recall:.2f}"


def test_simhash_gate_recall_and_banded_guarantee(spark):
    """Ground truth: pairs within Hamming distance 3 of the 64-bit
    fingerprint. The gate's single 12-bit-prefix blocking is partial by
    design (measured 0.71) — floor 0.55; the banded operator must reach
    recall 1.0 (pigeonhole: <4 differing bits cannot hit all 4 bands)."""
    from deltalake_spark.operators.dedup import simhash64, simhash_near_pairs
    import __spark_entry__ as entry

    docs = spark.read.parquet(SF01 + "/documents.parquet")
    fps = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", simhash64(F.col("text")).alias("fp")).collect()
    }
    near = set()
    for a, b in itertools.combinations(sorted(fps), 2):
        if ((fps[a] ^ fps[b]) & ((1 << 64) - 1)).bit_count() <= 3:
            near.add((a, b))
    assert len(near) >= 10, "fixture lost its planted near-dups"

    blocked = _pairs_from_groups(
        entry.queries()["simhash_blocks"](spark, SF01).collect())
    recall = len(near & blocked) / len(near)
    assert recall >= 0.55, f"simhash prefix recall collapsed: {recall:.2f}"

    banded = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in simhash_near_pairs(
            docs, id_col="doc_id", text_col="text",
            bands=4, max_hamming=3).collect()
    }
    missed = near - banded
    assert not missed, f"banded guarantee violated: {sorted(missed)[:5]}"


def test_knn_join_planted_neardup_recall(spark):
    """The sf0.01 embeddings are near-orthogonal (max off-diagonal
    cosine ~0.48), so exact top-3 of random vectors is not a meaningful
    LSH target. Instead, PLANT near-duplicates (cos >= 0.99) and require
    the gate's 8-plane blocked kNN join to place the original in the
    plant's top-3: sign-LSH theory gives ~0.98^8 ~ 0.85 per plant."""
    from deltalake_spark.operators.similarity import pairwise_topk_join

    emb = spark.read.parquet(SF01 + "/embeddings.parquet") \
        .select("vec_id", "embedding")
    rows = emb.collect()
    base = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in rows}
    plant_ids = sorted(base)[:20]
    planted = []
    for vid in plant_ids:
        v = base[vid]
        noise = 0.01 * np.linalg.norm(v) / np.sqrt(len(v)) \
            * np.array([1 if i % 2 else -1 for i in range(len(v))])
        w = v + noise
        cos = float(v @ w / (np.linalg.norm(v) * np.linalg.norm(w)))
        assert cos >= 0.99  # the plant really is a near-dup
        planted.append((100000 + vid, [float(x) for x in w]))
    aug = emb.unionByName(spark.createDataFrame(
        planted, "vec_id long, embedding array<double>"))

    left = aug.filter(F.col("vec_id") >= 100000).select(
        F.col("vec_id").alias("query_id"), "embedding")
    right = aug.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    out = pairwise_topk_join(
        left, right, left_id="query_id", right_id="neighbor_id",
        k=3, num_planes=8,
    ).collect()
    got = collections.defaultdict(set)
    for r in out:
        got[r["query_id"]].add(r["neighbor_id"])
    hits = sum(1 for vid in plant_ids
               if vid in got.get(100000 + vid, set()))
    recall = hits / len(plant_ids)
    assert recall >= 0.6, f"planted near-dup recall: {recall:.2f}"


def test_ivf_gate_recall_vs_exhaustive_twin(spark):
    """ivf_ann_topk (nprobe=4 of 8) against its value-oracled exhaustive
    twin: per-query top-10 overlap (measured 0.80)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    ann = collections.defaultdict(set)
    for r in qs["ivf_ann_topk"](spark, SF01).collect():
        ann[r["vec_id"]].add(r["corpus_id"])
    exact = collections.defaultdict(set)
    for r in qs["ivf_exhaustive_topk"](spark, SF01).collect():
        exact[r["vec_id"]].add(r["corpus_id"])
    assert exact, "exhaustive twin returned nothing"
    hits = sum(len(ann[q] & exact[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    assert recall >= 0.6, f"ivf probe recall collapsed: {recall:.2f}"
