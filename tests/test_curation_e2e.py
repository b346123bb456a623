"""End-to-end curation pipeline (r10 verdict ask #6): curate_corpus
composes gopher quality -> winnow decontam -> incremental minhash
dedup -> temperature budgets + token-budget sampling -> shard layout.
Each stage operator is pinned by its own test file; here we pin the
COMPOSITION: planted docs are dropped by exactly the intended stage,
and the whole chain equals the same stages hand-chained."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

GOOD = ("the quick brown fox jumps over the lazy dog while the "
        "other animals watch the show with great interest today")
EVAL_TEXT = ("the benchmark answer key states that paris is the "
             "capital city of france and berlin of germany exactly")
INDEX_TEXT = ("the previously ingested document about spark joins "
              "and the shuffle machinery that moves data between "
              "the executor nodes")


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string")


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    from deltalake_spark.delta.table import DeltaTable
    from deltalake_spark.operators.curation import curate_corpus
    from deltalake_spark.operators.dedup import minhash_index_write

    batch_rows = [
        # planted: fails gopher (8 words < min_words=15)
        (1, "too short to pass the word count rule", "s0"),
        # planted: verbatim eval doc -> winnow-decontaminated
        (2, EVAL_TEXT, "s0"),
        # planted: verbatim index doc -> minhash is_new = False
        (3, INDEX_TEXT, "s0"),
    ]
    # survivors: distinct good docs across two sources
    for i in range(4, 24):
        src = "s0" if i % 2 == 0 else "s1"
        batch_rows.append(
            (i, GOOD + f" variant token{i} alpha{i} beta{i}", src))
    batch = _mk(spark, batch_rows)
    eval_df = spark.createDataFrame(
        [(100, EVAL_TEXT)], "doc_id long, text string")
    index_docs = _mk(spark, [(200, INDEX_TEXT, "s0")])
    table = DeltaTable(
        spark, str(tmp_path_factory.mktemp("cure2e") / "idx"))
    minhash_index_write(
        index_docs, table, id_col="doc_id", text_col="text",
        num_hashes=32, bands=8, hash_mode="portable")
    out = curate_corpus(
        batch, eval_df, table, shard_tokens=60).collect()
    return batch_rows, out


def test_planted_docs_dropped_by_their_stage(pipeline_out):
    _, out = pipeline_out
    ids = {r["doc_id"] for r in out}
    assert 1 not in ids  # gopher
    assert 2 not in ids  # decontam
    assert 3 not in ids  # dedup vs index
    assert len(ids) > 0


def test_composition_equals_hand_chained_stages(spark, pipeline_out,
                                                tmp_path):
    from deltalake_spark.delta.table import DeltaTable
    from deltalake_spark.operators.curation import (
        curate_corpus, gopher_quality_flags, winnow_decontaminate)
    from deltalake_spark.operators.dedup import (
        minhash_dedup_incremental, minhash_index_write)
    from deltalake_spark.operators.mixing import (
        assign_shards, sample_by_token_budget, temperature_budgets)

    batch_rows, out = pipeline_out
    batch = _mk(spark, batch_rows)
    eval_df = spark.createDataFrame(
        [(100, EVAL_TEXT)], "doc_id long, text string")
    index_docs = _mk(spark, [(200, INDEX_TEXT, "s0")])
    table = DeltaTable(spark, str(tmp_path / "idx2"))
    minhash_index_write(
        index_docs, table, id_col="doc_id", text_col="text",
        num_hashes=32, bands=8, hash_mode="portable")

    kept = gopher_quality_flags(
        batch, min_words=15, min_stopwords=1,
    ).filter("pass_all").select("doc_id", "text", "source")
    dec = winnow_decontaminate(kept, eval_df)
    probe = minhash_dedup_incremental(
        dec, table, id_col="doc_id", text_col="text",
        num_hashes=32, bands=8, hash_mode="portable")
    fresh = dec.join(
        probe.filter("is_new").select("doc_id"), "doc_id", "left_semi")
    budgets = temperature_budgets(fresh)
    sel = sample_by_token_budget(fresh, budgets, seed=7)
    manual = assign_shards(
        sel.select("doc_id", "text", "source"),
        shard_tokens=60, seed=3,
    ).select("doc_id", "source", "tok", "cum_tokens", "shard_id")

    assert sorted(tuple(r) for r in manual.collect()) == \
        sorted(tuple(r) for r in out)


def test_budget_and_shard_invariants(spark, pipeline_out):
    from deltalake_spark.operators.mixing import token_count

    batch_rows, out = pipeline_out
    batch = _mk(spark, batch_rows)
    toks = {r["doc_id"]: r["t"] for r in batch.select(
        "doc_id", token_count(F.col("text")).alias("t")).collect()}
    # tok column matches the whitespace token count of the source doc
    for r in out:
        assert r["tok"] == toks[r["doc_id"]]
    # shards are contiguous prefixes of the cum order and every doc
    # STARTS inside its shard
    for r in out:
        assert (r["cum_tokens"] - r["tok"]) // 60 == r["shard_id"]
    # the sampled total respects the 2/5 temperature budget overall:
    # kept tokens never exceed total survivor tokens * 2/5 + slack of
    # one doc per source (prefix rule)
    kept_total = sum(r["tok"] for r in out)
    survivor_total = sum(
        toks[i] for i, _, _ in batch_rows
        if i in {r["doc_id"] for r in out} or i >= 4)
    assert kept_total <= survivor_total * 2 // 5 + 2 * max(
        toks.values())
