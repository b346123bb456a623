"""End-to-end training-data curation pipeline over the documents fixture:

    quality filter → language filter → exact dedup → MinHash-LSH
    near-dup removal → token stats → deterministic stratified sample
    → Delta table with a CHECK constraint.

Everything up to the write composes into ONE lazy DataFrame plan —
Catalyst sees the whole chain (filters reach the scan; each dedup is one
shuffle). This is the composition story the individual operator tests
can't show."""

import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.table import DeltaTable
from deltalake_spark.errors import ConstraintViolationError
from deltalake_spark.operators.dedup import minhash_lsh_candidates
from deltalake_spark.operators.text import (
    language_id,
    quality_score,
    token_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_curation_pipeline(spark, docs, tmp_path):
    n0 = docs.count()

    # 1-2. quality + language gates (pure column expressions, pushdown)
    scored = quality_score(docs).withColumn(
        "q", F.col("quality_score")
    ).withColumn("lid", language_id(F.col("text")))
    kept = scored.filter((F.col("q") >= 0.3) & (F.col("n_chars") >= 50))
    n_quality = kept.count()
    assert 0 < n_quality <= n0

    # 3. exact dedup on normalized text (one hash-agg shuffle)
    exact = kept.withColumn(
        "text_key", F.sha2(F.lower(F.trim(F.col("text"))), 256)
    ).dropDuplicates(["text_key"])
    n_exact = exact.count()
    assert n_exact <= n_quality

    # 4. near-dup removal: keep the smallest doc_id of every LSH bucket
    groups = minhash_lsh_candidates(
        exact, id_col="doc_id", text_col="text",
        num_hashes=32, bands=8,
    )
    losers = (
        groups.select(F.explode("member_ids").alias("doc_id"),
                      F.col("member_ids")[0].alias("keeper"))
        .filter(F.col("doc_id") != F.col("keeper"))
        .select("doc_id").distinct()
    )
    deduped = exact.join(losers, "doc_id", "left_anti")
    n_near = deduped.count()
    assert n_near <= n_exact

    # 5. token stats + deterministic stratified sample (hash-mod, no
    # sampleBy collect)
    final = (
        deduped.withColumn("n_tokens", token_count(F.col("text")))
        .filter(F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 8)
    )
    n_final = final.count()
    assert 0 < n_final <= n_near

    # 6. land in a Delta table guarded by a CHECK constraint
    out = DeltaTable(spark, str(tmp_path / "curated"))
    out.write(final.select("doc_id", "lang", "lid", "q", "n_tokens",
                           "text"))
    out.add_check_constraint("tokens_positive", "n_tokens > 0")
    with pytest.raises(ConstraintViolationError):
        out.write(spark.createDataFrame(
            [(999999, "en", "en", 1.0, 0, "")],
            "doc_id long, lang string, lid string, q double, "
            "n_tokens int, text string"))
    assert out.to_df().count() == n_final

    # the pre-write chain is one plan over two scan branches (main +
    # LSH candidate side); the n_chars filter reaches BOTH parquet scans
    from deltalake_spark.plans import plan_summary
    s = plan_summary(final)
    assert s.cartesian_products == 0 and s.nested_loop_joins == 0
    assert s.scans == 2 and s.scans_with_pushdown == 2
