"""Incremental MinHash-LSH index: batch-vs-index dedup must match the
whole-corpus fuzzy flow (when the index precedes the batch), and the
index must accumulate across batches."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import dedup, lsh_index
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


def _corpus(spark, sf_dir, limit=300):
    docs = load_table(spark, sf_dir, "documents").limit(limit)
    return dedup.with_exact_duplicates(docs)  # originals + +100000-id copies


def test_incremental_equals_batch_fuzzy_dedup(spark, sf_dir, tmp_path):
    corpus = _corpus(spark, sf_dir)
    old = corpus.where(F.col("doc_id") < 150)
    new = corpus.where(F.col("doc_id") >= 150)  # all ids above the index's

    idx = str(tmp_path / "idx")
    lsh_index.build_minhash_index(old, idx)
    got = sorted(
        r["doc_id"] for r in lsh_index.dedup_against_index(spark, new, idx).collect()
    )

    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    want = sorted(
        r["doc_id"]
        for r in dedup.fuzzy_dedup_keep(old.unionByName(new)).collect()
        if r["doc_id"] in new_ids
    )
    assert got == want and len(got) > 0


def test_index_accumulates_across_batches(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(120)
    old = docs.where(F.col("doc_id") < 60)
    batch1 = docs.where(F.col("doc_id") >= 60)
    # batch2 = exact copies of batch1 docs under fresh ids: every one
    # must drop, but ONLY because batch1 was folded into the index
    batch2 = batch1.select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )

    idx = str(tmp_path / "idx")
    lsh_index.build_minhash_index(old, idx)
    kept1 = lsh_index.dedup_against_index(spark, batch1, idx)
    assert kept1.count() > 0
    lsh_index.update_minhash_index(batch1, idx)

    kept2 = lsh_index.dedup_against_index(spark, batch2, idx)
    assert kept2.count() == 0  # all near-dup the now-indexed batch1

    # without the update, batch2 would have survived against old alone
    idx2 = str(tmp_path / "idx2")
    lsh_index.build_minhash_index(old, idx2)
    assert lsh_index.dedup_against_index(spark, batch2, idx2).count() > 0


def test_missing_index_raises(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    with pytest.raises(FileNotFoundError, match="build_minhash_index"):
        lsh_index.dedup_against_index(spark, docs, str(tmp_path / "nope"))
