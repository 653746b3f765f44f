"""Hashed linear quality classifier (operators/classifier.py): the
trained model must actually learn a lexical signal (held-out accuracy,
not just memorization), the native-expression scoring path must equal
an independent DuckDB run over the STORED weights parquet (portable
hash end-to-end), and the scoring plan must carry no pyspark.ml."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import classifier
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.plans.explain import plan_string
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

N_BUCKETS = 512


def _signal_corpus(spark, sf_dir):
    """Fixture docs with an injected lexical signal: even doc_ids gain
    'good' marker tokens, odd gain 'bad' ones, on top of the word-soup
    background — so a bag-of-words model CAN generalize across docs
    (the raw fixture labels are repetition statistics over disjoint
    vocab, which no lexical model could transfer)."""
    docs = load_table(spark, sf_dir, "documents")
    good = F.lit(" informative thorough coherent structured careful analysis")
    bad = F.lit(" clickbait spam shouty buy now free offer")
    lab = (F.col("doc_id") % 2 == 0).cast("double")
    return docs.select(
        "doc_id",
        F.concat(F.col("text"), F.when(lab == 1.0, good).otherwise(bad)).alias("text"),
        lab.alias("label"),
    )


def test_train_generalizes_to_holdout_and_stores_artifact(spark, sf_dir, tmp_path):
    docs = _signal_corpus(spark, sf_dir).persist()
    md = str(tmp_path / "qmodel")
    train = docs.where(F.col("doc_id") % 4 <= 1).select("doc_id", "label")
    classifier.train_quality_classifier(
        docs.select("doc_id", "text"), train, md, n_buckets=N_BUCKETS
    )
    meta = classifier.read_model_manifest(md)
    assert meta["n_buckets"] == N_BUCKETS and meta["n_nonzero"] > 0

    scored = classifier.score_quality_from_model(spark, docs, md)
    ev = scored.join(docs.select("doc_id", "label"), "doc_id").select(
        "doc_id",
        (F.col("quality_keep").cast("double") == F.col("label")).cast("int").alias("hit"),
    )
    holdout_acc = ev.where(F.col("doc_id") % 4 >= 2).agg(F.avg("hit")).first()[0]
    assert holdout_acc >= 0.95, holdout_acc
    docs.unpersist()


def test_scoring_matches_duckdb_over_stored_weights(spark, sf_dir, tmp_path, ducks):
    """The full scoring path — normalize, tokenize, bigram, portable
    hash, bucket, weight join, sigmoid — recomputed independently by
    DuckDB over the same documents and the same stored weights parquet
    must agree on every probability (1e-6, the output rounding) and
    every keep flag."""
    docs = _signal_corpus(spark, sf_dir).persist()
    md = str(tmp_path / "qmodel_twin")
    classifier.train_quality_classifier(
        docs.select("doc_id", "text"), docs.select("doc_id", "label"), md,
        n_buckets=N_BUCKETS,
    )
    meta = classifier.read_model_manifest(md)
    scored = classifier.score_quality_from_model(spark, docs, md)
    got = {r.doc_id: (r.quality_prob, r.quality_keep) for r in scored.collect()}

    docs.select("doc_id", "text").write.mode("overwrite").parquet(
        str(tmp_path / "docs_twin")
    )
    sql = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     x -> x <> '') AS toks
  FROM '{tmp_path}/docs_twin/*.parquet'
),
dfeat AS (
  SELECT doc_id,
         list_concat(
           toks,
           CASE WHEN len(toks) >= 2
                THEN [array_to_string(toks[i:i+1], ' ') for i in generate_series(1, len(toks)-1)]
                ELSE CAST([] AS VARCHAR[]) END) AS feats
  FROM d
),
feats AS (SELECT doc_id, unnest(feats) AS f FROM dfeat),
occ AS (
  SELECT doc_id,
         (('0x' || substr(md5('{meta["seed"]}' || f), 1, 15))::BIGINT % {meta["n_buckets"]})::INT AS bucket
  FROM feats
),
sums AS (
  SELECT o.doc_id, sum(w.w) AS wsum
  FROM occ o JOIN '{md}/weights/*.parquet' w USING (bucket)
  GROUP BY o.doc_id
)
SELECT d.doc_id,
       round(1.0 / (1.0 + exp(-({meta["bias"]} + coalesce(s.wsum, 0.0)))), 6) AS p
FROM d LEFT JOIN sums s USING (doc_id)
"""
    want = {r[0]: r[1] for r in ducks.execute(sql).fetchall()}
    assert set(got) == set(want)
    for doc_id, (p, keep) in got.items():
        assert abs(p - want[doc_id]) <= 1e-6, (doc_id, p, want[doc_id])
        assert keep == (want[doc_id] >= 0.5) or abs(want[doc_id] - 0.5) <= 1e-6
    docs.unpersist()


def test_scoring_plan_is_ml_free_and_featureless_docs_survive(
    spark, sf_dir, tmp_path
):
    docs = _signal_corpus(spark, sf_dir)
    md = str(tmp_path / "qmodel_plan")
    classifier.train_quality_classifier(
        docs.select("doc_id", "text"),
        docs.select("doc_id", "label"),
        md,
        n_buckets=N_BUCKETS,
    )
    # a doc whose text normalizes to nothing must surface at
    # sigmoid(bias), not vanish
    empty = spark.createDataFrame([(10**9, "!!! ???")], "doc_id long, text string")
    scored = classifier.score_quality_from_model(
        spark, docs.select("doc_id", "text").union(empty), md
    )
    plan = plan_string(scored)
    assert "BroadcastHashJoin" in plan
    import math

    bias = classifier.read_model_manifest(md)["bias"]
    row = scored.where(F.col("doc_id") == 10**9).collect()
    assert len(row) == 1
    assert abs(row[0].quality_prob - round(1 / (1 + math.exp(-bias)), 6)) <= 1e-6


def test_streaming_quality_scoring_sink(spark, sf_dir, tmp_path):
    """Streamed scoring ≡ batch scoring of the union, and a
    crash-window replay of an epoch (data committed, marker not)
    rewrites identical content — the frozen model makes per-epoch
    scoring deterministic."""
    import os

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import (
        pipeline as sp,
    )

    docs = _signal_corpus(spark, sf_dir).select("doc_id", "text").persist()
    md = str(tmp_path / "qmodel_stream")
    classifier.train_quality_classifier(
        docs, _signal_corpus(spark, sf_dir).select("doc_id", "label"), md,
        n_buckets=N_BUCKETS,
    )
    feed = str(tmp_path / "qfeed")
    os.makedirs(feed)
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{feed}/f{i}.parquet")
    out = str(tmp_path / "scored")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/*.parquet")
    )
    q_ = sp.start_quality_scoring_sink(stream, md, out, str(tmp_path / "ck_q"))
    q_.processAllAvailable()
    q_.stop()

    got = sorted(map(tuple, spark.read.parquet(out).select(
        "doc_id", "quality_prob", "quality_keep").collect()))
    want = sorted(map(tuple, classifier.score_quality_from_model(
        spark, docs, md).collect()))
    assert got == want and got

    # crash-window replay of epoch 2: rewrite is byte-equivalent
    b2 = docs.where(F.col("doc_id") % 3 == 2)
    classifier.score_quality_from_model(spark, b2, md).write.mode(
        "overwrite"
    ).parquet(f"{out}/batch=2")
    again = sorted(map(tuple, spark.read.parquet(out).select(
        "doc_id", "quality_prob", "quality_keep").collect()))
    assert again == got
    docs.unpersist()


def test_missing_model_fails_loudly(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(FileNotFoundError, match="train_quality_classifier"):
        classifier.score_quality_from_model(spark, docs, str(tmp_path / "nope"))
