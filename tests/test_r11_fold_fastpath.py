"""Round-11 fold fast-path: the optimization round's internal changes
to the per-epoch fold constant keep every contract bit-identical.

- ``_assign``'s packed-centroid ``array_min`` pick must equal the
  crossJoin+row_number reference formulation it replaced (same
  euclidean-then-centroid_id argmin, including ties).
- ``update_ivf_index``'s ADDITIVE manifest row count must track the
  physical assignments tree exactly across build + folds, and a
  fully-committed epoch replay must no-op (manifest byte-stable).
- ``_write_tix_batch``'s Observation-derived manifest stats must equal
  a ground-truth recount of the written lengths dirs.
- ``_run_fold_legs`` runs every leg and propagates a leg's error.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.vector import (
    norm,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    ivf_index,
    retrieval,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import (
    pipeline as sp,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


def _emb(spark, sf_dir, lo, hi):
    return (
        load_table(spark, sf_dir, "embeddings")
        .where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )


def _docs(spark, sf_dir, lo, hi):
    return (
        load_table(spark, sf_dir, "documents")
        .where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .select("doc_id", "text", "lang", "source")
    )


def _reference_assign(embeddings, centroids):
    """The pre-round-11 crossJoin+row_number formulation, verbatim."""
    w = Window.partitionBy("vec_id").orderBy(
        F.col("_d2").asc(), F.col("centroid_id")
    )
    return (
        embeddings.crossJoin(F.broadcast(centroids))
        .withColumn("_d2", ivf_index._d2("embedding"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", "centroid_id")
    )


def test_assign_argmin_equals_window_reference(spark, sf_dir):
    emb = _emb(spark, sf_dir, 0, 300)
    _, centroids = __import__(
        "real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.similarity",
        fromlist=["kmeans_centroids"],
    ).kmeans_centroids(emb, 8, 7)
    got = {
        (r["vec_id"], r["centroid_id"])
        for r in ivf_index._assign(emb, centroids).select("vec_id", "centroid_id").collect()
    }
    want = {
        (r["vec_id"], r["centroid_id"])
        for r in _reference_assign(emb, centroids).collect()
    }
    assert got == want and len(got) == 300
    # with_d2 surfaces the winning distance without changing the pick
    d2 = ivf_index._assign(emb, centroids, with_d2=True)
    assert "_d2" in d2.columns
    assert {
        (r["vec_id"], r["centroid_id"])
        for r in d2.select("vec_id", "centroid_id").collect()
    } == want


def test_update_ivf_additive_count_tracks_physical(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "ivf_add")
    ivf_index.build_ivf_index(_emb(spark, sf_dir, 0, 100), idx, 4, 7)
    assert ivf_index.read_manifest(idx)["n_rows"] == 100
    ivf_index.update_ivf_index(_emb(spark, sf_dir, 100, 150), idx, epoch=1)
    ivf_index.update_ivf_index(_emb(spark, sf_dir, 150, 180), idx, epoch=2)
    meta = ivf_index.read_manifest(idx)
    physical = spark.read.parquet(f"{idx}/assignments").count()
    assert meta["n_rows"] == physical == 180
    assert meta["last_epoch"] == 2
    assert meta["drift_n"] == 80  # both folds' stats folded once each

    # fully-committed replay: manifest byte-stable, tree untouched
    with open(f"{idx}/{ivf_index._MANIFEST}") as fh:
        before = fh.read()
    ivf_index.update_ivf_index(_emb(spark, sf_dir, 100, 150), idx, epoch=1)
    with open(f"{idx}/{ivf_index._MANIFEST}") as fh:
        assert fh.read() == before
    assert spark.read.parquet(f"{idx}/assignments").count() == 180

    # compaction recounts from ground truth, re-anchoring the additive
    # chain (the invariant the additive fold leans on)
    ivf_index.delete_from_ivf_index(spark, idx, [0, 1, 2])
    ivf_index.compact_ivf_index(spark, idx)
    meta = ivf_index.read_manifest(idx)
    assert meta["n_rows"] == spark.read.parquet(f"{idx}/assignments").count() == 177
    ivf_index.update_ivf_index(_emb(spark, sf_dir, 180, 190), idx, epoch=3)
    assert ivf_index.read_manifest(idx)["n_rows"] == 187


def test_tix_observation_stats_match_recount(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "tix_obs")
    retrieval.build_text_index(_docs(spark, sf_dir, 0, 40), idx)
    retrieval.update_text_index(_docs(spark, sf_dir, 40, 60), idx)
    meta = retrieval.read_text_index_manifest(idx)
    lens = spark.read.parquet(f"{idx}/lengths")
    row = lens.agg(F.count("*").alias("n"), F.sum("dl").alias("s")).first()
    assert meta["n_docs"] == int(row["n"]) == 60
    assert meta["sum_dl"] == int(row["s"])
    # lengths still equal the per-doc posting tf sums (the |d| = Σ tf
    # derivation survived the cache-instead-of-read-back change)
    posts = spark.read.parquet(f"{idx}/postings")
    derived = posts.groupBy("doc_id").agg(F.sum("tf").cast("int").alias("dl2"))
    mism = lens.join(derived, "doc_id").where(F.col("dl") != F.col("dl2"))
    assert mism.isEmpty()


def test_run_fold_legs_runs_all_and_propagates_errors():
    ran = []
    sp._run_fold_legs([lambda: ran.append(1), lambda: ran.append(2), lambda: ran.append(3)])
    assert sorted(ran) == [1, 2, 3]

    def boom():
        raise RuntimeError("leg failed")

    done = []
    with pytest.raises(RuntimeError, match="leg failed"):
        sp._run_fold_legs([lambda: done.append(1), boom, lambda: done.append(2)])
    # the healthy legs still settled before the error propagated
    assert sorted(done) == [1, 2]


def test_build_manifest_baseline_matches_recount(spark, sf_dir, tmp_path):
    """build_ivf_index's Observation-computed (n_rows, build_mean_d2)
    must equal the post-write recount the pre-round-11 code did."""
    idx = str(tmp_path / "ivf_base")
    ivf_index.build_ivf_index(_emb(spark, sf_dir, 0, 120), idx, 4, 7)
    meta = ivf_index.read_manifest(idx)
    assigned = spark.read.parquet(f"{idx}/assignments")
    centroids = spark.read.parquet(f"{idx}/centroids")
    row = (
        assigned.join(F.broadcast(centroids), "centroid_id")
        .agg(
            F.count("*").alias("n"),
            F.avg(
                ivf_index._d2e(F.col("embedding"), F.col("centroid"))
            ).alias("d2"),
        )
        .first()
    )
    assert meta["n_rows"] == int(row["n"]) == 120
    assert meta["build_mean_d2"] == pytest.approx(float(row["d2"]), rel=1e-9)
    assert json.loads(open(f"{idx}/{ivf_index._MANIFEST}").read())["n_rows"] == 120
    assert os.path.isdir(f"{idx}/assignments/batch=-1")
