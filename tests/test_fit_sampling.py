"""Sample-bounded KMeans/PQ fits (round-9 verdict task 1 — the one
place round 8's code contradicted the 100 TB stance): ``fit_fraction=``
threads through ``kmeans_centroids`` / ``fit_pq_codebooks`` /
``build_ivf_index`` / ``refit_ivf_index`` / ``build_passage_index``,
fitting the clustering on a deterministic Bernoulli sample while the
FULL corpus is still assigned; the manifest pins the fraction so
drift-refits inherit the deployment's choice; a sample too thin to
seat the centroids falls back to the exact full fit; and the sampled
index's recall frontier stays within tolerance of the full-fit
build's."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    ivf_index,
    passage,
    similarity,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

NC, SEED, K, NPROBE = 8, 7, 10, 3


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def _recall(spark, index_dir, queries, truth, use_pq=False):
    fn = ivf_index.ivf_index_topk_pq if use_pq else ivf_index.ivf_index_topk
    got = {
        (r.query_id, r.neighbor_id)
        for r in fn(spark, queries, index_dir, k=K, n_probe=NPROBE).collect()
    }
    return len(got & truth) / len(truth)


def test_sampled_fit_records_fraction_and_holds_recall(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    queries = similarity.default_queries(emb, every=40)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, queries, k=K).collect()
    }

    full = str(tmp_path / "full")
    ivf_index.build_ivf_index(emb, full, n_centroids=NC, seed=SEED, pq_m=8)
    meta_full = ivf_index.read_manifest(full)
    assert "fit_fraction" not in meta_full  # default stays exact

    samp = str(tmp_path / "samp")
    ivf_index.build_ivf_index(
        emb, samp, n_centroids=NC, seed=SEED, pq_m=8, fit_fraction=0.5
    )
    meta = ivf_index.read_manifest(samp)
    assert meta["fit_fraction"] == 0.5  # pinned for the artifact's lifetime
    # assignment is FULL-corpus regardless of the fit sample
    assert meta["n_rows"] == meta_full["n_rows"] == emb.count()
    # the sampled geometry is real: n_centroids centroids, full codebook
    assert (
        spark.read.parquet(f"{samp}/centroids").count() == NC
    )
    assert spark.read.parquet(f"{samp}/pq_codebooks").count() == 8 * meta["pq_ks"]

    # recall frontier within tolerance of the full fit (float + ADC)
    r_full = _recall(spark, full, queries, truth)
    r_samp = _recall(spark, samp, queries, truth)
    assert r_samp >= r_full - 0.12, (r_full, r_samp)
    r_full_pq = _recall(spark, full, queries, truth, use_pq=True)
    r_samp_pq = _recall(spark, samp, queries, truth, use_pq=True)
    assert r_samp_pq >= r_full_pq - 0.15, (r_full_pq, r_samp_pq)

    # deterministic: same corpus + fraction + seed → identical centroids
    samp2 = str(tmp_path / "samp2")
    ivf_index.build_ivf_index(
        emb, samp2, n_centroids=NC, seed=SEED, pq_m=8, fit_fraction=0.5
    )
    c1 = sorted(map(tuple, spark.read.parquet(f"{samp}/centroids").collect()))
    c2 = sorted(map(tuple, spark.read.parquet(f"{samp2}/centroids").collect()))
    assert [(i, tuple(c)) for i, c in c1] == [(i, tuple(c)) for i, c in c2]


def test_too_thin_sample_falls_back_to_full_fit(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    idx = str(tmp_path / "thin")
    # fraction so small the expected sample can't seat NC centroids —
    # the build must fall back to the exact full fit, not crash or
    # produce a degenerate geometry
    ivf_index.build_ivf_index(emb, idx, n_centroids=NC, seed=SEED, fit_fraction=1e-6)
    assert spark.read.parquet(f"{idx}/centroids").count() == NC
    full = str(tmp_path / "full")
    ivf_index.build_ivf_index(emb, full, n_centroids=NC, seed=SEED)
    a = sorted(map(tuple, spark.read.parquet(f"{idx}/centroids").collect()))
    b = sorted(map(tuple, spark.read.parquet(f"{full}/centroids").collect()))
    assert [(i, tuple(c)) for i, c in a] == [(i, tuple(c)) for i, c in b]


def test_refit_inherits_pinned_fraction(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    idx = str(tmp_path / "idx")
    ivf_index.build_ivf_index(
        emb.where(F.col("vec_id") < 300), idx,
        n_centroids=NC, seed=SEED, fit_fraction=0.5,
    )
    ivf_index.update_ivf_index(emb.where(F.col("vec_id") >= 300), idx)
    ivf_index.refit_ivf_index(spark, idx)
    meta = ivf_index.read_manifest(idx)
    assert meta["data_version"] == 1
    assert meta["fit_fraction"] == 0.5  # the deployment's choice carried
    # and an explicit override wins
    ivf_index.refit_ivf_index(spark, idx, fit_fraction=0.8)
    assert ivf_index.read_manifest(idx)["fit_fraction"] == 0.8


def test_passage_build_threads_fit_fraction(spark, sf_dir, tmp_path):
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    idx = str(tmp_path / "pidx")
    passage.build_passage_index(
        docs, idx, n_centroids=4, seed=SEED, fit_fraction=0.5
    )
    assert ivf_index.read_manifest(f"{idx}/vectors")["fit_fraction"] == 0.5
    # the sampled chunk index still serves (snippets resolve)
    queries = spark.createDataFrame(
        [(0, docs.orderBy("doc_id").first().text[:120])], "query_id long, text string"
    )
    hits = passage.passage_topk(spark, queries, idx, k=3, n_probe=4).collect()
    assert hits and all(r.chunk for r in hits)
