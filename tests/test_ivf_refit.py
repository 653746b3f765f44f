"""Centroid-drift detection + versioned refit for the persistent IVF
index (round-8 verdict item #3): the fold-time drift metric must sit
≈1 for in-distribution arrivals and cross the threshold under real
drift; ``refit_ivf_index`` must re-cluster into a NEW version tree
committed by one atomic manifest-pointer swap (queries never see a
half-built index; the previous version survives one refit for
in-flight readers); and the streaming hook must fire the refit and
RESTORE recall at the same ``n_probe`` where the frozen-centroid
index lost it.

The drift fixture is engineered, not hoped for: drifted clusters sit
at the MIDPOINTS of the most-separated fitted centroid pairs, with
copies displaced ±δ along the pair axis — each 12-copy cluster
provably straddles the old Voronoi boundary (half its copies assign
to each side), so recall@11 at n_probe=1 is ~0.5 against the frozen
centroids, while a refit re-centers on the clusters and restores it.
"""

from __future__ import annotations

import os

import numpy as np
import pyspark.sql.functions as F
import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    ivf_index,
    similarity,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import (
    pipeline as sp,
)

NC, SEED = 8, 7


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def _drifted_rows(spark, index_dir, n_clusters=8, copies=12, base_id=10_000, t=5.0):
    """Boundary-straddling drifted clusters derived ANALYTICALLY from
    the stored centroids.  Cluster j sits on the perpendicular
    bisector of a close centroid pair (ca, cb), displaced t_j along a
    direction w orthogonal to EVERY centroid difference (a null-space
    vector of the pairwise-difference matrix — 64 dims, 8 centroids,
    so it exists): the w-component cancels from every between-centroid
    comparison, which proves two things at once —

    - drift: every point's distance² to EVERY centroid grows by t_j²
      (the corpus is unit-norm, build_mean_d2 ≤ 2, so the fold ratio
      crosses any reasonable threshold), and
    - straddle: the ±δ displacement along (ca − cb) is the ONLY term
      deciding ca vs cb, so each 12-copy cluster provably splits half
      per cell — the recall-at-fixed-n_probe damage a refit must cure.

    Pairs are filtered so the midpoint's two nearest centroids really
    are the pair (a third centroid closer to the midpoint would
    swallow the whole cluster and nothing would straddle); radii
    t_j = t·(1 + 0.35j) keep the clusters far apart."""
    import itertools

    rows_c = spark.read.parquet(
        f"{ivf_index._data_root(index_dir)}/centroids"
    ).collect()
    cents = {r["centroid_id"]: np.array(r["centroid"], dtype=np.float64) for r in rows_c}
    ids = sorted(cents)
    diffs = np.stack([cents[i] - cents[ids[0]] for i in ids[1:]])
    w = np.linalg.svd(diffs)[2][-1]  # exact null-space direction
    assert np.abs(diffs @ w).max() < 1e-9
    cand = sorted(
        itertools.combinations(ids, 2),
        key=lambda p: float(np.linalg.norm(cents[p[0]] - cents[p[1]])),
    )
    pairs = []
    for a, b in cand:
        m = (cents[a] + cents[b]) / 2.0
        near = sorted(ids, key=lambda c: float(np.linalg.norm(m - cents[c])))
        if {near[0], near[1]} == {a, b}:
            pairs.append((a, b))
        if len(pairs) == n_clusters:
            break
    assert len(pairs) >= 4, "centroid geometry left too few usable pairs"
    rows, vid = [], base_id
    for j, (a, b) in enumerate(pairs):
        m = (cents[a] + cents[b]) / 2.0
        u = cents[a] - cents[b]
        d = 0.05 * float(np.linalg.norm(u))
        u = u / np.linalg.norm(u)
        tj = t * (1.0 + 0.35 * j)
        for i in range(copies):
            sign = 1.0 if i % 2 == 0 else -1.0
            jitter = 1.0 + 0.001 * i  # copies distinct, order stable
            p = m + tj * w + sign * d * jitter * u
            rows.append((vid, [float(x) for x in p]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _topk_rows(df):
    return sorted(
        (r.query_id, r.rnk, r.neighbor_id) for r in df.collect()
    )


def _recall_at(spark, index_dir, queries, truth, k, n_probe):
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_index.ivf_index_topk(
            spark, queries, index_dir, k=k, n_probe=n_probe
        ).collect()
    }
    return len(got & truth) / len(truth)


def test_drift_metric_and_versioned_refit(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    a = emb.where(F.col("vec_id") < 400)
    a2 = emb.where(F.col("vec_id") >= 400)  # same distribution
    idx = str(tmp_path / "ivf")
    ivf_index.build_ivf_index(a, idx, n_centroids=NC, seed=SEED)
    meta = ivf_index.read_manifest(idx)
    assert meta["build_mean_d2"] > 0
    assert meta["drift_ratio"] is None

    # in-distribution fold: the metric stays near 1
    ivf_index.update_ivf_index(a2, idx)
    r1 = ivf_index.ivf_drift_ratio(idx)
    assert r1 is not None and 0.4 <= r1 <= 1.8, r1

    # drifted fold: boundary-midpoint clusters — far from every
    # centroid relative to within-cell spread — push the ratio up
    drifted = _drifted_rows(spark, idx)
    ivf_index.update_ivf_index(drifted, idx)
    r2 = ivf_index.ivf_drift_ratio(idx)
    assert r2 is not None and r2 > 2.0, r2

    # a tombstoned vector must stay gone through the refit
    ivf_index.delete_from_ivf_index(spark, idx, [0])
    n_live = ivf_index._live_assignments(spark, idx).count()

    ivf_index.refit_ivf_index(spark, idx)
    meta = ivf_index.read_manifest(idx)
    assert meta["data_version"] == 1 and meta["refit_count"] == 1
    assert meta["drift_ratio"] is None  # baseline reset
    assert meta["n_rows"] == n_live
    live = ivf_index._live_assignments(spark, idx)
    assert live.count() == n_live
    assert live.where(F.col("vec_id") == 0).count() == 0
    # the previous (root) version survives one refit for in-flight
    # readers; the new tree is complete and queries resolve through it
    assert os.path.isdir(f"{idx}/assignments")
    assert os.path.isdir(f"{idx}/v1/assignments")

    # refit answers = frozen-assign oracle of the live rows against
    # the NEW centroids (the CDC test's equivalence construction)
    from pyspark.sql import Window

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.vector import (
        norm,
    )

    queries = similarity.default_queries(emb, every=80)
    got = _topk_rows(ivf_index.ivf_index_topk(spark, queries, idx, k=5, n_probe=3))
    centroids = spark.read.parquet(f"{idx}/v1/centroids")
    net = live.select("vec_id", "embedding")
    assigned = ivf_index._assign(net, centroids)
    w = Window.partitionBy("query_id").orderBy(F.col("_d2").asc(), F.col("centroid_id"))
    probes = F.broadcast(
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("_d2", ivf_index._d2("query_vec"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .select(
            "query_id", "query_vec", "centroid_id",
            norm(F.col("query_vec")).alias("qnrm"),
        )
    )
    want = _topk_rows(similarity._rank_topk(assigned.join(probes, "centroid_id"), k=5))
    assert got == want and got

    # a half-built NEXT version (crashed refit) is invisible until the
    # pointer swaps: plant a v2 with centroids only, answers unchanged
    os.makedirs(f"{idx}/v2")
    spark.read.parquet(f"{idx}/v1/centroids").write.parquet(f"{idx}/v2/centroids")
    assert _topk_rows(
        ivf_index.ivf_index_topk(spark, queries, idx, k=5, n_probe=3)
    ) == got

    # second refit: v2's orphan is overwritten by the real build, the
    # legacy root data retires, v1 (the new previous) stays
    ivf_index.refit_ivf_index(spark, idx)
    meta = ivf_index.read_manifest(idx)
    assert meta["data_version"] == 2 and meta["refit_count"] == 2
    assert not os.path.isdir(f"{idx}/assignments")
    assert os.path.isdir(f"{idx}/v1") and os.path.isdir(f"{idx}/v2/assignments")
    assert ivf_index._live_assignments(spark, idx).count() == n_live


def test_streamed_drift_triggers_refit_and_restores_recall(
    spark, sf_dir, tmp_path
):
    emb = _emb(spark, sf_dir)
    a = emb.where(F.col("vec_id") < 400)

    # the no-refit twin shows the damage: frozen centroids + drifted
    # boundary clusters → each 12-copy cluster splits across two cells
    twin = str(tmp_path / "twin")
    ivf_index.build_ivf_index(a, twin, n_centroids=NC, seed=SEED)
    drifted = _drifted_rows(spark, twin).persist()
    ivf_index.update_ivf_index(drifted, twin)
    assert ivf_index.ivf_drift_ratio(twin) > 2.0  # the monitored metric crossed

    # truth: each drifted copy's 11 nearest live vectors are exactly
    # its cluster mates (within 2δ; everything else is far)
    d_rows = drifted.collect()
    queries = spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in d_rows if r.vec_id % 12 == 0],
        "query_id long, query_vec array<double>",
    )
    truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(
            a.unionByName(drifted), queries, k=11
        ).collect()
    }
    rec_frozen = _recall_at(spark, twin, queries, truth, k=11, n_probe=1)
    assert rec_frozen < 0.75, rec_frozen  # the frontier really sagged

    # streamed: bootstrap-build on A, drifted fold crosses the
    # threshold, the sink refits
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    schema = "vec_id long, embedding array<double>"
    a.coalesce(1).write.mode("overwrite").parquet(f"{feed}/f0.parquet")
    drifted.coalesce(1).write.mode("overwrite").parquet(f"{feed}/f1.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed + "/*.parquet")
    )
    idx = str(tmp_path / "ivf_stream")
    q = sp.start_embedding_index_sink(
        stream, idx, str(tmp_path / "ck"), n_centroids=NC, seed=SEED,
        refit_threshold=2.0,
    )
    q.processAllAvailable()
    q.stop()
    meta = ivf_index.read_manifest(idx)
    assert meta.get("refit_count", 0) >= 1 and meta.get("data_version") >= 1
    assert meta["last_epoch"] == 1  # the replay guard survived the swap

    rec_refit = _recall_at(spark, idx, queries, truth, k=11, n_probe=1)
    assert rec_refit > rec_frozen + 0.2, (rec_frozen, rec_refit)
    assert rec_refit >= 0.9, rec_refit
    drifted.unpersist()
