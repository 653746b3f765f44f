"""MMR result diversification (retrieval.mmr_rerank): exact Python
reference equality, duplicate demotion, batch ≡ solo, edge cases."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    embedder,
    retrieval,
)

DIM = 16


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _mmr_reference(cands, vecs, k, lam):
    """Pure-Python greedy MMR over [(doc_id, score)] and {doc_id: vec}."""
    cands = sorted(cands)
    rel_raw = [s for _, s in cands]
    lo, hi = min(rel_raw), max(rel_raw)
    rel = [1.0 if hi == lo else (s - lo) / (hi - lo) for s in rel_raw]
    V = []
    for d, _ in cands:
        v = np.asarray(vecs.get(d, [0.0]), dtype=float)
        n = np.linalg.norm(v)
        V.append(v / n if n > 0 else v)
    out, max_sim = [], [0.0] * len(cands)
    remaining = list(range(len(cands)))
    while remaining and len(out) < k:
        mmr = [lam * rel[i] - (1 - lam) * max_sim[i] for i in range(len(cands))]
        best = min(remaining, key=lambda i: (-mmr[i], cands[i][0]))
        remaining.remove(best)
        for i in range(len(cands)):
            if len(V[i]) == len(V[best]):
                max_sim[i] = max(max_sim[i], float(V[i] @ V[best]))
        out.append((cands[best][0], round(mmr[best], 6), len(out) + 1))
    return out


def test_matches_python_reference_exactly(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(40)
    vecs_df = embedder.embed_documents(docs, dim=DIM)
    vecs = {r.vec_id: list(r.embedding) for r in vecs_df.collect()}
    cands = [(d, float((d * 2654435761) % 1000) / 1000.0) for d in sorted(vecs)[:25]]
    cand_df = spark.createDataFrame(cands, "doc_id long, rrf double")
    for lam in (0.0, 0.3, 0.7, 1.0):
        got = [
            (r.doc_id, r.mmr_score, r.mmr_rank)
            for r in retrieval.mmr_rerank(cand_df, vecs_df, k=10, lam=lam)
            .orderBy("mmr_rank")
            .collect()
        ]
        want = _mmr_reference(cands, vecs, k=10, lam=lam)
        assert [g[0] for g in got] == [w[0] for w in want], lam
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], abs=1e-6) and g[2] == w[2]


def test_lam_one_is_relevance_order_and_duplicate_demotion(spark, sf_dir):
    """lam=1 reproduces the producer's ranking; lam=0.5 pushes an
    exact duplicate of the #1 result below a dissimilar doc even
    though its raw score is #2."""
    docs = _docs(spark, sf_dir).limit(30)
    vecs_df = embedder.embed_documents(docs, dim=DIM)
    base = {r.vec_id: r for r in vecs_df.collect()}
    ids = sorted(base)[:6]
    top = ids[0]
    # duplicate vector under a fresh id, scored just below the top
    dup_id = 777_777
    rows = [(i, list(base[i].embedding)) for i in ids] + [
        (dup_id, list(base[top].embedding))
    ]
    vdf = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    scores = [(top, 1.0), (dup_id, 0.95)] + [
        (i, 0.9 - 0.05 * n) for n, i in enumerate(ids[1:])
    ]
    cand_df = spark.createDataFrame(scores, "doc_id long, rrf double")

    rel = retrieval.mmr_rerank(cand_df, vdf, k=4, lam=1.0).orderBy("mmr_rank").collect()
    want_order = [d for d, _ in sorted(scores, key=lambda t: (-t[1], t[0]))][:4]
    assert [r.doc_id for r in rel] == want_order
    assert rel[1].doc_id == dup_id  # pure relevance keeps the duplicate at #2

    div = retrieval.mmr_rerank(cand_df, vdf, k=4, lam=0.5).orderBy("mmr_rank").collect()
    assert div[0].doc_id == top
    # the exact duplicate loses its raw-score #2 slot: cos=1 to the
    # already-picked top zeroes its marginal utility (it may still
    # re-enter later once the remaining pool is similar too — the
    # fixture docs share one vocabulary — but never at #2)
    assert div[1].doc_id != dup_id
    ranks = {r.doc_id: r.mmr_rank for r in div}
    assert ranks.get(dup_id, 99) > 2


def test_batch_keys_equal_solo_and_validation(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(40)
    vecs_df = embedder.embed_documents(docs, dim=DIM)
    ids = sorted(r.vec_id for r in vecs_df.select("vec_id").collect())[:20]
    cands = []
    for q in (1, 2):
        cands += [(q, d, float((d * 7 + q) % 13) / 13.0) for d in ids[: 10 * q]]
    cand_df = spark.createDataFrame(cands, "query_id int, doc_id long, rrf double")
    batch = retrieval.mmr_rerank(
        cand_df, vecs_df, k=5, lam=0.6, keys=["query_id"]
    ).collect()
    for q in (1, 2):
        solo = retrieval.mmr_rerank(
            cand_df.where(F.col("query_id") == q).drop("query_id"),
            vecs_df,
            k=5,
            lam=0.6,
        ).collect()
        got = sorted(
            (r.doc_id, r.mmr_score, r.mmr_rank) for r in batch if r.query_id == q
        )
        want = sorted((r.doc_id, r.mmr_score, r.mmr_rank) for r in solo)
        assert got == want and len(want) == 5

    with pytest.raises(ValueError, match="lam"):
        retrieval.mmr_rerank(cand_df, vecs_df, k=5, lam=1.5)
    with pytest.raises(ValueError, match="k must"):
        retrieval.mmr_rerank(cand_df, vecs_df, k=0)
    # vectorless candidates survive and never collide
    stray = spark.createDataFrame(
        [(888_888, 0.99), (ids[0], 1.0), (ids[1], 0.5)], "doc_id long, rrf double"
    )
    out = retrieval.mmr_rerank(stray, vecs_df, k=3, lam=0.5).orderBy("mmr_rank").collect()
    assert {r.doc_id for r in out} == {888_888, ids[0], ids[1]}
    assert all(math.isfinite(r.mmr_score) for r in out)


def test_plan_shape_python_only_on_bounded_lists(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    vecs_df = embedder.embed_documents(docs, dim=DIM)
    cand_df = spark.createDataFrame(
        [(d, 1.0 - d / 100.0) for d in range(20)], "doc_id long, rrf double"
    )
    out = retrieval.mmr_rerank(cand_df, vecs_df, k=5, lam=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # the bounded-list greedy loop
    assert "CartesianProduct" not in plan
    # exactly ONE Python operator: the per-list pick — never a
    # per-corpus-row eval
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "BatchEvalPython" not in plan
