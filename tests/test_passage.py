"""Passage-level (MaxP) semantic retrieval — the chunk → embed → IVF
composition: doc ranking must equal a pure-numpy MaxP oracle computed
over the (independently tested, DuckDB-twinned) chunk embeddings at
exhaustive probing; the pid bit-pack must be invertible and loudly
guarded; updates fold without refit and deletes retire whole docs."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    corpus as corpus_mod,
    embedder,
    passage,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

QUERY_SCHEMA = "query_id long, text string"


def _docs(spark, sf_dir, lo, hi):
    return (
        load_table(spark, sf_dir, "documents")
        .where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .select("doc_id", "text")
    )


def _numpy_maxp(spark, docs, queries, k):
    """Independent MaxP oracle: chunk with the tested chunker, embed
    chunks and queries with the tested (DuckDB-twinned) embedder, then
    exact cosine + max-per-doc + ranking in pure numpy."""
    ch = corpus_mod.content_defined_chunks(docs).select(
        "doc_id", "chunk_idx", F.col("chunk").alias("text")
    )
    cid = ch.select(
        (F.col("doc_id") * (1 << 20) + F.col("chunk_idx")).alias("doc_id"), "text"
    )
    cv = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in embedder.embed_documents(cid).where(F.col("n_tokens") > 0).collect()
    }
    qv = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in embedder.embed_documents(queries, id_col="query_id")
        .where(F.col("n_tokens") > 0)
        .collect()
    }
    out = {}
    for q, v in qv.items():
        nv = np.linalg.norm(v)
        best = {}  # doc -> (score6, pid)
        for pid, c in cv.items():
            nc = np.linalg.norm(c)
            if nv == 0 or nc == 0:
                continue
            # the engine ranks on the 6dp cosine with a pid tie-break
            s = round(float(v @ c / (nv * nc)), 6)
            d = pid >> 20
            if d not in best or (s, -pid) > (best[d][0], -best[d][1]):
                best[d] = (s, pid)
        # doc order = first appearance in chunk order (MaxP): best
        # score desc, then the winning chunk's pid asc
        ranked = sorted(best.items(), key=lambda kv: (-kv[1][0], kv[1][1]))[:k]
        out[q] = [(d, s, pid) for d, (s, pid) in ranked]
    return out


def test_passage_topk_matches_numpy_maxp_oracle(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir, 0, 80)
    idx = str(tmp_path / "pidx")
    passage.build_passage_index(docs, idx, n_centroids=4, seed=7)

    # queries = verbatim passages lifted from two docs + a fresh one
    snippets = (
        corpus_mod.content_defined_chunks(docs)
        .where(F.length("chunk") > 40)
        .orderBy("doc_id", "chunk_idx")
        .limit(2)
        .collect()
    )
    queries = spark.createDataFrame(
        [(i, r.chunk) for i, r in enumerate(snippets)]
        + [(9, "completely unrelated zz9 query words qq7")],
        QUERY_SCHEMA,
    )
    got = passage.passage_topk(
        spark, queries, idx, k=5, n_probe=4, k_chunks=400
    ).collect()
    want = _numpy_maxp(spark, docs, queries, k=5)

    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows = sorted(rows, key=lambda r: r.rnk)
        assert [r.doc_id for r in rows] == [d for d, _s, _p in want[q]]
        for r, (_d, s, pid) in zip(rows, want[q]):
            assert abs(r.score - s) < 1e-4
            # the winning snippet is the real best chunk's text
            assert r.chunk_idx == pid % (1 << 20)
    # a verbatim-passage query ranks its source doc first
    for i, r in enumerate(snippets):
        assert by_q[i][0].doc_id == r.doc_id

    # pid round-trip is exact across the long range
    big = spark.range(1).select(
        passage.pid_to_doc(F.lit((5_000_000_000 << 20) + 7)).alias("d")
    )
    assert big.collect()[0].d == 5_000_000_000


def test_update_folds_and_delete_retires_docs(spark, sf_dir, tmp_path):
    old = _docs(spark, sf_dir, 0, 50)
    new = _docs(spark, sf_dir, 50, 70)
    idx = str(tmp_path / "pidx")
    passage.build_passage_index(old, idx, n_centroids=4, seed=7)
    passage.update_passage_index(new, idx)

    probe_doc = new.orderBy("doc_id").limit(1).collect()[0]
    queries = spark.createDataFrame([(0, probe_doc.text[:200])], QUERY_SCHEMA)
    hits = passage.passage_topk(spark, queries, idx, k=3, n_probe=4).collect()
    # the update is live: the probe's source doc ranks (the fixture
    # holds near-twins across the 50-boundary, so membership — not
    # rank-1 — is the stable assertion)
    assert probe_doc.doc_id in {r.doc_id for r in hits}

    passage.delete_docs_from_passage_index(spark, idx, [probe_doc.doc_id])
    after = passage.passage_topk(spark, queries, idx, k=3, n_probe=4).collect()
    assert all(r.doc_id != probe_doc.doc_id for r in after)

    # compaction purges the deleted doc's rows physically; answers hold
    passage.compact_passage_table(spark, idx)
    psg = spark.read.parquet(f"{idx}/passages")
    assert psg.where(F.col("doc_id") == probe_doc.doc_id).count() == 0
    again = passage.passage_topk(spark, queries, idx, k=3, n_probe=4).collect()
    assert sorted((r.doc_id, r.rnk) for r in again) == sorted(
        (r.doc_id, r.rnk) for r in after
    )


def test_pid_packing_guard_is_loud(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1 << 60, "some text words here")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="pid packing"):
        passage.build_passage_index(docs, str(tmp_path / "bad"), n_centroids=2)
    with pytest.raises(FileNotFoundError, match="build_passage_index"):
        passage.passage_topk(
            spark,
            spark.createDataFrame([(0, "q")], QUERY_SCHEMA),
            str(tmp_path / "nope"),
        )
