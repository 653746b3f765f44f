"""Unified document ingest sink (round-9 verdict task 3): ONE sink
that tokenizes + embeds each micro-batch exactly once and feeds the
decontamination gates, the fuzzy-dedup verdict, the corpus merge, the
MinHash fold, the inverted-text-index fold, the IVF fold and the
corpus card, with one epoch marker.  Streamed composite state ≡ the
hand-wired per-artifact batch pipeline on the same batches; the
one-tokenize contract is plan-asserted (the ``test_media_ingest``
cached-relation method); CDC mode keeps every serving artifact in
lockstep with the source table."""

from __future__ import annotations

import pytest

import os

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.text import (
    TOKENS_COL,
    tokens,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    dedup as dd,
    embedder,
    ivf_index,
    lsh_index,
    retrieval,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.plans.explain import (
    plan_string,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import (
    pipeline as sp,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

from tests.test_lsh_cdc import _lone_texts


pytestmark = pytest.mark.slow  # multi-epoch lifecycle walk; fast tier keeps the
# single-epoch/oracle coverage of this family (round 12, VERDICT r11 #3)

DOC_SCHEMA = "doc_id long, text string, lang string, source string"
CDC_SCHEMA = DOC_SCHEMA + ", op string, seq long"


def _tokenized_embedded(docs):
    """The sink's shared-frame construction, standalone."""
    docs = docs.withColumn(TOKENS_COL, tokens(F.col("text")))
    emb = embedder.embed_documents(docs).select(
        F.col("vec_id").alias("doc_id"), "embedding", "n_tokens"
    )
    return docs.join(emb, "doc_id", "left")


def _no_tokenize_above_cache(plan: str) -> bool:
    """True iff every tokenizer expression in the plan text sits
    INSIDE the cached relation's nested dump (strictly deeper than the
    InMemoryRelation that owns it) — i.e. the consumer derives from
    the materialized token array and cannot re-run the regexp."""
    last_rel = None
    for ln in plan.splitlines():
        if "InMemoryRelation" in ln:
            last_rel = ln.index("InMemoryRelation")
        if "regexp_replace" in ln:
            if last_rel is None or ln.index("regexp_replace") <= last_rel:
                return False
    return True


def test_one_tokenize_consumers_read_the_cache(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .limit(50)
        .select("doc_id", "text", "lang", "source")
    )
    frame = _tokenized_embedded(docs).persist()
    try:
        frame.count()  # materialize
        for consumer in (
            dd._doc_shingles(frame),          # MinHash/dedup/decontam path
            retrieval._postings(frame, 8),    # text-index fold path
            embedder.embed_documents(frame),  # (re-)embed path
        ):
            plan = plan_string(consumer, mode="simple")
            assert "InMemoryTableScan" in plan
            assert _no_tokenize_above_cache(plan), plan
    finally:
        frame.unpersist()


def _mk_batches(spark, sf_dir):
    """Three append batches with planted cross-batch near-dups."""
    texts = _lone_texts(spark, sf_dir, 40)
    b1 = [(i, texts[i], "en", "s0") for i in range(12)]
    # 900_0xx are copies of batch-1 docs (must drop), 200-207 fresh
    b2 = [(900_000 + i, texts[i], "en", "s1") for i in range(4)] + [
        (200 + i, texts[12 + i], "en", "s1") for i in range(8)
    ]
    b3 = [(900_100 + i, texts[12 + i], "en", "s2") for i in range(3)] + [
        (300 + i, texts[20 + i], "en", "s2") for i in range(6)
    ]
    return [spark.createDataFrame(b, DOC_SCHEMA) for b in (b1, b2, b3)]


def _stream_feed(spark, tmp_path, batches, schema):
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("overwrite").parquet(f"{feed}/f{i}.parquet")
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed + "/*.parquet")
    )


def _corpus_ids(spark, corpus_dir):
    return {r.doc_id for r in spark.read.parquet(corpus_dir).select("doc_id").collect()}


def test_unified_sink_matches_hand_wired_batch_pipeline(spark, sf_dir, tmp_path):
    batches = _mk_batches(spark, sf_dir)
    stream = _stream_feed(spark, tmp_path, batches, DOC_SCHEMA)
    corpus = str(tmp_path / "corpus")
    mh = str(tmp_path / "mh")
    tix = str(tmp_path / "tix")
    ivf = str(tmp_path / "ivf")
    q = sp.start_document_ingest_sink(
        stream, corpus, mh, tix, ivf, str(tmp_path / "ck"),
        compact_every=None, n_centroids=4, seed=7,
        report_dir=str(tmp_path / "report"),
    )
    q.processAllAvailable()
    q.stop()

    # hand-wired batch twin: same per-batch artifact calls
    mh2 = str(tmp_path / "mh2")
    tix2 = str(tmp_path / "tix2")
    ivf2 = str(tmp_path / "ivf2")
    all_kept = []
    for i, b in enumerate(batches):
        if i == 0:
            kept_ids = dd.fuzzy_dedup_keep(b)
            lsh_index.build_minhash_index(b, mh2)
        else:
            kept_ids = lsh_index.dedup_against_index(spark, b, mh2)
            lsh_index.update_minhash_index(b, mh2, epoch=i)
        kept = b.join(kept_ids.select("doc_id"), "doc_id", "left_semi")
        all_kept.append(kept)
        vecs = (
            embedder.embed_documents(kept)
            .where(F.col("n_tokens") > 0)
            .select("vec_id", "embedding")
        )
        if i == 0:
            retrieval.build_text_index(kept, tix2)
            ivf_index.build_ivf_index(vecs, ivf2, n_centroids=4, seed=7)
        else:
            retrieval.update_text_index(kept, tix2, epoch=i)
            ivf_index.update_ivf_index(vecs, ivf2, epoch=i)

    want_ids = set()
    for k in all_kept:
        want_ids |= {r.doc_id for r in k.select("doc_id").collect()}
    assert _corpus_ids(spark, corpus) == want_ids
    # planted copies really dropped, fresh docs really kept
    assert not any(i >= 900_000 for i in want_ids)
    assert {200, 300} <= want_ids

    # text index: identical BM25 answers (df/idf/avgdl and postings)
    qterms = [t for t in batches[0].first().text.lower().split()[:3]]
    got = sorted(
        map(tuple, retrieval.bm25_topk_from_index(spark, tix, qterms, k=10).collect())
    )
    want = sorted(
        map(tuple, retrieval.bm25_topk_from_index(spark, tix2, qterms, k=10).collect())
    )
    assert got == want and got

    # IVF index: identical top-k (same bootstrap fit, same folds)
    queries = spark.createDataFrame(
        [(0, batches[2].first().text)], "query_id long, text string"
    )
    qv = embedder.embed_documents(queries, id_col="query_id", out_id_col="query_id").select(
        "query_id", F.col("embedding").alias("query_vec")
    )
    g = sorted(
        map(tuple, ivf_index.ivf_index_topk(spark, qv, ivf, k=5, n_probe=4).collect())
    )
    w = sorted(
        map(tuple, ivf_index.ivf_index_topk(spark, qv, ivf2, k=5, n_probe=4).collect())
    )
    assert g == w and g

    # dedup precedent identical: a probe batch gets the same verdicts
    texts = _lone_texts(spark, sf_dir, 40)
    probe = spark.createDataFrame(
        [(950_000, texts[0], "en", "p"), (950_001, texts[30], "en", "p")], DOC_SCHEMA
    )
    kp = {r.doc_id for r in lsh_index.dedup_against_index(spark, probe, mh).collect()}
    kp2 = {r.doc_id for r in lsh_index.dedup_against_index(spark, probe, mh2).collect()}
    assert kp == kp2 == {950_001}

    # the corpus card followed the survivors
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        corpus as corpus_mod,
    )

    card = corpus_mod.read_corpus_card(spark, str(tmp_path / "report"))
    assert card.agg(F.sum("n_docs")).first()[0] == len(want_ids)


def test_unified_sink_passage_fold_matches_batch_builds(spark, sf_dir, tmp_path):
    """With ``passage_index_dir=`` the one stream also maintains the
    chunk-level MaxP index: streamed answers ≡ the hand-wired
    per-batch passage builds over the same survivors."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        passage,
    )

    batches = _mk_batches(spark, sf_dir)
    stream = _stream_feed(spark, tmp_path, batches, DOC_SCHEMA)
    corpus = str(tmp_path / "corpus")
    mh, tix, ivf, psg = (str(tmp_path / d) for d in ("mh", "tix", "ivf", "psg"))
    q = sp.start_document_ingest_sink(
        stream, corpus, mh, tix, ivf, str(tmp_path / "ck"),
        compact_every=None, n_centroids=4, seed=7, passage_index_dir=psg,
    )
    q.processAllAvailable()
    q.stop()

    mh2 = str(tmp_path / "mh2")
    psg2 = str(tmp_path / "psg2")
    for i, b in enumerate(batches):
        if i == 0:
            kept_ids = dd.fuzzy_dedup_keep(b)
            lsh_index.build_minhash_index(b, mh2)
        else:
            kept_ids = lsh_index.dedup_against_index(spark, b, mh2)
            lsh_index.update_minhash_index(b, mh2, epoch=i)
        kept = b.join(kept_ids.select("doc_id"), "doc_id", "left_semi").select(
            "doc_id", "text"
        )
        if i == 0:
            passage.build_passage_index(kept, psg2, n_centroids=4, seed=7)
        else:
            passage.update_passage_index(kept, psg2, epoch=i)

    queries = spark.createDataFrame(
        [(0, batches[0].first().text[:150]), (1, batches[2].first().text[:150])],
        "query_id long, text string",
    )
    got = sorted(
        map(tuple, passage.passage_topk(spark, queries, psg, k=5, n_probe=4).collect())
    )
    want = sorted(
        map(tuple, passage.passage_topk(spark, queries, psg2, k=5, n_probe=4).collect())
    )
    assert got == want and got


def test_unified_sink_cdc_follows_source(spark, sf_dir, tmp_path):
    texts = _lone_texts(spark, sf_dir, 40)
    # per-doc SENTINEL terms make the BM25 assertions deterministic:
    # the fixture docs share a jargon vocabulary, so "old text terms
    # stop ranking the doc" is only decidable on terms unique to the
    # superseded version
    old = {i: f"{texts[i]} oldsent{i}a oldsent{i}b" for i in range(10)}
    new1 = "fresh revision freshmarkx " + texts[20]
    new7 = texts[30] + " rebornsent7"
    b0 = [(i, old[i], "en", "s", "c", 0) for i in range(10)]
    b1 = (
        [(1, new1, "en", "s", "u", 1)]
        + [(7, old[7], "en", "s", "d", 1)]
        + [(100 + i, texts[25 + i], "en", "s", "c", 1) for i in range(4)]
    )
    b2 = [(7, new7, "en", "s", "c", 0)]  # re-create with new content
    batches = [spark.createDataFrame(b, CDC_SCHEMA) for b in (b0, b1, b2)]
    stream = _stream_feed(spark, tmp_path, batches, CDC_SCHEMA)
    corpus = str(tmp_path / "corpus")
    mh, tix, ivf = (str(tmp_path / d) for d in ("mh", "tix", "ivf"))
    q = sp.start_document_ingest_sink(
        stream, corpus, mh, tix, ivf, str(tmp_path / "ck"),
        compact_every=None, n_centroids=4, seed=7, op_col="op", seq_col="seq",
    )
    q.processAllAvailable()
    q.stop()

    final = {i: old[i] for i in range(10)}
    final[1] = new1
    for i in range(4):
        final[100 + i] = texts[25 + i]
    final[7] = new7
    assert _corpus_ids(spark, corpus) == set(final)

    # text index serves the NET table: sentinel terms of superseded
    # versions find nothing (their postings tombstoned), the live
    # versions' sentinels rank their docs
    def bm25_ids(terms):
        return {
            r.doc_id
            for r in retrieval.bm25_topk_from_index(spark, tix, terms, k=10).collect()
        }

    assert 1 in bm25_ids(["freshmarkx"])
    assert 1 not in bm25_ids(["oldsent1a", "oldsent1b"])
    assert 7 in bm25_ids(["rebornsent7"])
    assert 7 not in bm25_ids(["oldsent7a", "oldsent7b"])
    assert 3 in bm25_ids(["oldsent3a"])  # untouched docs still serve

    # embedding index: live vectors EXACTLY mirror the net table —
    # every final doc with a nonzero vector present, superseded
    # versions gone, and the stored vector for an updated doc IS the
    # embedding of its NEW text
    live = {
        r.vec_id: list(r.embedding)
        for r in ivf_index._live_assignments(spark, ivf)
        .select("vec_id", "embedding")
        .collect()
    }
    assert set(live) == set(final)
    net = spark.createDataFrame(sorted(final.items()), "doc_id long, text string")
    want_vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in embedder.embed_documents(net).collect()
    }
    assert live[1] == want_vecs[1] and live[7] == want_vecs[7]
    # and the index still serves
    qv = embedder.embed_documents(
        spark.createDataFrame([(0, new7)], "query_id long, text string"),
        id_col="query_id", out_id_col="query_id",
    ).select("query_id", F.col("embedding").alias("query_vec"))
    hits = ivf_index.ivf_index_topk(spark, qv, ivf, k=5, n_probe=4).collect()
    assert hits

    # dedup precedent follows the source: a copy of the DELETED old
    # content survives the gate, a copy of live content drops
    probe = spark.createDataFrame(
        [(900_000, old[7], "en", "p"), (900_001, texts[25], "en", "p")], DOC_SCHEMA
    )
    kept = {r.doc_id for r in lsh_index.dedup_against_index(spark, probe, mh).collect()}
    assert kept == {900_000}


def test_cdc_refuses_additive_consumers(spark, tmp_path):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    import pytest

    with pytest.raises(ValueError, match="dsir_model_dir"):
        sp.start_document_ingest_sink(
            stream, str(tmp_path / "c"), "m", "t", "e", str(tmp_path / "ck"),
            op_col="op", dsir_model_dir="d",
        )
    with pytest.raises(ValueError, match="report_dir"):
        sp.start_document_ingest_sink(
            stream, str(tmp_path / "c"), "m", "t", "e", str(tmp_path / "ck"),
            op_col="op", report_dir="r",
        )
