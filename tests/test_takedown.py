"""Unified takedown (round-9 verdict #7): one ``delete_documents``
call against a document-ingest deployment removes a doc from the
corpus, the BM25 text index, the ANN embedding index, the passage MaxP
index AND the MinHash dedup precedent; compaction then purges the
tombstoned bytes physically."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    ivf_index,
    lsh_index,
    passage as psg,
    retrieval,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import (
    pipeline as sp,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

from tests.test_lm_filter import _tok



pytestmark = pytest.mark.slow  # multi-epoch lifecycle walk; fast tier keeps the
# single-epoch/oracle coverage of this family (round 12, VERDICT r11 #3)

@pytest.fixture(scope="module")
def deployment(spark, sf_dir, tmp_path_factory):
    """One document-ingest run (40 docs, passage index on) shared by
    the takedown assertions."""
    base = tmp_path_factory.mktemp("takedown")
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 40)
        .select(
            "doc_id", "text", F.lit("en").alias("lang"), F.lit("s").alias("source")
        )
    )
    feed = str(base / "feed")
    os.makedirs(feed)
    docs.coalesce(1).write.mode("overwrite").parquet(f"{feed}/f0.parquet")
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string, source string")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed + "/*.parquet")
    )
    dirs = {
        n: str(base / n) for n in ("corpus", "mh", "tix", "ivf", "psg", "ck")
    }
    q = sp.start_document_ingest_sink(
        stream, dirs["corpus"], dirs["mh"], dirs["tix"], dirs["ivf"], dirs["ck"],
        compact_every=None, n_centroids=4, seed=7,
        passage_index_dir=dirs["psg"],
    )
    q.processAllAvailable()
    q.stop()
    dirs["meta"] = dirs["corpus"] + "_meta"
    # the docs that actually made it through the dedup gauntlet
    kept = {r.doc_id for r in spark.read.parquet(dirs["corpus"]).collect()}
    return dirs, kept


def _bm25_hits(spark, tix, text):
    terms = [t for t in _tok(text) if len(t) > 2][:3]
    return {
        r.doc_id
        for r in retrieval.bm25_topk_from_index(spark, tix, terms, k=50).collect()
    }


def test_delete_documents_fans_out(spark, sf_dir, deployment):
    dirs, kept = deployment
    victims = sorted(kept)[:2]
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(dirs["corpus"])
        .where(F.col("doc_id").isin(victims))
        .collect()
    }

    # --- presence before the takedown ---
    for v in victims:
        assert v in _bm25_hits(spark, dirs["tix"], texts[v])
    qv = spark.createDataFrame([(0, texts[victims[0]])], "query_id long, text string")
    assert victims[0] in {
        r.doc_id for r in psg.passage_topk(spark, qv, dirs["psg"], k=10).collect()
    }
    # dedup precedent: a re-submitted copy of the victim's text drops
    resub = spark.createDataFrame(
        [(900_001, texts[victims[0]], "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    assert lsh_index.dedup_against_index(spark, resub, dirs["mh"]).count() == 0
    # ANN: the victim is live in the stored embedding index
    stored_vec = (
        ivf_index._live_assignments(spark, dirs["ivf"])
        .where(F.col("vec_id") == victims[0])
        .select("vec_id")
    )
    assert stored_vec.count() == 1

    # --- the one-call takedown ---
    sp.delete_documents(spark, dirs["meta"], victims)

    got = {r.doc_id for r in spark.read.parquet(dirs["corpus"]).collect()}
    assert got == kept - set(victims)
    for v in victims:
        assert v not in _bm25_hits(spark, dirs["tix"], texts[v])
    assert victims[0] not in {
        r.doc_id for r in psg.passage_topk(spark, qv, dirs["psg"], k=10).collect()
    }
    # precedent gone: the re-submitted copy is now KEPT
    assert lsh_index.dedup_against_index(spark, resub, dirs["mh"]).count() == 1
    assert (
        ivf_index._live_assignments(spark, dirs["ivf"])
        .where(F.col("vec_id").isin(victims))
        .count()
        == 0
    )

    # idempotent: a crashed-and-rerun request is a no-op
    sp.delete_documents(spark, dirs["meta"], victims)
    assert {r.doc_id for r in spark.read.parquet(dirs["corpus"]).collect()} == got

    # --- compaction purges physically ---
    lsh_index.compact_minhash_index(spark, dirs["mh"])
    retrieval.compact_text_index(spark, dirs["tix"])
    ivf_index.compact_ivf_index(spark, dirs["ivf"])
    ivf_index.compact_ivf_index(spark, f"{dirs['psg']}/vectors")
    psg.compact_passage_table(spark, dirs["psg"])
    assert (
        spark.read.parquet(f"{dirs['tix']}/postings")
        .where(F.col("doc_id").isin(victims))
        .count()
        == 0
    )
    assert (
        spark.read.parquet(f"{lsh_index._bands_root(dirs['mh'])}")
        .where(F.col("doc_id").isin(victims))
        .count()
        == 0
    )
    # answers unchanged after the physical purge
    for v in victims:
        assert v not in _bm25_hits(spark, dirs["tix"], texts[v])
    assert victims[0] not in {
        r.doc_id for r in psg.passage_topk(spark, qv, dirs["psg"], k=10).collect()
    }


def test_delete_documents_requires_layout(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="_SINK_LAYOUT"):
        sp.delete_documents(spark, str(tmp_path / "nometa"), [1, 2])


def test_delete_documents_accepts_dataframe_and_empty(spark, sf_dir, deployment):
    dirs, kept = deployment
    before = {r.doc_id for r in spark.read.parquet(dirs["corpus"]).collect()}
    sp.delete_documents(spark, dirs["meta"], [])
    ids = spark.createDataFrame(
        [(v,) for v in sorted(before)[:1]], "doc_id long"
    )
    sp.delete_documents(spark, dirs["meta"], ids)
    after = {r.doc_id for r in spark.read.parquet(dirs["corpus"]).collect()}
    assert after == before - set(sorted(before)[:1])


def test_delete_assets_fans_out(spark, sf_dir, tmp_path):
    """The media twin: one delete_assets call removes an asset from
    the asset corpus, the phash dedup precedent and the asset IVF
    index."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        multimodal,
        phash_index as pidx,
    )

    assets = multimodal.assets_from_documents(
        load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    )
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    assets.coalesce(1).write.mode("overwrite").parquet(f"{feed}/f0.parquet")
    stream = (
        spark.readStream.schema(assets.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed + "/*.parquet")
    )
    corpus, ph, ivf = (str(tmp_path / d) for d in ("corpus", "ph", "ivf"))
    q = sp.start_media_ingest_sink(
        stream, corpus, ph, ivf, str(tmp_path / "ck"),
        compact_every=None, n_centroids=4, seed=7,
    )
    q.processAllAvailable()
    q.stop()

    kept = {r.asset_id for r in spark.read.parquet(corpus).collect()}
    victims = sorted(kept)[:2]
    assert (
        spark.read.parquet(f"{ph}/{pidx.FP_TABLE}")
        .where(F.col("asset_id").isin(victims))
        .count()
        > 0
    )

    sp.delete_assets(spark, corpus + "_meta", victims)

    assert {r.asset_id for r in spark.read.parquet(corpus).collect()} == (
        kept - set(victims)
    )
    # precedent gone: a byte-identical re-submission is no longer a dup
    resub = assets.where(F.col("asset_id") == victims[0]).select(
        (F.col("asset_id") + 800_000).alias("asset_id"),
        "modality", "payload", "mime", "width", "height", "sample_rate",
        "n_frames",
    )
    fp = pidx.perceptual_hashes(resub).select("asset_id", "modality", "phash")
    drops = pidx.dedup_drops_for_fingerprints(spark, fp, ph)
    assert drops.count() == 0
    # and gone from the asset ANN index
    assert (
        ivf_index._live_assignments(spark, ivf)
        .where(F.col("vec_id").isin(victims))
        .count()
        == 0
    )
    # idempotent re-run
    sp.delete_assets(spark, corpus + "_meta", victims)
    assert {r.asset_id for r in spark.read.parquet(corpus).collect()} == (
        kept - set(victims)
    )


def _tree_snapshot(root):
    out = []
    for r, _d, files in os.walk(root):
        for f in files:
            p = os.path.join(r, f)
            out.append((p, os.path.getsize(p)))
    return sorted(out)


def test_takedown_refuses_live_sink(spark, sf_dir, tmp_path):
    """The round-11 enforcement: delete_documents against a deployment
    whose ingest stream is STILL RUNNING refuses loudly BEFORE touching
    any group dir; passing the sink's own checkpoint is the
    act-on-its-behalf escape hatch, a foreign checkpoint refuses
    outright, and a stopped stream needs no checkpoint at all."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 30)
        .select(
            "doc_id", "text", F.lit("en").alias("lang"), F.lit("s").alias("source")
        )
    )
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    docs.coalesce(1).write.mode("overwrite").parquet(f"{feed}/f0.parquet")
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string, source string")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed + "/*.parquet")
    )
    corpus, mh, tix, ivf, ck = (
        str(tmp_path / d) for d in ("corpus", "mh", "tix", "ivf", "ck")
    )
    q = sp.start_document_ingest_sink(
        stream, corpus, mh, tix, ivf, ck,
        compact_every=None, n_centroids=4, seed=7,
    )
    q.processAllAvailable()
    meta = corpus + "_meta"
    kept = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    victims = sorted(kept)[:2]
    try:
        before = _tree_snapshot(corpus)
        with pytest.raises(RuntimeError, match="STILL RUNNING"):
            sp.delete_documents(spark, meta, victims)
        # refused before touching any group dir
        assert _tree_snapshot(corpus) == before
        assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == kept
        # a foreign checkpoint refuses outright
        with pytest.raises(RuntimeError, match="refusing a takedown"):
            sp.delete_documents(
                spark, meta, victims, checkpoint=str(tmp_path / "other_ck")
            )
        # the sink's own checkpoint is the escape hatch
        sp.delete_documents(spark, meta, victims, checkpoint=ck)
        assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == (
            kept - set(victims)
        )
    finally:
        q.stop()
    # stream stopped: no checkpoint needed
    more = sorted(kept - set(victims))[:1]
    sp.delete_documents(spark, meta, more)
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == (
        kept - set(victims) - set(more)
    )
