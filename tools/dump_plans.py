"""Regenerate PLANS.md — formatted physical plans of representative
queries, for plan-level review without running Spark.

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.plans.explain import plan_string
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.session import get_spark

SHOW = [
    ("enrich_join", "CDC normalize + broadcast dim join + scoring (the fact side never shuffles)"),
    ("hourly_rollup", "hourly MV: one shuffle, map-side partial aggregation"),
    ("pricing_summary", "scan-heavy agg: pushed filter + pruned ReadSchema"),
    (
        "star_join_revenue",
        "6-way star join: forced broadcasts only for bounded dims "
        "(supplier/nation/region); orders and customer carry no hint — "
        "AQE broadcasts them at this SF, shuffle-joins at 100 TB",
    ),
    ("dedup_minhash_lsh", "MinHash LSH: candidate pairs from an equi-join on band keys (no cartesian)"),
    (
        "dedup_ngram_jaccard",
        "n-gram Jaccard: df-capped stop-shingle removal via count-over-window "
        "on the join key, then shingle self-join + plain size joins",
    ),
    ("ann_ivf_topk", "IVF ANN: bucket equi-join + per-query rank"),
    (
        "trending_recent",
        "minute trending: max-bucket anchor reads the rollup's own exchange "
        "(ReusedExchange) instead of re-parsing the feed",
    ),
    (
        "quality_signals",
        "Gopher-style quality metrics: explode → two-level additive agg, "
        "doc-keyed join back to the array-expr projection",
    ),
]


def _attribution(spark, sf):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import cdc
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import pipeline as sp
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    ev = cdc.unwrap_engagement(cdc_feed.engagement_cdc_json(load_table(spark, sf, "events")))
    up = sp.content_update_stream(cdc_feed.content_cdc_json(load_table(spark, sf, "part")))
    return sp.attribute_events_to_updates(ev, up, "24 hours")


def _passages(spark, sf):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import corpus
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    return corpus.repeated_passages(load_table(spark, sf, "documents"))


def _ivf_index_query(spark, sf):
    import tempfile

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        ivf_index,
        similarity,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    emb = load_table(spark, sf, "embeddings")
    idx = tempfile.mkdtemp(prefix="graft_plans_ivf_")
    ivf_index.build_ivf_index(emb, idx, n_centroids=8)
    return ivf_index.ivf_index_topk(spark, similarity.default_queries(emb), idx)


def _shuffle_shard(spark, sf):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import corpus
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    return corpus.shuffle_shard_by_tokens(load_table(spark, sf, "documents"))


def _text_index(spark, sf):
    import tempfile

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import retrieval
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    idx = tempfile.mkdtemp(prefix="graft_plans_tix_")
    retrieval.build_text_index(load_table(spark, sf, "documents"), idx, buckets=16)
    return idx


def _bm25_index_query(spark, sf):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import retrieval

    return retrieval.bm25_topk_from_index(
        spark, _text_index(spark, sf), ["spark", "vector", "window"], k=10
    )


def _phrase_query(spark, sf):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import retrieval

    return retrieval.phrase_match_from_index(
        spark, _text_index(spark, sf), ["spark", "vector"], k=10
    )


def _pq_query(spark, sf):
    import tempfile

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        ivf_index,
        similarity,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    emb = load_table(spark, sf, "embeddings")
    idx = tempfile.mkdtemp(prefix="graft_plans_pq_")
    ivf_index.build_ivf_index(emb, idx, n_centroids=8, pq_m=8, pq_ks=16)
    return ivf_index.ivf_index_topk_pq(spark, similarity.default_queries(emb), idx)


def _classifier_score(spark, sf):
    import tempfile

    import pyspark.sql.functions as F

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        classifier,
        quality,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    docs = load_table(spark, sf, "documents")
    labels = quality.quality_signals_ppm(docs).select(
        "doc_id", F.col("quality_ok").cast("double").alias("label")
    )
    md = tempfile.mkdtemp(prefix="graft_plans_qc_")
    classifier.train_quality_classifier(docs, labels, md, n_buckets=256)
    return classifier.score_quality_from_model(spark, docs, md)


def _dsir_select(spark, sf):
    import pyspark.sql.functions as F

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import dsir
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    docs = load_table(spark, sf, "documents")
    target = docs.where(F.col("lang") == "en").select("doc_id", "text")
    return dsir.dsir_select(docs, target, k=50, n_buckets=512, temperature=0.5)


def _embed_docs(spark, sf):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import embedder
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    return embedder.embed_documents(load_table(spark, sf, "documents"), dim=64)


def _phash_pairs(spark, sf):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        asset_embed,
        multimodal,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    return asset_embed.phash_near_pairs(
        multimodal.assets_from_documents(load_table(spark, sf, "documents"))
    )


def _media_gate(spark, sf):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        asset_embed,
        multimodal,
        phash_index,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    assets = multimodal.assets_from_documents(load_table(spark, sf, "documents"))
    feats = asset_embed.asset_features(assets).persist()
    feats.count()  # materialize: the sink persists the one decode per epoch
    return phash_index.within_batch_drops(
        feats.select("asset_id", "modality", "phash")
    )


def _refit_topk(spark, sf):
    import tempfile

    import pyspark.sql.functions as F

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        ivf_index,
        similarity,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    idx = tempfile.mkdtemp(prefix="graft_plans_refit_")
    ivf_index.build_ivf_index(emb.where(F.col("vec_id") < 400), idx, n_centroids=8)
    ivf_index.update_ivf_index(emb.where(F.col("vec_id") >= 400), idx)
    ivf_index.refit_ivf_index(spark, idx)
    return ivf_index.ivf_index_topk(spark, similarity.default_queries(emb), idx)


def _passage_topk(spark, sf):
    import tempfile

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        passage,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    docs = load_table(spark, sf, "documents").limit(120).select("doc_id", "text")
    idx = tempfile.mkdtemp(prefix="graft_plans_passage_")
    passage.build_passage_index(docs, idx, n_centroids=4, seed=7)
    q = spark.createDataFrame(
        [(0, "fast key order sort table scan merge")], "query_id long, text string"
    )
    return passage.passage_topk(spark, q, idx, k=5, n_probe=2)


def _mmr(spark, sf):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        embedder,
        retrieval,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    docs = load_table(spark, sf, "documents")
    vecs = embedder.embed_documents(docs, dim=64)
    cand = spark.createDataFrame(
        [(d, 1.0 - d / 100.0) for d in range(30)], "doc_id long, rrf double"
    )
    return retrieval.mmr_rerank(cand, vecs, k=10, lam=0.5)


# operators outside the driver gate, built directly
def _lm_score_kn(spark, sf):
    import tempfile

    import pyspark.sql.functions as F

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        lm_filter,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import (
        load_table,
    )

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    d = tempfile.mkdtemp(prefix="sg_plans_lm_")
    lm_filter.train_ngram_lm(
        docs.where(F.col("doc_id") % 3 == 0), d, smoothing="kn"
    )
    return lm_filter.perplexity_score(spark, docs, d)


def _pruned_band_lookup(spark, sf):
    import tempfile

    import pyspark.sql.functions as F

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import lsh_index
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    docs = load_table(spark, sf, "documents")
    idx = tempfile.mkdtemp(prefix="graft_plans_mh_")
    lsh_index.build_minhash_index(docs.where(F.col("doc_id") % 5 != 0), idx)
    batch = docs.where(F.col("doc_id") % 5 == 0).limit(5)
    nb = lsh_index.minhash_band_entries(batch)
    pairs = [
        (r["band_id"], r["kb"])
        for r in nb.select(
            "band_id", lsh_index._kbucket_col(F.col("band_key")).alias("kb")
        )
        .distinct()
        .collect()
    ]
    idx_bands = lsh_index._live_bands(spark, idx, band_pairs=pairs)
    return (
        idx_bands.alias("a")
        .join(
            nb.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


EXTRA = [
    (
        "dedup_against_index_pruned_lookup",
        "key-bucketed MinHash precedent lookup (candidate generation for a "
        "CDC-sized fold): the batch's distinct (band_id, kbucket) pairs — "
        "bounded by the bucket grid, never by batch rows — land as a static "
        "PartitionFilter on the corpus bands scan, so fold I/O is ∝ the "
        "batch's bucket coverage instead of ∝ corpus; the batch side "
        "broadcasts, the index side never shuffles (inside "
        "dedup_against_index the exact-Jaccard shingle read is likewise "
        "dbucket-pruned and the final drop set localCheckpoints)",
        _pruned_band_lookup,
    ),
    (
        "shuffle_shard_by_tokens",
        "deterministic corpus shuffle + token-balanced shards: the global "
        "prefix sum runs as a two-level decomposition — window partitioned "
        "by the hash-prefix bucket (hashpartitioning(_b)) + broadcast "
        "per-bucket base offsets; no SinglePartition anywhere",
        _shuffle_shard,
    ),
    (
        "ivf_index_topk",
        "stored-index ANN: no KMeans in the plan; probed cells pushed as a "
        "static PartitionFilter on the inverted-list scan, probe set broadcast",
        _ivf_index_query,
    ),
    (
        "interval_update_attribution",
        "stream-stream interval join (batch twin): content_id equality key "
        "+ time-range as join condition — hash/sort-merge join, no cartesian",
        _attribution,
    ),
    (
        "repeated_passages",
        "cross-document repeated-passage detection: CDC chunk digests, one "
        "combinable digest-keyed support shuffle, digest equi-join back",
        _passages,
    ),
    (
        "bm25_topk_from_index",
        "index-backed BM25: no tokenization in the plan; postings scan "
        "statically pruned to the query terms' tbucket partitions, df "
        "recounted from the pruned read, stats from the manifest",
        _bm25_index_query,
    ),
    (
        "phrase_match_from_index",
        "positional phrase search: anchor algebra over the pruned "
        "(doc_id, term, positions) read — |phrase|-1 strictly-shrinking "
        "doc_id equi-joins, positions bytes never read by the BM25 path",
        _phrase_query,
    ),
    (
        "ivf_index_topk_pq",
        "IVF-PQ ADC: probed cells read (vec_id, codes, nrm) only — the "
        "float embedding column never leaves disk; per-query LUT built "
        "broadcast-side, pq_m array lookups per candidate",
        _pq_query,
    ),
    (
        "score_quality_from_model",
        "hashed linear quality classifier scoring: no pyspark.ml in the "
        "plan — broadcast weight join + one combinable per-doc sum + "
        "sigmoid expression",
        _classifier_score,
    ),
    (
        "dsir_select",
        "DSIR importance resampling: two n_buckets-bounded histogram aggs "
        "feed a broadcast log-ratio join on the map-side feature explode; "
        "one doc-keyed combinable weight sum; Gumbel top-k cut is "
        "TakeOrderedAndProject — the raw corpus shuffles only (doc_id, logw)",
        _dsir_select,
    ),
    (
        "embed_documents",
        "feature-hashing text embedder: map-side tokenize/explode, two "
        "doc-keyed combinable aggs over (doc_id, bucket) pairs, dense fold "
        "+ norm as pure array expressions — no Python anywhere",
        _embed_docs,
    ),
    (
        "mmr_rerank",
        "MMR diversification: the corpus vector table pruned by one "
        "broadcast equi-join on the candidate ids; exactly ONE "
        "FlatMapGroupsInPandas over the bounded per-query lists runs the "
        "greedy pick",
        _mmr,
    ),
    (
        "phash_near_pairs",
        "multimodal perceptual near-dup: decode/tile/fingerprint runs in "
        "ONE Arrow-batched MapInPandas pass; a repartition right after the "
        "fingerprints gives both self-join branches the SAME exchange, "
        "which AQE reuses (ReusedExchange-asserted) — the expensive decode "
        "executes once; the candidate join is a (modality, band) equi-join "
        "over the 8-byte fingerprint table, bit_count-verified, no "
        "cartesian, no corpus-sized broadcast",
        _phash_pairs,
    ),
    (
        "media_ingest_gate",
        "the unified media sink's dedup gate over the epoch's ONE decode: "
        "asset_features is persisted, so both gate branches read "
        "InMemoryTableScan — every MapInPandas in the text below is the "
        "cached relation's nested dump, never a live re-decode "
        "(plan-asserted in tests/test_media_ingest.py)",
        _media_gate,
    ),
    (
        "ivf_index_topk_post_refit",
        "stored-index ANN through a REFIT version: the query resolves the "
        "manifest's data_version pointer to the v1/ tree — same pruned "
        "shape as ivf_index_topk (static PartitionFilter on the probed "
        "cells, probe set broadcast, no KMeans in the plan); the swap is "
        "one manifest os.replace, so plans never mix versions",
        _refit_topk,
    ),
    (
        "perplexity_score_kn",
        "n-gram LM perplexity scoring (Kneser-Ney manifest): document "
        "n-grams left-join the three vocabulary-bounded count tables "
        "(bigram / context / continuation — plain equi-joins, Catalyst "
        "broadcasts the small reference), one per-doc combinable agg; "
        "the KN interpolation is pure JVM expressions, no Python, no "
        "training work in the scoring plan",
        _lm_score_kn,
    ),
    (
        "passage_topk",
        "passage-level MaxP retrieval off the stored chunk-IVF artifact: "
        "the query embeds map-side (no Python), the inverted-list read is "
        "statically pruned to the probed centroid cells (PartitionFilters), "
        "doc ids come from the pid bit-pack (shiftrightunsigned — no join), "
        "and the passage table is touched only by a BroadcastHashJoin of "
        "the bounded winner list for snippets; no cartesian, no corpus "
        "shuffle",
        _passage_topk,
    ),
]



def main() -> None:
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    sf = "/root/testdata/sf0.01"
    out = [
        "# PLANS — formatted physical plans of representative queries",
        "",
        "Auto-generated by `tools/dump_plans.py` at sf0.01 (plans are",
        "data-size independent except AQE runtime re-optimization).",
        "",
    ]
    for name, why in SHOW:
        plan = plan_string(queries[name](spark, sf))
        out += [f"## {name}", "", why + ".", "", "```", plan.rstrip(), "```", ""]
    for name, why, build in EXTRA:
        plan = plan_string(build(spark, sf))
        out += [f"## {name}", "", why + ".", "", "```", plan.rstrip(), "```", ""]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
