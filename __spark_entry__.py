"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``  — flagship CDC slice on sf0.001 (SURVEY.md §7.1).
``queries()``     — one named query per implemented operator (SURVEY.md §2).
``oracle_sql()``  — DuckDB-equivalent SQL for every oracle-checkable query.

The engine lives in ``real_time_cdc_analytics_pipeline_with_clickhouse_spark/``.

The driver's correctness gate records the FIRST 50 ``queries()``
entries in insertion order.  The registry is therefore kept ≤ 50 by
consolidating projection-redundant parity queries (see
tests/test_consolidated.py, which keeps the folded-away variants
oracle-checked in pytest), and the extension operators are registered
before the relational-breadth block.  KEEP IT ≤ 50.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_cdc_analytics_pipeline_with_clickhouse_spark import oracle as _oracle
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.scalar import (
    portable_hash64,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions import text as T
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    behavioral,
    cdc,
    corpus,
    dedup,
    enrich,
    multimodal,
    quality,
    relational as R,
    retrieval,
    rollups,
    similarity,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.session import (
    apply_runtime_confs,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


def _us(col: str = "event_ts") -> F.Column:
    return F.unix_micros(F.col(col))


# ---------------------------------------------------------------------------
# shared builders
# ---------------------------------------------------------------------------


# rollup-shaped consumers never read user_id/device/raw_payload — the
# feed serializes only what the query consumes (id must stay: unwrap
# drops id-less records).  raw_payload (the props JSON blob) dominates
# envelope bytes, so this cuts most of the to_json→from_json cost.
_ROLLUP_FIELDS = ("id", "content_id", "event_type", "duration_ms", "event_ts")


def _engagement(
    spark: SparkSession, sf_dir: str, dup: bool = False, fields: tuple[str, ...] | None = None
) -> DataFrame:
    """CDC feed → normalized engagement events (P1-P5)."""
    events = load_table(spark, sf_dir, "events")
    fields = fields or cdc_feed.ENGAGEMENT_FIELDS
    feed = (
        cdc_feed.duplicated_engagement_cdc_json(events, fields)
        if dup
        else cdc_feed.engagement_cdc_json(events, fields)
    )
    return cdc.unwrap_engagement(feed)


def _dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return enrich.compact_dim_latest(cdc.unwrap_content(cdc_feed.content_cdc_json(part)))


def _enriched(
    spark: SparkSession, sf_dir: str, dup: bool = False, fields: tuple[str, ...] | None = None
) -> DataFrame:
    return enrich.enrich_events(_engagement(spark, sf_dir, dup, fields), _dim(spark, sf_dir))


def _docs_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.with_exact_duplicates(load_table(spark, sf_dir, "documents"))


def _embs_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.with_duplicate_vectors(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full CDC slice (parse → compact → enrich → score →
    hourly rollup) on sf0.001."""
    apply_runtime_confs(spark)
    return rollups.hourly_rollup(_enriched(spark, "/root/testdata/sf0.001")).select(
        _us("hour_ts").alias("hour_ts_us"), "content_type", "event_type", "cnt", "total_score"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- CDC / reference parity (SURVEY §2.3-2.7) ---
    q["cdc_unwrap"] = lambda spark, sf: _engagement(spark, sf).select(
        "event_id", "user_id", "content_id", "event_type", "device", "duration_ms",
        _us().alias("event_ts_us"), "raw_payload", "source_ts_ms",
    )
    q["cdc_delete_routing"] = lambda spark, sf: cdc.unwrap_content(
        cdc_feed.content_cdc_json(load_table(spark, sf, "part"))
    ).select("id", "content_type", "length_seconds", "is_delete", "source_ts_ms")
    q["dim_compaction"] = lambda spark, sf: _dim(spark, sf).select(
        "id", "slug", "title", "content_type", "length_seconds"
    )
    q["enrich_join"] = lambda spark, sf: _enriched(spark, sf).select(
        "event_id", "content_id", "user_id", "event_type", "device", "duration_ms",
        _us().alias("event_ts_us"), "content_type", "length_seconds",
        "engagement_seconds", "engagement_pct", "engagement_score",
    )
    q["hourly_rollup"] = lambda spark, sf: rollups.hourly_rollup(
        _enriched(spark, sf, fields=_ROLLUP_FIELDS)
    ).select(
        _us("hour_ts").alias("hour_ts_us"), "content_type", "event_type", "cnt", "total_score"
    )
    q["dedup_latest"] = lambda spark, sf: rollups.dedup_latest_event_version(
        _enriched(spark, sf, dup=True, fields=_ROLLUP_FIELDS)
    ).select("event_id", _us().alias("event_ts_us"), "duration_ms", "engagement_score")
    q["user_leaderboard"] = lambda spark, sf: rollups.user_leaderboard(_enriched(spark, sf))
    # minute_topk folded into pytest (tests/test_consolidated.py) — same
    # agg+rank path as trending_recent, which stays driver-checked
    q["trending_recent"] = lambda spark, sf: rollups.trending_recent(
        _enriched(spark, sf, fields=_ROLLUP_FIELDS)
    )
    q["event_counters"] = lambda spark, sf: rollups.event_counters(_enriched(spark, sf))
    q["latest_event"] = lambda spark, sf: rollups.latest_event(_enriched(spark, sf)).select(
        "user_id", "content_id", "event_id", _us().alias("event_ts_us"), "engagement_score"
    )

    def outbox_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
        payload = rollups.outbox_json(_enriched(spark, sf))
        p = F.col("payload")
        return payload.select(
            "event_id",
            F.get_json_object(p, "$.user_id").cast("long").alias("out_user_id"),
            F.get_json_object(p, "$.content_id").cast("long").alias("out_content_id"),
            F.get_json_object(p, "$.event_type").alias("out_event_type"),
            F.get_json_object(p, "$.duration_ms").cast("long").alias("out_duration_ms"),
            F.get_json_object(p, "$.content_type").alias("out_content_type"),
            p.contains('"duration_ms"').alias("has_duration"),
            p.contains('"content_type"').alias("has_content_type"),
        )

    q["outbox_roundtrip"] = outbox_roundtrip

    def cdc_edge_cases(spark: SparkSession, sf: str) -> DataFrame:
        """P10 + P11 in one per-row pass: parse-else-hash surrogate key
        and unparseable-timestamp fallback (the reference uses now();
        tests pin a literal, SURVEY §7.3)."""
        ev = load_table(spark, sf, "events")
        id_str = F.when(
            F.col("event_id") % 10 == 0,
            F.concat(F.lit("evt-"), F.col("event_id").cast("string")),
        ).otherwise(F.col("event_id").cast("string"))
        wire = F.when(F.col("event_id") % 23 == 0, F.lit("not-a-timestamp")).otherwise(
            F.date_format("ts", cdc_feed.ISO_SECONDS)
        )
        parsed = cdc.parse_event_ts(wire)
        fallback = F.lit("2024-02-01 00:00:00").cast("timestamp")
        out = ev.select(
            "event_id",
            id_str.alias("id_str"),
            F.unix_micros(F.coalesce(parsed, fallback)).alias("event_ts_us"),
            (F.col("event_id") % 23 == 0).alias("used_fallback"),
        )
        return out.withColumn(
            "surrogate_key",
            F.coalesce(
                F.col("id_str").try_cast("long"), F.abs(portable_hash64(F.col("id_str")))
            ),
        )

    q["cdc_edge_cases"] = cdc_edge_cases
    q["rollup_incremental_merge"] = lambda spark, sf: rollups.incremental_rollup_merge(
        _enriched(spark, sf)
    ).select(_us("hour_ts").alias("hour_ts_us"), "content_type", "event_type", "cnt", "total_score")
    # sessionize stays oracle-checked in tests/test_consolidated.py; its
    # gate slot carries the composed corpus-prep flow (round-2 verdict
    # #4: the flagship LLM composition deserves a driver hash row more
    # than a second session-window idiom).
    q["corpus_prep"] = lambda spark, sf: corpus.prepare_training_corpus(_docs_dup(spark, sf))

    def streaming_replay_rollup(spark: SparkSession, sf: str) -> DataFrame:
        """The CDC feed replayed through the *streaming* path (file
        source → watermark → stream-static join → foreachBatch MERGE
        sink), then rolled up — hash-matches the batch hourly_rollup
        oracle, proving replay-vs-batch equivalence through the gate."""
        import tempfile

        from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import (
            pipeline as sp,
        )

        base = tempfile.mkdtemp(prefix="sg_stream_")
        events = load_table(spark, sf, "events")
        feed_dir = f"{base}/feed"
        cdc_feed.engagement_cdc_json(events).write.mode("overwrite").text(feed_dir)
        dim_dir = f"{base}/dim"
        _dim(spark, sf).write.mode("overwrite").parquet(dim_dir)
        wh_dir = f"{base}/wh"
        stream = sp.read_json_lines_stream(spark, feed_dir)
        enriched = sp.enriched_event_stream(spark, stream, dim_dir)
        sink = sp.start_warehouse_sink(enriched, wh_dir, f"{base}/ckpt")
        sink.processAllAvailable()
        sink.stop()
        return rollups.hourly_rollup(spark.read.parquet(wh_dir)).select(
            _us("hour_ts").alias("hour_ts_us"), "content_type", "event_type", "cnt", "total_score"
        )

    q["streaming_replay_rollup"] = streaming_replay_rollup
    # salted_rollup folded into pytest (tests/test_consolidated.py) —
    # bit-equal to the unsalted event_type rollup by construction

    # --- north-star extensions: dedup / similarity / text / multimodal ---
    # dedup_exact folded into pytest (tests/test_consolidated.py) — its
    # digest-keyed shuffle is stage 1 of training_data_prep, driver-checked
    q["training_data_prep"] = lambda spark, sf: dedup.training_data_prep(_docs_dup(spark, sf))
    q["tfidf_top_terms"] = lambda spark, sf: dedup.tfidf_top_terms(
        load_table(spark, sf, "documents")
    )
    # hash_split and vocab_top_bigrams folded to pytest (round 6: their
    # portable-hash-filter and token-df machinery is exercised by
    # deterministic_sample and tfidf_top_terms respectively; both keep
    # their ORACLE twins in tests/test_consolidated.py) to free gate
    # slots for the retrieval operators below.
    q["dedup_ngram_jaccard"] = lambda spark, sf: dedup.ngram_jaccard_pairs(
        _docs_dup(spark, sf), threshold=0.5
    )
    q["dedup_minhash_lsh"] = lambda spark, sf: dedup.minhash_lsh_pairs(_docs_dup(spark, sf))
    q["dedup_clusters"] = lambda spark, sf: dedup.dedup_clusters(_docs_dup(spark, sf))
    q["fuzzy_dedup_keep"] = lambda spark, sf: dedup.fuzzy_dedup_keep(_docs_dup(spark, sf))
    # simhash_pairs folded into pytest (round 10: its banded-candidate +
    # exact-verify path is already gate-covered by dedup_minhash_lsh +
    # fuzzy_dedup_keep; the oracle twin lives on in
    # tests/test_consolidated.py) — its slot carries the stored
    # inverted-index BM25 serving path below.
    # bits pinned explicitly: the DuckDB oracle embeds an 8-bit (resp.
    # 6-bit) plane table as literals, so the gate must not follow the
    # adaptive corpus-sized default (lsh_bits_for) — see oracle.py.
    q["embedding_near_dup"] = lambda spark, sf: dedup.embedding_near_dup_pairs(
        _embs_dup(spark, sf), threshold=0.9, bits=8
    )
    q["ann_bruteforce_topk"] = lambda spark, sf: similarity.brute_force_topk(
        load_table(spark, sf, "embeddings"),
        similarity.default_queries(load_table(spark, sf, "embeddings")),
    )
    q["ann_ivf_topk"] = lambda spark, sf: similarity.ivf_topk(
        load_table(spark, sf, "embeddings"),
        similarity.default_queries(load_table(spark, sf, "embeddings")),
        bits=6,
    )
    # ann_quantized_topk folded into pytest (round 10: same scan/rank
    # shape as ann_bruteforce_topk, int8-quantized; oracle twin in
    # tests/test_consolidated.py) — its slot carries the LM perplexity
    # gate below.

    q["bm25_topk"] = lambda spark, sf: retrieval.bm25_topk(
        load_table(spark, sf, "documents"), ["spark", "vector", "window"], k=25
    )

    def bm25_from_index(spark: SparkSession, sf: str) -> DataFrame:
        """The STORED-ARTIFACT serving path through the gate (round-9
        verdict task 1): build the inverted text index in a tempdir
        (tokenize once, postings partitioned by term bucket, manifest
        corpus stats), then answer the same query off the index — the
        gate hash proves build_text_index → bm25_topk_from_index ≡
        the from-scratch DuckDB BM25 twin."""
        import tempfile

        d = tempfile.mkdtemp(prefix="sg_tix_gate_")
        retrieval.build_text_index(load_table(spark, sf, "documents"), d)
        return retrieval.bm25_topk_from_index(
            spark, d, ["spark", "vector", "window"], k=25
        )

    q["bm25_from_index"] = bm25_from_index

    def lm_perplexity(spark: SparkSession, sf: str) -> DataFrame:
        """The CCNet-style perplexity gate through the driver hash
        (round-9 verdict task 1): train the add-α bigram LM on the
        doc_id % 3 = 0 reference split, score the WHOLE corpus.
        Surfaces round(ln(ppl), 6) — the mean log-prob, monotone in
        ppl — because exp() amplifies cross-engine last-bit summation
        differences at high perplexities past any fixed rounding."""
        import tempfile

        from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
            lm_filter,
        )

        docs = load_table(spark, sf, "documents")
        d = tempfile.mkdtemp(prefix="sg_lm_gate_")
        lm_filter.train_ngram_lm(
            docs.where(F.col("doc_id") % 3 == 0), d, alpha=0.1
        )
        return lm_filter.perplexity_score(spark, docs, d).select(
            "doc_id", "n_bigrams", F.round(F.log("ppl"), 6).alias("log_ppl")
        )

    q["lm_perplexity"] = lm_perplexity

    def hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
        """Hybrid retrieval: the BM25 lexical top-10 fused by RRF with
        a brute-force cosine top-10 for the pinned query vector
        vec_id=0 (vec_id doubles as doc_id in the fixtures)."""
        docs = load_table(spark, sf, "documents")
        emb = load_table(spark, sf, "embeddings")
        lex = retrieval.bm25_topk(docs, ["spark", "vector", "window"], k=10)
        q0 = similarity.default_queries(emb).where(F.col("query_id") == 0)
        sem = similarity.brute_force_topk(emb, q0, k=10).select(
            F.col("neighbor_id").alias("doc_id"), "cos_sim"
        )
        return retrieval.rrf_fuse(lex, sem, k=20)

    q["hybrid_rrf"] = hybrid_rrf

    def text_analysis(spark: SparkSession, sf: str) -> DataFrame:
        """Language-ID, quality metrics, token counts and document
        fingerprints (md5 + min-shingle minhash + simhash) in one
        per-document pass: the scalar metrics are pure expressions on
        the scan; the two fingerprint aggregates left-join back on
        doc_id."""
        docs = load_table(spark, sf, "documents")
        toks = T.tokens(F.col("text"))
        cnt = {
            lang: F.size(F.filter(toks, lambda t: t.isin(markers)))
            for lang, markers in T.LANG_MARKERS.items()
        }
        guess = (
            F.when(
                (cnt["en"] >= cnt["de"]) & (cnt["en"] >= cnt["fr"])
                & (cnt["en"] >= cnt["es"]) & (cnt["en"] >= cnt["zh"]),
                "en",
            )
            .when((cnt["de"] >= cnt["fr"]) & (cnt["de"] >= cnt["es"]) & (cnt["de"] >= cnt["zh"]), "de")
            .when((cnt["fr"] >= cnt["es"]) & (cnt["fr"] >= cnt["zh"]), "fr")
            .when(cnt["es"] >= cnt["zh"], "es")
            .otherwise("zh")
        )
        base = docs.select(
            "doc_id",
            "lang",
            guess.alias("guessed_lang"),
            F.size(toks).alias("n_tokens"),
            F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x).alias(
                "total_chars"
            ),
            F.round(T.stopword_ratio(F.col("text")), 6).alias("stopword_ratio"),
            F.round(T.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
            (F.size(toks).between(5, 1000)).alias("len_ok"),
            T.bpe_ish_token_count(F.col("text")).alias("bpe_ish_tokens"),
            F.md5(T.normalize_text(F.col("text"))).alias("text_md5"),
        )
        sig = dedup.minhash_signatures(docs, k=1).select(
            "doc_id", F.col("mh_0").alias("min_shingle_hash")
        )
        fp = dedup.simhash_fingerprints(docs).select("doc_id", "simhash")
        return base.join(sig, "doc_id", "left").join(fp, "doc_id", "left")

    q["text_analysis"] = text_analysis

    q["multimodal_features"] = lambda spark, sf: multimodal.extract_features(
        multimodal.assets_from_documents(load_table(spark, sf, "documents"))
    ).select("asset_id", "modality", "byte_len", "payload_md5")
    # multimodal_meta_stats folded into pytest (tests/test_consolidated.py)
    # Gate variant surfaces ratios as integer ppm (pure integer division
    # both sides) — round 2's hash-red row was driver float
    # canonicalization on raw double ratios; the double-valued
    # quality_signals stays oracle-checked in tests/test_consolidated.py.
    q["quality_signals"] = lambda spark, sf: quality.quality_signals_ppm(
        load_table(spark, sf, "documents")
    )
    q["pii_redact"] = lambda spark, sf: quality.pii_redact(
        quality.with_synthetic_pii(load_table(spark, sf, "documents"))
    )
    q["deterministic_sample"] = lambda spark, sf: corpus.deterministic_sample(
        load_table(spark, sf, "documents")
    )
    q["pack_sequences"] = lambda spark, sf: corpus.pack_sequences(
        load_table(spark, sf, "documents")
    )

    # --- relational breadth (SURVEY §7.2 milestone 4) ---
    q["pricing_summary"] = lambda spark, sf: R.pricing_summary(load_table(spark, sf, "lineitem"))
    q["star_join_revenue"] = lambda spark, sf: R.star_join_revenue(
        load_table(spark, sf, "lineitem"), load_table(spark, sf, "orders"),
        load_table(spark, sf, "customer"), load_table(spark, sf, "supplier"),
        load_table(spark, sf, "nation"), load_table(spark, sf, "region"),
    )
    q["top_revenue_orders"] = lambda spark, sf: R.top_unshipped_orders(
        load_table(spark, sf, "lineitem"), load_table(spark, sf, "orders"),
        load_table(spark, sf, "customer"),
    )
    q["semi_anti_join"] = lambda spark, sf: R.semi_anti_join_keys(
        load_table(spark, sf, "customer"), load_table(spark, sf, "orders"),
        load_table(spark, sf, "part"), load_table(spark, sf, "lineitem"),
    )
    q["range_join"] = lambda spark, sf: R.range_join_shipments(
        load_table(spark, sf, "orders"), load_table(spark, sf, "lineitem")
    )
    q["asof_join"] = lambda spark, sf: R.asof_join_latest_order(
        load_table(spark, sf, "events"), load_table(spark, sf, "orders")
    )
    # cube_order_stats folded into pytest (tests/test_consolidated.py) —
    # cube is the same Expand-based grouping-sets path grouping_analytics drives
    q["grouping_analytics"] = lambda spark, sf: R.grouping_analytics(
        spark, load_table(spark, sf, "lineitem")
    )
    q["distinct_stats"] = lambda spark, sf: R.distinct_stats(load_table(spark, sf, "lineitem"))
    q["set_ops"] = lambda spark, sf: R.set_ops_segments(load_table(spark, sf, "customer")).select(
        "c_custkey", "op"
    )
    q["window_analytics"] = lambda spark, sf: R.window_order_analytics(load_table(spark, sf, "orders"))
    q["unpivot_event_counts"] = lambda spark, sf: R.unpivot_event_counts(
        load_table(spark, sf, "events")
    )
    q["quantile_conditional_aggs"] = lambda spark, sf: R.quantile_conditional_aggs(
        load_table(spark, sf, "lineitem")
    )
    q["array_agg_event_types"] = lambda spark, sf: R.array_agg_event_types(
        load_table(spark, sf, "events")
    )
    q["correlated_subquery"] = lambda spark, sf: R.correlated_subquery_expensive_parts(
        load_table(spark, sf, "part")
    )
    # ClickHouse windowFunnel analog (behavioral.py) — holds the gate
    # slot that having_large_orders ceded (that HAVING demo stays
    # DuckDB-twinned in tests/test_consolidated.py).
    # the funnel reads only (user_id, event_type, event_ts); id must
    # stay (unwrap drops id-less records) — same trimmed-wire treatment
    # as _ROLLUP_FIELDS, same result (omitted keys surface as NULLs the
    # funnel never touches)
    q["funnel_levels"] = lambda spark, sf: behavioral.funnel_levels(
        _engagement(spark, sf, fields=("id", "user_id", "event_type", "event_ts")),
        ("view", "click", "purchase"),
        window_s=_oracle.FUNNEL_WINDOW_S,
    )

    def scalar_funcs(spark: SparkSession, sf: str) -> DataFrame:
        """Scalar-function surface — string / date / math / JSON / CASE
        in one per-row pass over events (the per-table string/date/math
        variants live on in tests/test_consolidated.py)."""
        ev = load_table(spark, sf, "events")
        v = F.col("value")
        bucket = (
            F.when(v < 10, "tiny")
            .when(v < 50, "small")
            .when(v < 150, "medium")
            .otherwise("large")
        )
        return ev.select(
            "event_id",
            # string functions
            F.upper("event_type").alias("et_upper"),
            F.substring("event_type", 1, 3).alias("et_prefix"),
            F.length("event_type").alias("et_len"),
            F.concat_ws("|", "event_type", F.col("user_id").cast("string")).alias("et_user"),
            F.col("event_type").like("%i%").alias("has_i"),
            F.lpad(F.col("user_id").cast("string"), 6, "0").alias("user_padded"),
            F.reverse("event_type").alias("et_rev"),
            F.replace(F.col("event_type"), F.lit("e"), F.lit("3")).alias("et_leet"),
            F.regexp_extract("event_type", "^([a-z]+)", 1).alias("et_word"),
            # JSON payload access (P15)
            F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
            # date functions
            F.year("ts").alias("ev_year"),
            F.month("ts").alias("ev_mon"),
            F.dayofmonth("ts").alias("ev_day"),
            F.dayofweek("ts").alias("ev_dow"),
            F.quarter("ts").alias("ev_quarter"),
            F.date_format(F.date_trunc("month", "ts"), "yyyy-MM-dd").alias("month_start"),
            F.date_format(F.last_day("ts"), "yyyy-MM-dd").alias("month_end"),
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("days_into_2024"),
            # math functions
            F.floor(v).alias("v_floor"),
            F.ceil(v).alias("v_ceil"),
            F.abs(v - 50).alias("v_dev"),
            F.round(F.sqrt(F.abs(v)), 6).alias("v_sqrt"),
            F.round(F.log(F.abs(v) + 1), 6).alias("v_ln"),
            F.round(F.pow(v, 2), 2).alias("v_sq"),
            (F.floor(v).cast("long") % 7).alias("v_mod"),
            # CASE buckets
            bucket.alias("v_bucket"),
        )

    q["scalar_funcs"] = scalar_funcs

    assert len(q) <= 50, f"driver gate records only 50 queries; got {len(q)}"
    return q


def oracle_sql() -> dict[str, str]:
    # ORACLE also carries twins for registry-folded variants (checked in
    # tests/test_consolidated.py); the driver contract exposes only the
    # entries with a live queries() key.
    registered = set(queries())
    return {k: v for k, v in _oracle.ORACLE.items() if k in registered}
