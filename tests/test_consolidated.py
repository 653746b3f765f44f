"""Oracle parity for query variants folded OUT of the driver registry.

The driver's correctness gate records only the first 50
``queries()`` entries, so projection-redundant variants were
consolidated (VERDICT.md round 1, next-round item 1).  Nothing lost
its correctness check: every folded-away variant is still
oracle-differential-tested here, with the same DuckDB twin SQL it had
in the driver registry.
"""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as entrymod
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    dedup,
    multimodal,
    rollups,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.oracle import (
    ORACLE,
    _simhash_sql,
    q,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table
from tests.oracle_utils import compare


def _check(sdf, sql, ducks):
    srows = [tuple(r) for r in sdf.collect()]
    res = ducks.sql(sql)
    problems = compare(sdf.columns, srows, [d[0] for d in res.description], res.fetchall())
    assert not problems, " | ".join(problems)
    assert srows, "empty result"


def test_cdc_ts_parse(spark, sf_dir, ducks):
    """4-wire-format timestamp parse (projection of cdc_unwrap)."""
    sdf = entrymod._engagement(spark, sf_dir).select(
        "event_id",
        (F.col("event_id") % 4).alias("wire_format"),
        F.unix_micros("event_ts").alias("event_ts_us"),
    )
    _check(sdf, q("""
SELECT event_id, event_id % 4 AS wire_format, epoch_us(event_ts) AS event_ts_us
FROM engagement
"""), ducks)


def test_engagement_score_projection(spark, sf_dir, ducks):
    sdf = entrymod._enriched(spark, sf_dir).select(
        "event_id", "event_type", "duration_ms", "engagement_score"
    )
    _check(sdf, q("""
SELECT event_id, event_type, duration_ms, engagement_score FROM enriched
"""), ducks)


def test_content_leaderboard(spark, sf_dir, ducks):
    sdf = rollups.content_leaderboard(entrymod._enriched(spark, sf_dir))
    _check(sdf, q("""
SELECT content_id, user_id, total_score,
       row_number() OVER (PARTITION BY content_id
                          ORDER BY total_score DESC, user_id) AS rnk
FROM (
  SELECT content_id, user_id,
         CAST(sum(CAST(engagement_score AS DECIMAL(18,2))) AS DOUBLE) AS total_score
  FROM enriched GROUP BY 1, 2
)
"""), ducks)


def test_json_props(spark, sf_dir, ducks):
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    sdf = ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum("k").alias("sum_k"),
        (F.sum("k").cast("double") / F.count("*")).alias("avg_k"),
    )
    _check(sdf, q("""
SELECT event_type, count(*) AS cnt, CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(CAST(sum(k) AS BIGINT) AS DOUBLE) / count(*) AS avg_k
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY 1
"""), ducks)


def test_pivot_event_types(spark, sf_dir, ducks):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.relational import (
        pivot_event_types,
    )

    sdf = pivot_event_types(load_table(spark, sf_dir, "events"))
    _check(sdf, q("""
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'view') AS "view",
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'error') AS error
FROM events GROUP BY 1
"""), ducks)


def test_rollup_revenue(spark, sf_dir, ducks):
    """ROLLUP lattice (now a subset of the grouping_analytics sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    sdf = li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        F.count("*").alias("cnt"),
    )
    _check(sdf, q("""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       count(*) AS cnt
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""), ducks)


def test_string_funcs(spark, sf_dir, ducks):
    p = load_table(spark, sf_dir, "part")
    sdf = p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.reverse("p_brand").alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )
    _check(sdf, q("""
SELECT p_partkey, upper(p_name) AS name_upper, substr(p_name, 1, 5) AS name_prefix,
       length(p_name) AS name_len, regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
       concat_ws('|', p_brand, p_type) AS brand_type, (p_name LIKE '%a%') AS has_a,
       replace(p_type, ' ', '_') AS type_snake, reverse(p_brand) AS brand_rev,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
FROM part
"""), ducks)


def test_date_funcs(spark, sf_dir, ducks):
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    sdf = o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.dayofweek(d).alias("order_dow"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(d, F.lit("1995-01-01")).alias("days_since_epoch_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).alias("order_quarter"),
    )
    _check(sdf, q("""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(day(o_orderdate) AS INT) AS order_day,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS order_dow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
         AS days_since_epoch_start,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(quarter(o_orderdate) AS INT) AS order_quarter
FROM orders
"""), ducks)


def test_math_funcs(spark, sf_dir, ducks):
    li = load_table(spark, sf_dir, "lineitem")
    sdf = li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice").cast("decimal(18,2)") * F.lit("0.1").cast("decimal(2,1)")
        ).cast("double").alias("price_tenth"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", 2), 2).alias("qty_sq"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod"),
    )
    _check(sdf, q("""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(2,1)) AS DOUBLE) AS price_tenth,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       abs(l_discount - 0.05) AS disc_dev,
       round(sqrt(l_quantity), 6) AS qty_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       round(pow(l_quantity, 2), 2) AS qty_sq,
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod
FROM lineitem
"""), ducks)


def test_case_when_buckets(spark, sf_dir, ducks):
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 10, "tiny")
        .when(F.col("value") < 50, "small")
        .when(F.col("value") < 150, "medium")
        .otherwise("large")
    )
    sdf = ev.select(bucket.alias("bucket"), "value").groupBy("bucket").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    _check(sdf, q("""
SELECT bucket, count(*) AS cnt,
       CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (
  SELECT CASE WHEN "value" < 10 THEN 'tiny' WHEN "value" < 50 THEN 'small'
              WHEN "value" < 150 THEN 'medium' ELSE 'large' END AS bucket, "value"
  FROM events
) GROUP BY 1
"""), ducks)


def test_minute_topk(spark, sf_dir, ducks):
    """A6 minute-bucket top-k (folded r2: same agg+rank path as the
    driver-checked trending_recent, minus the retention filter)."""
    sdf = rollups.minute_topk(entrymod._enriched(spark, sf_dir))
    _check(sdf, ORACLE["minute_topk"], ducks)


def test_salted_rollup(spark, sf_dir, ducks):
    """T10 skew salting (folded r2): salted two-stage rollup stays
    bit-equal to the direct event_type rollup."""
    sdf = rollups.salted_event_type_rollup(entrymod._enriched(spark, sf_dir))
    _check(sdf, ORACLE["salted_rollup"], ducks)


def test_multimodal_meta_stats(spark, sf_dir, ducks):
    """Typed-metadata rollup per modality (folded r2: the group-stats
    companion of the driver-checked multimodal_features)."""
    sdf = multimodal.asset_metadata_stats(
        multimodal.assets_from_documents(
            entrymod.load_table(spark, sf_dir, "documents")
        )
    )
    _check(sdf, ORACLE["multimodal_meta_stats"], ducks)


def test_simhash_fingerprints(spark, sf_dir, ducks):
    sdf = dedup.simhash_fingerprints(load_table(spark, sf_dir, "documents"))
    _check(sdf, q(f"""
SELECT doc_id, simhash FROM ({_simhash_sql("doc_toks")})
"""), ducks)


def test_cube_order_stats(spark, sf_dir, ducks):
    """CUBE lattice (folded r2: cube is the same Expand-based
    grouping-sets physical path the driver-checked grouping_analytics
    drives; kept oracle-checked here)."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        relational as R,
    )

    sdf = R.cube_order_stats(load_table(spark, sf_dir, "orders"))
    _check(sdf, ORACLE["cube_order_stats"], ducks)


def test_dedup_exact_groups(spark, sf_dir, ducks):
    """Exact duplicate groups (folded r2: the md5-digest shuffle is
    stage 1 of the driver-checked training_data_prep; the group view
    stays oracle-checked here)."""
    sdf = dedup.exact_dedup_groups(entrymod._docs_dup(spark, sf_dir))
    _check(sdf, ORACLE["dedup_exact"], ducks)


def test_rollup_gap_fill(spark, sf_dir, ducks):
    """WITH FILL analog: dense hourly spine with explicit zero rows,
    null-safe on the nullable content_type group key."""
    sdf = rollups.fill_hourly_gaps(
        rollups.hourly_rollup(entrymod._enriched(spark, sf_dir))
    ).select(
        F.unix_micros("hour_ts").alias("hour_ts_us"),
        "content_type", "event_type", "cnt", "total_score", "is_gap",
    )
    _check(sdf, ORACLE["rollup_gap_fill"], ducks)
    assert sdf.where("is_gap").count() > 0, "fixture should contain real gaps"


def test_window_frame_analytics(spark, sf_dir, ducks):
    """Bounded-frame moving average, lead/first_value, ntile,
    percent_rank (consolidated: shares window_analytics' single
    per-customer Window chain)."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        relational as R,
    )

    sdf = R.window_frame_analytics(load_table(spark, sf_dir, "orders"))
    _check(sdf, ORACLE["window_frames"], ducks)


def test_label_centroids(spark, sf_dir, ducks):
    """Per-label mean embedding rollup (posexplode → dim-keyed partial
    averages → ordered reassembly), DuckDB-twinned."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        similarity,
    )

    sdf = similarity.label_centroids(load_table(spark, sf_dir, "embeddings"))
    _check(sdf, ORACLE["label_centroids"], ducks)


def test_unigram_logprob(spark, sf_dir, ducks):
    """Mean unigram -log p quality/novelty signal, DuckDB-twinned."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import quality

    sdf = quality.unigram_logprob_score(load_table(spark, sf_dir, "documents"))
    _check(sdf, ORACLE["unigram_logprob"], ducks)


def test_bigram_logprob(spark, sf_dir, ducks):
    """Mean interpolated-bigram -log p (word-order coherence signal),
    DuckDB-twinned — scrambled text has plausible unigrams but
    improbable transitions."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import quality

    sdf = quality.bigram_logprob_score(load_table(spark, sf_dir, "documents"))
    _check(sdf, ORACLE["bigram_logprob"], ducks)


def test_simhash_near_pairs(spark, sf_dir, ducks):
    """Banded SimHash hamming≤3 search (4×15-bit bands, verified
    hamming), DuckDB-twinned; must be a superset of the hamming-0
    pairs."""
    docs = entrymod._docs_dup(spark, sf_dir)
    sdf = dedup.simhash_near_pairs(docs)
    _check(sdf, ORACLE["simhash_near_pairs"], ducks)
    zero = {(r["doc_a"], r["doc_b"]) for r in dedup.simhash_dup_pairs(docs).collect()}
    near = {(r["doc_a"], r["doc_b"]) for r in sdf.collect()}
    assert zero <= near


def test_hopping_window_counts(spark, sf_dir, ducks):
    """Batch hopping-window agg (10 min / 5 min) against a DuckDB twin
    that materializes each event's two containing windows explicitly."""
    sdf = (
        entrymod._enriched(spark, sf_dir)
        .groupBy(F.window("event_ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("engagement_score").cast("decimal(18,2)")).cast("double").alias("total_score"),
        )
        .select(F.unix_micros("w.start").alias("w_start_us"), "event_type", "cnt", "total_score")
    )
    _check(sdf, ORACLE["hopping_window_counts"], ducks)


def test_decontaminate(spark, sf_dir, ducks):
    """Eval-set n-gram decontamination (benchmark = every 25th doc),
    DuckDB-twinned; benchmark members must flag themselves."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 25 == 0)
    sdf = dedup.decontaminate(docs, bench)
    _check(sdf, ORACLE["decontaminate"], ducks)
    self_flags = sdf.where((F.col("doc_id") % 25 == 0) & ~F.col("contaminated")).count()
    assert self_flags == 0, "benchmark docs must be flagged contaminated"


def test_hash_split(spark, sf_dir, ducks):
    """Deterministic train/val/test hash split (folded r6: its
    driver-gate slot now carries ``bm25_topk``; the portable-hash
    bucketing stays gate-exercised via deterministic_sample and keeps
    the same twin SQL it had in the registry)."""
    sdf = dedup.hash_split(load_table(spark, sf_dir, "documents"))
    _check(sdf, ORACLE["hash_split"], ducks)


def test_vocab_top_bigrams(spark, sf_dir, ducks):
    """Corpus-level bigram vocabulary (folded r6: its driver-gate slot
    now carries ``hybrid_rrf``; the token-df machinery stays
    gate-exercised via tfidf_top_terms and keeps the same twin SQL it
    had in the registry)."""
    sdf = dedup.vocab_top_bigrams(load_table(spark, sf_dir, "documents"))
    _check(sdf, ORACLE["vocab_top_bigrams"], ducks)


def test_sessionize(spark, sf_dir, ducks):
    """30-min-gap sessionization (folded r3: its driver-gate slot now
    carries the composed corpus_prep flow; the window idiom stays
    DuckDB-twinned here)."""
    sdf = rollups.sessionize(load_table(spark, sf_dir, "events"))
    _check(sdf, ORACLE["sessionize"], ducks)


def test_having_large_orders(spark, sf_dir, ducks):
    """HAVING-filtered join (folded r4: its driver-gate slot now
    carries the windowFunnel analog ``funnel_levels``; same twin SQL
    it had in the registry)."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import relational
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.oracle import (
        HAVING_LARGE_ORDERS_SQL,
    )

    sdf = relational.having_large_orders(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
    _check(sdf, HAVING_LARGE_ORDERS_SQL, ducks)


def test_limit_by(spark, sf_dir, ducks):
    """ClickHouse LIMIT n BY analog: 2 most recent orders per customer
    segment-bucket, with and without OFFSET."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import relational

    orders = load_table(spark, sf_dir, "orders")
    sdf = relational.limit_by(
        orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        ["o_custkey"],
        2,
        [F.col("o_orderdate").desc(), F.col("o_orderkey").asc()],
    )
    _check(sdf, q("""
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM (
  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
  FROM orders) WHERE rn <= 2
"""), ducks)

    off = relational.limit_by(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        ["o_custkey"],
        2,
        [F.col("o_orderdate").desc(), F.col("o_orderkey").asc()],
        offset=1,
    )
    _check(off, q("""
SELECT o_orderkey, o_custkey, o_orderdate FROM (
  SELECT o_orderkey, o_custkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
  FROM orders) WHERE rn > 1 AND rn <= 3
"""), ducks)


def test_shuffle_shard_by_tokens(spark, sf_dir, ducks):
    """Deterministic global shuffle + token-balanced sharding: the
    two-level distributed prefix sum must equal the plain global
    window (the DuckDB twin), be invariant to bucket count and input
    partition layout, keep interior shard token sums within
    ±(max_doc−1) of target, and never plan a single-partition
    window."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import corpus
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.plans.explain import (
        plan_string,
    )

    docs = load_table(spark, sf_dir, "documents")
    target = 2048
    sdf = corpus.shuffle_shard_by_tokens(docs, target_tokens=target, buckets=64)
    _check(sdf, q(f"""
, shuf AS (
  SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
         ('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS order_key
  FROM doc_toks
), pre AS (
  SELECT doc_id, n_tokens, order_key,
         COALESCE(SUM(n_tokens) OVER (ORDER BY order_key, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM shuf
)
SELECT doc_id, n_tokens, order_key,
       CAST(before // {target} AS INT) AS shard,
       CAST(before % {target} AS BIGINT) AS shard_off
FROM pre
"""), ducks)

    # the window must be bucket-partitioned, never a global sort-to-one
    plan = plan_string(sdf)
    assert "_b" in plan and "SinglePartition" not in plan

    base = sorted(map(tuple, sdf.collect()))
    # bucket-count invariance: the decomposition is exact, so any
    # power-of-two bucket count yields the identical sharding
    alt = corpus.shuffle_shard_by_tokens(docs, target_tokens=target, buckets=4)
    assert sorted(map(tuple, alt.collect())) == base
    # partition-layout invariance
    rep = corpus.shuffle_shard_by_tokens(
        docs.repartition(7), target_tokens=target, buckets=64
    )
    assert sorted(map(tuple, rep.collect())) == base

    # interior shards hold target ± (max_doc_tokens − 1) tokens
    per_shard = {
        r["shard"]: r["t"]
        for r in sdf.groupBy("shard").agg(F.sum("n_tokens").alias("t")).collect()
    }
    max_doc = sdf.agg(F.max("n_tokens")).first()[0]
    n_shards = max(per_shard) + 1
    assert n_shards >= 3, "fixture must span several shards"
    for s in range(n_shards - 1):
        assert abs(per_shard.get(s, 0) - target) <= max_doc - 1, (s, per_shard.get(s))
    spark.catalog.clearCache()


def test_simhash_pairs_twin(spark, sf_dir, ducks):
    """Ceded its driver slot to bm25_from_index (round 10): the
    banded-candidate + exact-verify path is gate-covered by
    dedup_minhash_lsh + fuzzy_dedup_keep; the full oracle parity
    lives on here with the same DuckDB twin SQL."""
    sdf = dedup.simhash_dup_pairs(entrymod._docs_dup(spark, sf_dir))
    _check(sdf, ORACLE["simhash_pairs"], ducks)


def test_ann_quantized_topk_twin(spark, sf_dir, ducks):
    """Ceded its driver slot to lm_perplexity (round 10): same
    scan/rank shape as the gate-checked ann_bruteforce_topk,
    int8-quantized; the full oracle parity lives on here."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        similarity,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    sdf = similarity.quantized_topk(emb, similarity.default_queries(emb))
    _check(sdf, ORACLE["ann_quantized_topk"], ducks)


def test_bm25_topk_twin(spark, sf_dir, ducks):
    """BM25 lexical retrieval: exact DuckDB twin (same tokenizer CTE,
    same weighting, scores rounded to 4dp before the deterministic
    (score DESC, doc_id) rank), and the precomputed-lengths fast path
    returns identical rows."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import retrieval

    docs = load_table(spark, sf_dir, "documents")
    terms = ["spark", "vector", "window"]
    k1, b, k = 1.2, 0.75, 25
    sdf = retrieval.bm25_topk(docs, terms, k=k)
    _check(sdf, q(f"""
, dl AS (SELECT doc_id, len(toks) AS dl FROM doc_toks),
  bstats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
  btf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM (SELECT doc_id, unnest(toks) AS term FROM doc_toks)
    WHERE term IN ('spark', 'vector', 'window')
    GROUP BY doc_id, term
  ),
  bdf AS (SELECT term, count(*) AS df FROM btf GROUP BY term)
SELECT doc_id, round(sum(
         ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         * tf * ({k1} + 1.0)
         / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))
       ), 4) AS bm25
FROM btf JOIN bdf USING(term) JOIN dl USING(doc_id) CROSS JOIN bstats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT {k}
"""), ducks)

    fast = retrieval.bm25_topk(
        docs, terms, k=k, lengths=retrieval.doc_lengths(docs)
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, sdf.collect()))


def test_rrf_fuse_pinned(spark):
    """Reciprocal-rank fusion micro-case: hand-computed 1/(60+r) sums,
    doc in both lists wins, ties broken by doc_id."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import retrieval

    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, bm25 double"
    )
    sem = spark.createDataFrame(
        [(2, 0.99), (4, 0.90), (1, 0.10)], "doc_id long, cos_sim double"
    )
    got = [(r["doc_id"], r["rrf"]) for r in retrieval.rrf_fuse(lex, sem, k=4).collect()]
    exp = {
        1: 1 / 61 + 1 / 63,  # lex rank 1, sem rank 3
        2: 1 / 62 + 1 / 61,  # lex rank 2, sem rank 1
        3: 1 / 63,
        4: 1 / 62,
    }
    want = sorted(
        ((d, round(v, 6)) for d, v in exp.items()), key=lambda t: (-t[1], t[0])
    )
    assert got == want
