"""DuckDB oracle SQL for every oracle-checkable query in the engine.

Each SQL string runs against the driver's pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings) and must produce the exact rows the matching Spark query
in ``__spark_entry__.queries()`` produces — same column names, same
values.

Cross-engine determinism rules used throughout (see SURVEY.md §5):
- timestamps surfaced as ``unix_micros`` bigints (DuckDB ``epoch_us``);
- money/score sums computed in DECIMAL(18,2+) then cast to double —
  exact, so engine-internal ordering can't perturb last bits;
- per-row doubles (scores, ratios, cosines) rounded explicitly, and
  any ranking happens on the *rounded* value with a unique-key
  tiebreak;
- the deterministic fixture derivations (sources/cdc_feed.py) are
  restated here as CTEs — same expressions, same operation order.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Shared CTE prefix: fixture derivations restated in ANSI SQL.
# ---------------------------------------------------------------------------

_ENGAGEMENT_BODY = """
  SELECT event_id,
         user_id,
         event_id % 200 AS content_id,
         event_type,
         CASE event_id % 4 WHEN 0 THEN 'ios' WHEN 1 THEN 'android'
                           WHEN 2 THEN 'web' ELSE 'tv' END AS device,
         CASE WHEN event_type <> 'click'
              THEN CAST(floor("value" * 1000) AS BIGINT) END AS duration_ms,
         CASE event_id % 4
           WHEN 0 THEN date_trunc('second', CAST(ts AS TIMESTAMP))
           WHEN 1 THEN CAST(ts AS TIMESTAMP)
           WHEN 2 THEN date_trunc('milliseconds', CAST(ts AS TIMESTAMP))
           ELSE date_trunc('second', CAST(ts AS TIMESTAMP))
         END AS event_ts,
         props AS raw_payload,
         CASE WHEN event_id % 11 = 0 AND event_id % 97 <> 0
              THEN NULL ELSE epoch_ms(CAST(ts AS TIMESTAMP)) END AS source_ts_ms
  FROM {src}
  WHERE event_id % 97 <> 0
"""

_SCORE_SQL = """
    round(
      (CASE lower(event_type)
         WHEN 'view' THEN 1.0 WHEN 'signup' THEN 0.5
         WHEN 'purchase' THEN 3.0 WHEN 'click' THEN 0.2 ELSE 1.0 END)
      * (CASE WHEN duration_ms > 0
              THEN least(2.5, ln(CAST(duration_ms AS DOUBLE) / 1000.0 + 1))
              ELSE 1.0 END), 2)
"""

PREFIX = f"""
WITH engagement AS ({_ENGAGEMENT_BODY.format(src="events")}),
-- FIXTURES.md B4: at-least-once duplicate delivery
events_dup AS (
  SELECT event_id, ts, user_id, event_type, "value", props FROM events
  UNION ALL
  SELECT event_id, ts + INTERVAL 1 HOUR, user_id, event_type,
         "value" + 1.0, props
  FROM events WHERE event_id % 13 = 0
),
engagement_dup AS ({_ENGAGEMENT_BODY.format(src="events_dup")}),
-- FIXTURES.md B2: content-dimension CDC version history (from part)
dim_versions AS (
  SELECT CAST(p_partkey AS BIGINT) AS id,
         lower(regexp_replace(p_name, ' ', '-', 'g')) AS slug,
         p_name AS title,
         CASE p_partkey % 3 WHEN 0 THEN 'podcast' WHEN 1 THEN 'newsletter'
                            ELSE 'video' END AS content_type,
         CAST(p_size AS BIGINT) * 60 AS length_seconds,
         FALSE AS is_delete,
         1704067200000 + p_partkey * 10 + 1 AS source_ts_ms
  FROM part
  UNION ALL
  SELECT CAST(p_partkey AS BIGINT),
         lower(regexp_replace(p_name, ' ', '-', 'g')), p_name,
         CASE p_partkey % 3 WHEN 0 THEN 'podcast' WHEN 1 THEN 'newsletter'
                            ELSE 'video' END,
         CAST(p_size AS BIGINT) * 60 + 30, FALSE,
         1704067200000 + p_partkey * 10 + 2
  FROM part WHERE p_partkey % 3 = 0
  UNION ALL
  SELECT CAST(p_partkey AS BIGINT), NULL, NULL, NULL, NULL, TRUE,
         1704067200000 + p_partkey * 10 + 3
  FROM part WHERE p_partkey % 17 = 0
),
dim_latest AS (
  SELECT id AS content_id, content_type, length_seconds, slug, title
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY id ORDER BY source_ts_ms DESC, is_delete DESC) AS _rn
    FROM dim_versions
  ) WHERE _rn = 1 AND NOT is_delete
),
enriched AS (
  SELECT e.*, d.content_type, d.length_seconds,
         CAST(e.duration_ms AS DOUBLE) / 1000.0 AS engagement_seconds,
         CASE WHEN d.length_seconds > 0 AND e.duration_ms IS NOT NULL
              THEN round((CAST(e.duration_ms AS DOUBLE) / 1000.0)
                         / CAST(d.length_seconds AS DOUBLE) * 10000.0) / 100.0
         END AS engagement_pct,
         {_SCORE_SQL} AS engagement_score
  FROM engagement e LEFT JOIN dim_latest d USING (content_id)
),
enriched_dup AS (
  SELECT e.*, d.content_type, d.length_seconds,
         {_SCORE_SQL} AS engagement_score
  FROM engagement_dup e LEFT JOIN dim_latest d USING (content_id)
),
-- north-star fixtures: corpora with constructed duplicates
documents_dup AS (
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 100000, text, lang, source, n_chars
  FROM documents WHERE doc_id % 10 = 0
),
embeddings_dup AS (
  SELECT * FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding, label
  FROM embeddings WHERE vec_id % 20 = 0
),
-- normalized text + tokens + word-3-shingles (twins of functions/text.py)
doc_norm AS (
  SELECT doc_id, lang, text,
         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
  FROM documents
),
doc_norm_dup AS (
  SELECT doc_id, lang, text,
         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
  FROM documents_dup
),
doc_toks AS (SELECT doc_id, lang, text, norm, string_split(norm, ' ') AS toks FROM doc_norm),
doc_toks_dup AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM doc_norm_dup),
doc_shingles AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(toks) >= 3
         THEN [array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks)-2)]
         ELSE CAST([] AS VARCHAR[]) END) AS sh
  FROM doc_toks
),
doc_shingles_dup AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(toks) >= 3
         THEN [array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks)-2)]
         ELSE CAST([] AS VARCHAR[]) END) AS sh
  FROM doc_toks_dup
),
shingle_x AS (
  SELECT doc_id, unnest(sh) AS shingle FROM doc_shingles WHERE len(sh) > 0
),
shingle_x_dup AS (
  SELECT doc_id, unnest(sh) AS shingle FROM doc_shingles_dup WHERE len(sh) > 0
),
-- stop-shingle removal twin (operators/dedup.py MAX_SHINGLE_DF)
shingle_kept_dup AS (
  SELECT doc_id, shingle FROM shingle_x_dup
  WHERE shingle IN (
    SELECT shingle FROM shingle_x_dup GROUP BY shingle HAVING count(*) <= 100
  )
)
"""


def _h(expr: str, seed: str) -> str:
    """DuckDB twin of functions.scalar.portable_hash64."""
    return f"CAST(('0x' || substr(md5('{seed}' || {expr}), 1, 15)) AS BIGINT)"


def _sign_bucket(vec: str, bits: int) -> str:
    """DuckDB twin of ``operators.dedup.sign_lsh_bucket`` — the SAME
    seeded Rademacher planes (imported, not re-derived) against the
    SAME micro-unit integer quantization.  All products/sums are
    integer-valued and ≤ ~10⁹, exact in float64, so
    ``list_dot_product`` reproduces Spark's int64 fold bit-for-bit."""
    from .operators.dedup import rademacher_planes

    qx = f"list_transform(CAST({vec} AS DOUBLE[]), x -> round(x * 1000000))"
    terms = " + ".join(
        "(CASE WHEN list_dot_product({qx}, {plane}) >= 0 THEN {w} ELSE 0 END)".format(
            qx=qx,
            plane="[" + ", ".join(f"{v}.0" for v in row) + "]",
            w=2**i,
        )
        for i, row in enumerate(rademacher_planes(bits))
    )
    return f"CAST({terms} AS BIGINT)"


def _cosine(a: str, b: str) -> str:
    return (
        f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
        f" / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
        f" * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))))"
    )


def q(sql: str) -> str:
    """Attach the shared CTE prefix to a query body."""
    return PREFIX + sql


ORACLE: dict[str, str] = {}

# ---------------------------------------------------------------------------
# CDC / reference-parity group (SURVEY.md §2.3-§2.7)
# ---------------------------------------------------------------------------

ORACLE["cdc_unwrap"] = q("""
SELECT event_id, user_id, content_id, event_type, device, duration_ms,
       epoch_us(event_ts) AS event_ts_us, raw_payload, source_ts_ms
FROM engagement
""")

ORACLE["cdc_delete_routing"] = q("""
SELECT id, content_type, length_seconds, is_delete, source_ts_ms
FROM dim_versions
""")

ORACLE["dim_compaction"] = q("""
SELECT content_id AS id, slug, title, content_type, length_seconds
FROM dim_latest
""")

ORACLE["enrich_join"] = q("""
SELECT event_id, content_id, user_id, event_type, device, duration_ms,
       epoch_us(event_ts) AS event_ts_us, content_type, length_seconds,
       engagement_seconds, engagement_pct, engagement_score
FROM enriched
""")

ORACLE["hourly_rollup"] = q("""
SELECT epoch_us(date_trunc('hour', event_ts)) AS hour_ts_us,
       content_type, event_type,
       count(*) AS cnt,
       CAST(sum(CAST(engagement_score AS DECIMAL(18,2))) AS DOUBLE) AS total_score
FROM enriched
GROUP BY 1, 2, 3
""")

ORACLE["dedup_latest"] = q("""
SELECT event_id, epoch_us(event_ts) AS event_ts_us, duration_ms, engagement_score
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY event_id ORDER BY event_ts DESC) AS _rn
  FROM enriched_dup
) WHERE _rn = 1
""")

ORACLE["user_leaderboard"] = q("""
SELECT user_id, content_id, total_score,
       row_number() OVER (PARTITION BY user_id
                          ORDER BY total_score DESC, content_id) AS rnk
FROM (
  SELECT user_id, content_id,
         CAST(sum(CAST(engagement_score AS DECIMAL(18,2))) AS DOUBLE) AS total_score
  FROM enriched GROUP BY 1, 2
)
""")

ORACLE["minute_topk"] = q("""
SELECT minute_bucket, content_id, total_score, rnk FROM (
  SELECT minute_bucket, content_id, total_score,
         row_number() OVER (PARTITION BY minute_bucket
                            ORDER BY total_score DESC, content_id) AS rnk
  FROM (
    SELECT strftime(event_ts, '%Y%m%d%H%M') AS minute_bucket, content_id,
           CAST(sum(CAST(engagement_score AS DECIMAL(18,2))) AS DOUBLE) AS total_score
    FROM enriched GROUP BY 1, 2
  )
) WHERE rnk <= 5
""")

ORACLE["event_counters"] = q("""
SELECT event_type, count(*) AS cnt FROM enriched GROUP BY 1
""")

ORACLE["latest_event"] = q("""
SELECT user_id, content_id, event_id, epoch_us(event_ts) AS event_ts_us,
       engagement_score
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, content_id
    ORDER BY event_ts DESC, event_id DESC) AS _rn
  FROM enriched
) WHERE _rn = 1
""")

ORACLE["outbox_roundtrip"] = q("""
SELECT event_id,
       CAST(user_id AS BIGINT) AS out_user_id,
       CAST(content_id AS BIGINT) AS out_content_id,
       event_type AS out_event_type,
       duration_ms AS out_duration_ms,
       content_type AS out_content_type,
       (duration_ms IS NOT NULL) AS has_duration,
       (content_type IS NOT NULL) AS has_content_type
FROM enriched
""")

ORACLE["cdc_edge_cases"] = q("""
SELECT event_id,
       id_str,
       coalesce(
         TRY_CAST(id_str AS BIGINT),
         abs(CAST(('0x' || substr(md5(id_str), 1, 15)) AS BIGINT))
       ) AS surrogate_key,
       epoch_us(CASE WHEN event_id % 23 = 0 THEN TIMESTAMP '2024-02-01 00:00:00'
                     ELSE date_trunc('second', CAST(ts AS TIMESTAMP)) END) AS event_ts_us,
       (event_id % 23 = 0) AS used_fallback
FROM (
  SELECT event_id, ts,
         CASE WHEN event_id % 10 = 0 THEN 'evt-' || CAST(event_id AS VARCHAR)
              ELSE CAST(event_id AS VARCHAR) END AS id_str
  FROM events
)
""")

# ---------------------------------------------------------------------------
# Relational breadth (SURVEY.md §7.2 milestone 4)
# ---------------------------------------------------------------------------

ORACLE["pricing_summary"] = q("""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
""")

ORACLE["star_join_revenue"] = q("""
SELECT r_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY 1, 2
""")

ORACLE["top_revenue_orders"] = q("""
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority, revenue
FROM (
  SELECT o_orderkey, o_orderdate, o_orderpriority,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate
  GROUP BY 1, 2, 3
)
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""")

ORACLE["semi_anti_join"] = q("""
SELECT c_custkey AS key, 'semi' AS op FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT p_partkey, 'anti' FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey
                    AND l_shipdate >= TIMESTAMP '2001-01-01')
""")

ORACLE["range_join"] = q("""
SELECT o_orderpriority,
       count(*) AS n_shipped_30d,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value_30d
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
           AND l_shipdate >= o_orderdate
           AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
GROUP BY 1
""")

ORACLE["asof_join"] = q("""
SELECT event_id, k AS user_id, asof_orderkey, asof_totalprice
FROM (
  SELECT *,
         last_value(o_orderkey IGNORE NULLS) OVER w AS asof_orderkey,
         last_value(o_totalprice IGNORE NULLS) OVER w AS asof_totalprice
  FROM (
    SELECT event_id, user_id AS k, CAST(ts AS TIMESTAMP) AS t, 1 AS is_event,
           CAST(NULL AS BIGINT) AS o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice
    FROM events
    UNION ALL
    SELECT CAST(NULL AS BIGINT), o_custkey % 15, o_orderdate, 0,
           o_orderkey, o_totalprice
    FROM orders
  )
  WINDOW w AS (PARTITION BY k
               ORDER BY t ASC, is_event ASC,
                        o_orderkey ASC NULLS FIRST, event_id ASC NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
) WHERE is_event = 1
""")

ORACLE["cube_order_stats"] = q("""
SELECT o_orderstatus, o_orderpriority,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       count(*) AS cnt
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")

ORACLE["distinct_stats"] = q("""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows,
       TRUE AS approx_parts_ok,
       TRUE AS approx_median_ok
FROM lineitem GROUP BY 1
""")

ORACLE["set_ops"] = q("""
SELECT c_custkey, 'union' AS op FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
  UNION
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
UNION ALL
SELECT c_custkey, 'intersect' FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
UNION ALL
SELECT c_custkey, 'except' FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
  EXCEPT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
""")

ORACLE["window_analytics"] = q("""
SELECT o_orderkey, o_custkey,
       row_number() OVER w AS order_seq,
       rank() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
       lag(o_orderkey, 1) OVER w AS prev_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""")

ORACLE["correlated_subquery"] = q("""
SELECT p_partkey, p_brand, p_retailprice, round(brand_avg, 6) AS brand_avg
FROM (
  SELECT p_partkey, p_brand, p_retailprice,
         CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) OVER (PARTITION BY p_brand) AS DOUBLE)
           / count(*) OVER (PARTITION BY p_brand) AS brand_avg
  FROM part
) WHERE p_retailprice > brand_avg
""")

# kept for tests/test_consolidated.py — the HAVING demo ceded its gate
# slot to funnel_levels but stays oracle-checked there.
HAVING_LARGE_ORDERS_SQL = q("""
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(total_qty_dec AS DOUBLE) AS total_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty_dec
  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
) ON o_orderkey = l_orderkey
""")

# windowFunnel analog (operators/behavioral.py): chain semantics
# restated with a DIFFERENT algorithm — k-way EXISTS joins instead of
# the Spark dp fold — so agreement cross-checks the semantics, not a
# shared implementation.  The builder is the single source for the
# gate entry AND tests/test_behavioral.py (no drifting copies).

FUNNEL_WINDOW_S = 86400


def funnel_exists_cte(window_us: int) -> str:
    """CTE chain ending in ``funnel_oracle(user_id, funnel_level)``
    for the view→click→purchase funnel at the given window, appendable
    to the shared PREFIX (starts with a comma)."""
    return f"""
, fe AS (
  SELECT user_id, event_type, epoch_us(event_ts) AS ts
  FROM engagement
  WHERE event_type IN ('view', 'click', 'purchase') AND event_ts IS NOT NULL
),
fl2 AS (
  SELECT DISTINCT a.user_id FROM fe a JOIN fe b ON a.user_id = b.user_id
  WHERE a.event_type = 'view' AND b.event_type = 'click'
    AND b.ts >= a.ts AND b.ts - a.ts <= {window_us}
),
fl3 AS (
  SELECT DISTINCT a.user_id
  FROM fe a JOIN fe b ON a.user_id = b.user_id
            JOIN fe c ON a.user_id = c.user_id
  WHERE a.event_type = 'view' AND b.event_type = 'click'
    AND c.event_type = 'purchase'
    AND b.ts >= a.ts AND c.ts >= b.ts AND c.ts - a.ts <= {window_us}
),
funnel_oracle AS (
  SELECT u.user_id,
         CASE WHEN u.user_id IN (SELECT user_id FROM fl3) THEN 3
              WHEN u.user_id IN (SELECT user_id FROM fl2) THEN 2
              WHEN u.user_id IN (SELECT user_id FROM fe
                                 WHERE event_type = 'view') THEN 1
              ELSE 0 END AS funnel_level
  FROM (SELECT DISTINCT user_id FROM fe) u
)
"""


ORACLE["funnel_levels"] = q(
    funnel_exists_cte(FUNNEL_WINDOW_S * 1_000_000)
    + "SELECT user_id, funnel_level FROM funnel_oracle"
)

ORACLE["scalar_funcs"] = q("""
SELECT event_id,
       upper(event_type) AS et_upper,
       substr(event_type, 1, 3) AS et_prefix,
       length(event_type) AS et_len,
       concat_ws('|', event_type, CAST(user_id AS VARCHAR)) AS et_user,
       (event_type LIKE '%i%') AS has_i,
       lpad(CAST(user_id AS VARCHAR), 6, '0') AS user_padded,
       reverse(event_type) AS et_rev,
       replace(event_type, 'e', '3') AS et_leet,
       regexp_extract(event_type, '^([a-z]+)', 1) AS et_word,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       CAST(year(t) AS INT) AS ev_year,
       CAST(month(t) AS INT) AS ev_mon,
       CAST(day(t) AS INT) AS ev_day,
       CAST(dayofweek(t) + 1 AS INT) AS ev_dow,  -- DuckDB dow is 0-based, Spark 1-based
       CAST(quarter(t) AS INT) AS ev_quarter,
       strftime(date_trunc('month', t), '%Y-%m-%d') AS month_start,
       strftime(last_day(CAST(t AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(date_diff('day', DATE '2024-01-01', CAST(t AS DATE)) AS INT) AS days_into_2024,
       CAST(floor("value") AS BIGINT) AS v_floor,
       CAST(ceil("value") AS BIGINT) AS v_ceil,
       abs("value" - 50) AS v_dev,
       round(sqrt(abs("value")), 6) AS v_sqrt,
       round(ln(abs("value") + 1), 6) AS v_ln,
       round(pow("value", 2), 2) AS v_sq,
       CAST(floor("value") AS BIGINT) % 7 AS v_mod,
       CASE WHEN "value" < 10 THEN 'tiny' WHEN "value" < 50 THEN 'small'
            WHEN "value" < 150 THEN 'medium' ELSE 'large' END AS v_bucket
FROM (SELECT *, CAST(ts AS TIMESTAMP) AS t FROM events)
""")

# ---------------------------------------------------------------------------
# North-star extensions (dedup / similarity / text / multimodal)
# ---------------------------------------------------------------------------

ORACLE["dedup_exact"] = q("""
SELECT text_md5, count(*) AS n_dups, min(doc_id) AS keeper
FROM (SELECT doc_id, md5(norm) AS text_md5 FROM doc_norm_dup)
GROUP BY 1 HAVING count(*) > 1
""")

ORACLE["dedup_ngram_jaccard"] = q("""
SELECT doc_a, doc_b, n_common,
       round(CAST(n_common AS DOUBLE)
             / CAST(n_a + n_b - n_common AS DOUBLE), 4) AS jaccard
FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shingle_kept_dup a
  JOIN shingle_kept_dup b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
JOIN (SELECT doc_id, count(*) AS n_a FROM shingle_kept_dup GROUP BY 1) sa ON sa.doc_id = doc_a
JOIN (SELECT doc_id, count(*) AS n_b FROM shingle_kept_dup GROUP BY 1) sb ON sb.doc_id = doc_b
WHERE round(CAST(n_common AS DOUBLE)
            / CAST(n_a + n_b - n_common AS DOUBLE), 4) >= 0.5
""")

_K, _BAND = 16, 4
# one md5 base mod p, then k affine permutations — constants from
# functions.scalar.minhash_perm_consts (single-sourced family)
from .functions.scalar import MINHASH_P as _MHP
from .functions.scalar import minhash_perm_consts as _mh_ab

_mh_base = f"({_h('shingle', 'mh:')} % {_MHP})"
_mh_ab0a = _mh_ab(0)[0]  # b_0 = 0, so mh_0 = (a_0 * base) % p
_mh_cols = ",\n         ".join(
    "min(({a} * {base} + {b}) % {p}) AS mh_{i}".format(
        a=_mh_ab(i)[0], b=_mh_ab(i)[1], base=_mh_base, p=_MHP, i=i
    )
    for i in range(_K)
)
_band_selects = "\n  UNION ALL\n".join(
    "  SELECT doc_id, {b} AS band_id, concat_ws('_', {ks}) AS band_key FROM sig".format(
        b=b, ks=", ".join(f"mh_{b * _BAND + j}" for j in range(_BAND))
    )
    for b in range(_K // _BAND)
)
ORACLE["dedup_minhash_lsh"] = q(f"""
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM (
  WITH sig AS (
    SELECT doc_id,
         {_mh_cols}
    FROM shingle_x_dup GROUP BY doc_id
  )
{_band_selects}
) a
JOIN (
  WITH sig AS (
    SELECT doc_id,
         {_mh_cols}
    FROM shingle_x_dup GROUP BY doc_id
  )
{_band_selects}
) b ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
""")


def _simhash_sql(tok_cte: str, bits: int = 60) -> str:
    bit_sums = ",\n           ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN b{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(bits))
    return f"""
  SELECT doc_id, CAST({fp} AS BIGINT) AS simhash
  FROM (
    SELECT doc_id,
           {bit_sums}
    FROM (
      SELECT doc_id, {_h('t', 'simhash:')} AS h
      FROM (SELECT doc_id, unnest(list_distinct(toks)) AS t FROM {tok_cte})
      WHERE t <> ''
    ) GROUP BY doc_id
  )"""


ORACLE["simhash_pairs"] = q(f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash
FROM ({_simhash_sql("doc_toks_dup")}) a
JOIN ({_simhash_sql("doc_toks_dup")}) b
  ON a.simhash = b.simhash AND a.doc_id < b.doc_id
""")

ORACLE["embedding_near_dup"] = q(f"""
SELECT vec_a, vec_b, cos_sim FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_cosine("a.embedding", "b.embedding")}, 4) AS cos_sim
  FROM (SELECT vec_id, embedding, {_sign_bucket("embedding", 8)} AS bucket FROM embeddings_dup) a
  JOIN (SELECT vec_id, embedding, {_sign_bucket("embedding", 8)} AS bucket FROM embeddings_dup) b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) WHERE cos_sim >= 0.9
""")

# rank on 6dp, output a SINGLE round of the raw cosine to 4dp: a second
# round of an already-rounded value ties exactly at x.xxxx50
ORACLE["ann_bruteforce_topk"] = q(f"""
SELECT query_id, neighbor_id, rnk, cos4 AS cos_sim
FROM (
  SELECT query_id, neighbor_id, cos4,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos6 DESC, neighbor_id) AS rnk
  FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           round({_cosine("q.embedding", "e.embedding")}, 6) AS cos6,
           round({_cosine("q.embedding", "e.embedding")}, 4) AS cos4
    FROM embeddings e
    CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 100 = 0) q
    WHERE e.vec_id <> q.vec_id
  )
) WHERE rnk <= 5
""")

ORACLE["ann_ivf_topk"] = q(f"""
SELECT query_id, neighbor_id, rnk, cos4 AS cos_sim
FROM (
  SELECT query_id, neighbor_id, cos4,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos6 DESC, neighbor_id) AS rnk
  FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           round({_cosine("q.embedding", "e.embedding")}, 6) AS cos6,
           round({_cosine("q.embedding", "e.embedding")}, 4) AS cos4
    FROM (SELECT vec_id, embedding, {_sign_bucket("embedding", 6)} AS bucket FROM embeddings) e
    JOIN (SELECT vec_id, embedding, {_sign_bucket("embedding", 6)} AS bucket
          FROM embeddings WHERE vec_id % 100 = 0) q
      ON e.bucket = q.bucket AND e.vec_id <> q.vec_id
  )
) WHERE rnk <= 5
""")

# Lexical + hybrid retrieval (operators/retrieval.py): the shared
# tokenizer CTE (doc_toks), the BM25 weighting with scores rounded to
# 4dp before the deterministic (score DESC, doc_id) rank, and RRF
# fusion re-ranking both lists by their rounded scores.
_BM25_CTES = """
bdl AS (SELECT doc_id, len(toks) AS dl FROM doc_toks),
  bstats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM bdl),
  btf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM (SELECT doc_id, unnest(toks) AS term FROM doc_toks)
    WHERE term IN ('spark', 'vector', 'window')
    GROUP BY doc_id, term
  ),
  bdf AS (SELECT term, count(*) AS df FROM btf GROUP BY term),
  bscore AS (
    SELECT doc_id, round(sum(
             ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             * tf * (1.2 + 1.0)
             / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
           ), 4) AS bm25
    FROM btf JOIN bdf USING(term) JOIN bdl USING(doc_id) CROSS JOIN bstats
    GROUP BY doc_id
  )
"""

ORACLE["bm25_topk"] = q(f"""
, {_BM25_CTES}
SELECT doc_id, bm25 FROM bscore
ORDER BY bm25 DESC, doc_id
LIMIT 25
""")

# Stored-artifact serving path (operators/retrieval.py
# bm25_topk_from_index): build_text_index → query off the postings must
# equal the from-scratch BM25 — same twin SQL, so the gate hash proves
# the index round-trip loses nothing.
ORACLE["bm25_from_index"] = q(f"""
, {_BM25_CTES}
SELECT doc_id, bm25 FROM bscore
ORDER BY bm25 DESC, doc_id
LIMIT 25
""")

# N-gram LM perplexity gate (operators/lm_filter.py): add-α bigram LM
# trained on the doc_id % 3 = 0 reference split, scoring the whole
# corpus.  Surfaces round(-avg logp, 6) = ln(ppl) — monotone in ppl;
# exp() would amplify last-bit summation differences at high
# perplexities past any fixed rounding.  BOS padding ('^', outside the
# tokenizer alphabet) mirrors lm_filter.BOS.
ORACLE["lm_perplexity"] = q("""
, lm_seq AS (
    SELECT doc_id, ['^'] || list_filter(toks, t -> t <> '') AS seq
    FROM doc_toks
  ),
  lm_split AS (
    SELECT doc_id,
           split_part(gram, ' ', 1) AS w1,
           split_part(gram, ' ', 2) AS w2
    FROM (
      SELECT doc_id,
             unnest(CASE WHEN len(seq) >= 2
                         THEN [seq[i] || ' ' || seq[i+1]
                               for i in generate_series(1, len(seq) - 1)]
                         ELSE CAST([] AS VARCHAR[]) END) AS gram
      FROM lm_seq
    )
  ),
  lm_bi AS (
    SELECT w1, w2, count(*) AS c FROM lm_split WHERE doc_id % 3 = 0
    GROUP BY 1, 2
  ),
  lm_ctx AS (SELECT w1, sum(c) AS c1 FROM lm_bi GROUP BY 1),
  lm_v AS (SELECT count(DISTINCT w2) + 1 AS v FROM lm_bi),
  lm_doc AS (
    SELECT g.doc_id, count(*) AS n_bigrams,
           round(-avg(ln((coalesce(b.c, 0) + 0.1)
                         / (coalesce(x.c1, 0) + 0.1 * v.v))), 6) AS log_ppl
    FROM lm_split g
    LEFT JOIN lm_bi b USING (w1, w2)
    LEFT JOIN lm_ctx x USING (w1)
    CROSS JOIN lm_v v
    GROUP BY 1
  )
SELECT d.doc_id, coalesce(l.n_bigrams, 0) AS n_bigrams, l.log_ppl
FROM documents d LEFT JOIN lm_doc l USING (doc_id)
""")

ORACLE["hybrid_rrf"] = q(f"""
, {_BM25_CTES},
  hlex AS (SELECT doc_id, bm25 FROM bscore ORDER BY bm25 DESC, doc_id LIMIT 10),
  hsem AS (
    SELECT doc_id, cos4 AS cos_sim
    FROM (
      SELECT e.vec_id AS doc_id,
             round({_cosine("q0.embedding", "e.embedding")}, 6) AS cos6,
             round({_cosine("q0.embedding", "e.embedding")}, 4) AS cos4,
             row_number() OVER (
               ORDER BY round({_cosine("q0.embedding", "e.embedding")}, 6) DESC,
                        e.vec_id) AS rnk
      FROM embeddings e
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q0
      WHERE e.vec_id <> 0
    ) WHERE rnk <= 10
  ),
  lr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM hlex),
  sr AS (SELECT doc_id, row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS r FROM hsem)
SELECT doc_id, round(sum(1.0 / (60 + r)), 6) AS rrf
FROM (SELECT * FROM lr UNION ALL SELECT * FROM sr)
GROUP BY doc_id
ORDER BY rrf DESC, doc_id
LIMIT 20
""")

_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "de", "los"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}
_marker_counts = ",\n       ".join(
    "CAST(len(list_filter(toks, x -> list_contains({lst}, x))) AS INT) AS c_{lang}".format(
        lst="[" + ", ".join(f"'{m}'" for m in ms) + "]", lang=lang
    )
    for lang, ms in _MARKERS.items()
)
_STOPWORDS = "['the', 'a', 'of', 'to', 'and', 'in', 'is', 'it', 'that', 'for']"
ORACLE["text_analysis"] = q(f"""
SELECT t.doc_id, t.lang,
       CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es AND c_en >= c_zh THEN 'en'
            WHEN c_de >= c_fr AND c_de >= c_es AND c_de >= c_zh THEN 'de'
            WHEN c_fr >= c_es AND c_fr >= c_zh THEN 'fr'
            WHEN c_es >= c_zh THEN 'es'
            ELSE 'zh' END AS guessed_lang,
       n_tokens, total_chars, stopword_ratio, punct_ratio, len_ok,
       bpe_ish_tokens, text_md5, s.min_shingle_hash, f.simhash
FROM (
  SELECT doc_id, lang,
       {_marker_counts},
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(list_sum(list_transform(toks, x -> length(x))) AS INT) AS total_chars,
       CASE WHEN len(toks) > 0 THEN
         round(CAST(len(list_filter(toks, x -> list_contains({_STOPWORDS}, x))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE), 6) END AS stopword_ratio,
       CASE WHEN length(text) > 0 THEN
         round(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE), 6) END AS punct_ratio,
       (len(toks) BETWEEN 5 AND 1000) AS len_ok,
       CAST(len(regexp_extract_all(lower(text),
            '[a-z]{{1,4}}|[0-9]{{1,3}}|[^a-z0-9\\s]')) AS INT) AS bpe_ish_tokens,
       md5(norm) AS text_md5
  FROM doc_toks
) t
LEFT JOIN (
  SELECT doc_id, min(({_mh_ab0a} * ({_h('shingle', 'mh:')} % {_MHP})) % {_MHP}) AS min_shingle_hash
  FROM shingle_x GROUP BY doc_id
) s ON t.doc_id = s.doc_id
LEFT JOIN ({_simhash_sql("doc_toks")}) f ON t.doc_id = f.doc_id
""")

ORACLE["multimodal_features"] = q("""
SELECT doc_id AS asset_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS payload_md5
FROM documents
""")

ORACLE["multimodal_meta_stats"] = q("""
SELECT modality, count(*) AS n_assets,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(sum(CASE WHEN doc_id % 3 = 0
                THEN ((doc_id % 16 + 1) * 64) * ((doc_id % 9 + 1) * 64)
                ELSE 0 END) AS BIGINT) AS total_pixels
FROM (
  SELECT doc_id, text,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality
  FROM documents
) GROUP BY 1
""")

# ---------------------------------------------------------------------------
# Coverage wave 3: A3 re-merge, P11 fallback, sessionize, unpivot,
# grouping sets, training-data prep
# ---------------------------------------------------------------------------

ORACLE["rollup_incremental_merge"] = q("""
SELECT epoch_us(hour_ts) AS hour_ts_us, content_type, event_type,
       CAST(sum(cnt) AS BIGINT) AS cnt,
       CAST(sum(score_dec) AS DOUBLE) AS total_score
FROM (
  SELECT date_trunc('hour', event_ts) AS hour_ts, content_type, event_type,
         count(*) AS cnt, sum(CAST(engagement_score AS DECIMAL(18,2))) AS score_dec
  FROM enriched WHERE event_id % 2 = 0 GROUP BY 1, 2, 3
  UNION ALL
  SELECT date_trunc('hour', event_ts), content_type, event_type,
         count(*), sum(CAST(engagement_score AS DECIMAL(18,2)))
  FROM enriched WHERE event_id % 2 = 1 GROUP BY 1, 2, 3
) GROUP BY 1, 2, 3
""")

ORACLE["sessionize"] = q("""
SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
       CAST(sum(is_new) OVER (
         PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN prev_us IS NULL
                OR epoch_us(CAST(ts AS TIMESTAMP)) - prev_us > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM (
    SELECT event_id, user_id, ts,
           lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
    FROM events
  )
)
""")

ORACLE["unpivot_event_counts"] = q("""
SELECT u.user_id, t.event_type, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
FROM (SELECT DISTINCT user_id FROM events) u
CROSS JOIN (SELECT unnest(['view','click','signup','purchase','error']) AS event_type) t
LEFT JOIN (SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2) c
  ON c.user_id = u.user_id AND c.event_type = t.event_type
""")

ORACLE["grouping_analytics"] = q("""
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INT) AS g_flag,
       CAST(grouping(l_linestatus) AS INT) AS g_status,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       count(*) AS cnt
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag), (l_linestatus), ())
""")

ORACLE["training_data_prep"] = q("""
SELECT doc_id, lang, n_tokens, text_md5 FROM (
  SELECT *, row_number() OVER (PARTITION BY text_md5 ORDER BY doc_id) AS _rn
  FROM (
    SELECT doc_id, lang,
           CAST(len(string_split(norm, ' ')) AS INT) AS n_tokens,
           CASE WHEN length(text) > 0 THEN
             round(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE), 6) END AS p_ratio,
           md5(norm) AS text_md5
    FROM doc_norm_dup
  ) WHERE n_tokens BETWEEN 10 AND 1000 AND p_ratio < 0.35
) WHERE _rn = 1
""")

# ---------------------------------------------------------------------------
# Coverage wave 4: quantiles, conditional/array aggs, salting, streaming replay
# ---------------------------------------------------------------------------

ORACLE["quantile_conditional_aggs"] = q("""
SELECT l_returnflag, l_linestatus,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
       count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
            FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_rev,
       bool_or(l_tax > 0.07) AS any_high_tax,
       count(*) AS cnt
FROM lineitem GROUP BY 1, 2
""")

ORACLE["array_agg_event_types"] = q("""
SELECT user_id,
       CAST(len(list_sort(list(DISTINCT event_type))) AS INT) AS n_types,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv
FROM events GROUP BY 1
""")

ORACLE["salted_rollup"] = q("""
SELECT event_type, count(*) AS cnt,
       CAST(sum(CAST(engagement_score AS DECIMAL(18,2))) AS DOUBLE) AS total_score
FROM enriched GROUP BY 1
""")

# streaming replay must converge to exactly the batch rollup
ORACLE["streaming_replay_rollup"] = ORACLE["hourly_rollup"]

ORACLE["trending_recent"] = q("""
SELECT minute_bucket, content_id, total_score, rnk FROM (
  SELECT minute_bucket, content_id, total_score,
         row_number() OVER (PARTITION BY minute_bucket
                            ORDER BY total_score DESC, content_id) AS rnk
  FROM (
    SELECT strftime(event_ts, '%Y%m%d%H%M') AS minute_bucket, content_id,
           CAST(sum(CAST(engagement_score AS DECIMAL(18,2))) AS DOUBLE) AS total_score
    FROM enriched GROUP BY 1, 2
  )
  -- bucket-granularity retention: trailing 15 minute-buckets anchored
  -- at the latest bucket (operators/rollups.trending_recent twin)
  WHERE strptime(minute_bucket, '%Y%m%d%H%M')
        >= (SELECT strptime(max(strftime(event_ts, '%Y%m%d%H%M')), '%Y%m%d%H%M')
            FROM enriched) - INTERVAL 15 MINUTE
) WHERE rnk <= 5
""")

# int8-quantized ANN: similarity is an exact integer dot of quantized,
# L2-normalized vectors — no float comparison anywhere
_QV = (
    "list_transform(CAST({v} AS DOUBLE[]), x -> CAST(round(x / "
    "sqrt(list_dot_product(CAST({v} AS DOUBLE[]), CAST({v} AS DOUBLE[]))) * 127) AS BIGINT))"
)
ORACLE["ann_quantized_topk"] = q(f"""
SELECT query_id, neighbor_id, rnk, int_dot
FROM (
  SELECT query_id, neighbor_id, int_dot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY int_dot DESC, neighbor_id) AS rnk
  FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           CAST(list_dot_product({_QV.format(v='q.embedding')},
                                 {_QV.format(v='e.embedding')}) AS BIGINT) AS int_dot
    FROM embeddings e
    CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 100 = 0) q
    WHERE e.vec_id <> q.vec_id
  )
) WHERE rnk <= 5
""")

ORACLE["tfidf_top_terms"] = q("""
SELECT doc_id, term, tfidf, rnk FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rnk
  FROM (
    SELECT tf.doc_id, tf.term,
           round((CAST(tf.cnt AS DOUBLE) / CAST(dl.dl AS DOUBLE))
                 * ln(CAST(nd.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS tfidf
    FROM (
      SELECT doc_id, t AS term, count(*) AS cnt
      FROM (SELECT doc_id, unnest(toks) AS t FROM doc_toks) WHERE t <> ''
      GROUP BY 1, 2
    ) tf
    JOIN (
      SELECT doc_id, count(*) AS dl
      FROM (SELECT doc_id, unnest(toks) AS t FROM doc_toks) WHERE t <> ''
      GROUP BY 1
    ) dl ON tf.doc_id = dl.doc_id
    JOIN (
      SELECT term, count(*) AS df FROM (
        SELECT doc_id, t AS term, count(*) AS cnt
        FROM (SELECT doc_id, unnest(toks) AS t FROM doc_toks) WHERE t <> ''
        GROUP BY 1, 2
      ) GROUP BY 1
    ) df ON tf.term = df.term
    CROSS JOIN (SELECT count(*) AS n_docs FROM documents) nd
  )
) WHERE rnk <= 3
""")

# MinHash→LSH→Jaccard-verify→drop: the fuzzy training-set dedup flow
ORACLE["fuzzy_dedup_keep"] = q(f"""
SELECT d.doc_id, d.lang, d.source
FROM documents_dup d
WHERE d.doc_id NOT IN (
  SELECT DISTINCT cm.doc_b FROM (
    SELECT c.doc_a, c.doc_b, count(*) AS n_common
    FROM (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM (
        WITH sig AS (
          SELECT doc_id,
               {_mh_cols}
          FROM shingle_x_dup GROUP BY doc_id
        )
      {_band_selects}
      ) a
      JOIN (
        WITH sig AS (
          SELECT doc_id,
               {_mh_cols}
          FROM shingle_x_dup GROUP BY doc_id
        )
      {_band_selects}
      ) b ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ) c
    JOIN shingle_x_dup ea ON ea.doc_id = c.doc_a
    JOIN shingle_x_dup eb ON eb.doc_id = c.doc_b AND eb.shingle = ea.shingle
    GROUP BY 1, 2
  ) cm
  JOIN (SELECT doc_id, count(*) AS n FROM shingle_x_dup GROUP BY 1) sa ON sa.doc_id = cm.doc_a
  JOIN (SELECT doc_id, count(*) AS n FROM shingle_x_dup GROUP BY 1) sb ON sb.doc_id = cm.doc_b
  WHERE CAST(cm.n_common AS DOUBLE)
        / CAST(sa.n + sb.n - cm.n_common AS DOUBLE) >= 0.5
)
""")

# corpus vocabulary: global top-k word bigrams by frequency
ORACLE["vocab_top_bigrams"] = q("""
SELECT bigram, cnt FROM (
  SELECT bigram, count(*) AS cnt FROM (
    SELECT unnest(
      CASE WHEN len(toks) >= 2
           THEN [array_to_string(toks[i:i+1], ' ') for i in generate_series(1, len(toks)-1)]
           ELSE CAST([] AS VARCHAR[]) END) AS bigram
    FROM doc_toks
  ) WHERE bigram <> '' GROUP BY 1
) ORDER BY cnt DESC, bigram ASC LIMIT 20
""")

# deterministic content-hash train/val/test split
ORACLE["hash_split"] = q("""
SELECT doc_id, lang, bucket,
       CASE WHEN bucket < 5 THEN 'test'
            WHEN bucket < 10 THEN 'val'
            ELSE 'train' END AS split
FROM (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5('split:' || norm), 1, 15)) AS BIGINT) % 100 AS bucket
  FROM doc_norm
)
""")

# ---------------------------------------------------------------------------
# Coverage wave 5 (round 2): duplicate clustering, deterministic
# sampling, sequence packing.  The non-SQL-native parts (transitive
# closure, the sequential packing fold) are expressed as recursive
# CTEs — scoped inside a derived table so the shared PREFIX stays
# non-recursive.
# ---------------------------------------------------------------------------

# connected components over the MinHash-LSH candidate graph: reach is
# the label-propagation closure (reach(n, l) iff n and l share a
# component), min per node = component id.
ORACLE["dedup_clusters"] = q(f"""
SELECT doc_id, cluster_id, cluster_size FROM (
  WITH RECURSIVE sig AS (
    SELECT doc_id,
         {_mh_cols}
    FROM shingle_x_dup GROUP BY doc_id
  ),
  bands AS (
{_band_selects}
  ),
  und AS (
    SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id <> b.doc_id
  ),
  reach AS (
    SELECT src AS doc_id, src AS label FROM und
    UNION
    SELECT u.dst AS doc_id, r.label FROM reach r JOIN und u ON u.src = r.doc_id
  ),
  comp AS (SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id),
  csize AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1)
  SELECT comp.doc_id, comp.cluster_id, csize.cluster_size
  FROM comp JOIN csize USING (cluster_id)
)
""")

# stratified hash-Bernoulli sampling (operators/corpus.py twin)
ORACLE["deterministic_sample"] = q(f"""
SELECT doc_id, lang, n_tokens, u FROM (
  SELECT doc_id, lang,
         CAST(len(string_split(norm, ' ')) AS INT) AS n_tokens,
         {_h("norm", "sample:")} % 10000 AS u
  FROM doc_norm
) WHERE n_tokens >= 5
  AND u < CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 2500 ELSE 10000 END
""")

# greedy sequence packing: the same fold operators/corpus.py runs in
# applyInPandas, expressed as a per-shard recursive CTE over rn order.
ORACLE["pack_sequences"] = q("""
SELECT doc_id, shard, n_tokens, pack_id, off_tokens FROM (
  WITH RECURSIVE base AS (
    SELECT doc_id, CAST(doc_id % 32 AS INT) AS shard,
           CAST(len(string_split(norm, ' ')) AS INT) AS n_tokens,
           CAST(row_number() OVER (PARTITION BY doc_id % 32 ORDER BY doc_id) AS INT) AS rn
    FROM doc_norm
  ),
  packed AS (
    SELECT shard, rn, doc_id, n_tokens,
           CAST(0 AS INT) AS pack_id, CAST(0 AS INT) AS off_tokens, n_tokens AS fill
    FROM base WHERE rn = 1
    UNION ALL
    SELECT b.shard, b.rn, b.doc_id, b.n_tokens,
           CAST(CASE WHEN p.fill > 0 AND p.fill + b.n_tokens > 512
                     THEN p.pack_id + 1 ELSE p.pack_id END AS INT),
           CAST(CASE WHEN p.fill > 0 AND p.fill + b.n_tokens > 512
                     THEN 0 ELSE p.fill END AS INT),
           CASE WHEN p.fill > 0 AND p.fill + b.n_tokens > 512
                THEN b.n_tokens ELSE p.fill + b.n_tokens END
    FROM packed p JOIN base b ON b.shard = p.shard AND b.rn = p.rn + 1
  )
  SELECT doc_id, shard, n_tokens, pack_id, off_tokens FROM packed
)
""")

# ---------------------------------------------------------------------------
# Coverage wave 6 (round 2): Gopher-style quality signals + PII
# redaction (operators/quality.py twins).
# ---------------------------------------------------------------------------

def _quality_ppm_sql(tok_cte: str) -> str:
    """quality_signals_ppm twin over any CTE exposing
    (doc_id, lang, toks) — shared by the standalone gate entry and the
    composed corpus_prep twin."""
    return f"""
SELECT m.doc_id, m.lang, m.n_tokens, m.distinct_ppm, m.top_token_ppm,
       m.dup_bigram_ppm, m.mean_word_len_micro,
       (m.n_tokens >= 20
        AND m.distinct_ppm >= 400000
        AND m.top_token_ppm <= 120000
        AND coalesce(m.dup_bigram_ppm, 0) <= 60000
        AND m.mean_word_len_micro BETWEEN 3000000 AND 10000000) AS quality_ok
FROM (
  SELECT b.doc_id, b.lang,
         CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         CAST((a.n_distinct * 1000000) // a.n_tokens AS BIGINT) AS distinct_ppm,
         CAST((a.max_cnt * 1000000) // a.n_tokens AS BIGINT) AS top_token_ppm,
         CASE WHEN len(b.bg) > 0
              THEN CAST(((len(b.bg) - len(list_distinct(b.bg))) * 1000000)
                        // len(b.bg) AS BIGINT) END AS dup_bigram_ppm,
         CAST((a.tok_chars * 1000000) // a.n_tokens AS BIGINT) AS mean_word_len_micro
  FROM (
    SELECT doc_id, lang,
      CASE WHEN len(toks) >= 2
           THEN [array_to_string(toks[i:i+1], ' ') for i in generate_series(1, len(toks)-1)]
           ELSE CAST([] AS VARCHAR[]) END AS bg
    FROM {tok_cte}
  ) b
  LEFT JOIN (
    SELECT doc_id, sum(cnt) AS n_tokens, count(*) AS n_distinct,
           max(cnt) AS max_cnt, sum(cnt * len(term)) AS tok_chars
    FROM (
      SELECT doc_id, t AS term, count(*) AS cnt
      FROM (SELECT doc_id, unnest(toks) AS t FROM {tok_cte}) WHERE t <> ''
      GROUP BY 1, 2
    ) GROUP BY 1
  ) a ON a.doc_id = b.doc_id
) m"""


ORACLE["quality_signals"] = q(_quality_ppm_sql("doc_toks"))

# The composed corpus-prep flow (corpus.prepare_training_corpus twin):
# quality gate → fuzzy MinHash-LSH dedup among the survivors → PII
# redaction digest → content-hash split — each stage the same SQL as
# its standalone twin, composed over documents_dup.  Fuzzy dedup's
# signatures and pairwise Jaccard are per-doc/per-pair quantities, so
# running the machinery on the full corpus and requiring BOTH pair
# endpoints quality-gated equals running it on the gated subset.
ORACLE["corpus_prep"] = q(f"""
SELECT doc_id, lang, split, n_tokens, redacted_md5 FROM (
  WITH dtl AS (
    SELECT doc_id, lang, string_split(norm, ' ') AS toks FROM doc_norm_dup
  ),
  qual AS ({_quality_ppm_sql("dtl")}),
  gated AS (SELECT doc_id, lang, n_tokens FROM qual WHERE quality_ok),
  gsh AS (
    SELECT s.doc_id, s.shingle FROM shingle_x_dup s
    JOIN gated g ON g.doc_id = s.doc_id
  ),
  sig AS (
    SELECT doc_id,
         {_mh_cols}
    FROM gsh GROUP BY doc_id
  ),
  bands AS (
  {_band_selects}
  ),
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
  ),
  jac AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_common
    FROM cand c
    JOIN gsh ea ON ea.doc_id = c.doc_a
    JOIN gsh eb ON eb.doc_id = c.doc_b AND eb.shingle = ea.shingle
    GROUP BY 1, 2
  ),
  sizes AS (SELECT doc_id, count(*) AS n FROM gsh GROUP BY 1),
  drops AS (
    SELECT DISTINCT j.doc_b FROM jac j
    JOIN sizes sa ON sa.doc_id = j.doc_a
    JOIN sizes sb ON sb.doc_id = j.doc_b
    WHERE CAST(j.n_common AS DOUBLE)
          / CAST(sa.n + sb.n - j.n_common AS DOUBLE) >= 0.5
  ),
  red AS (
    SELECT doc_id,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}', '<EMAIL>', 'g'),
                   '\\b555-[0-9]{{4}}\\b', '<PHONE>', 'g'),
                 '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b', '<IP>', 'g')) AS redacted_md5
    FROM documents_dup
  ),
  sp AS (
    SELECT doc_id,
           CASE WHEN bucket < 5 THEN 'test'
                WHEN bucket < 10 THEN 'val'
                ELSE 'train' END AS split
    FROM (
      SELECT doc_id,
             CAST(('0x' || substr(md5('split:' || norm), 1, 15)) AS BIGINT) % 100 AS bucket
      FROM doc_norm_dup
    )
  )
  SELECT g.doc_id, g.lang, sp.split, g.n_tokens, red.redacted_md5
  FROM gated g
  JOIN red ON red.doc_id = g.doc_id
  JOIN sp ON sp.doc_id = g.doc_id
  WHERE g.doc_id NOT IN (SELECT doc_b FROM drops)
)
""")

ORACLE["pii_redact"] = q("""
SELECT doc_id,
       CAST(len(regexp_extract_all(text2, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text2, '\\b555-[0-9]{4}\\b')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(text2, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS INT) AS n_ips,
       (len(regexp_extract_all(text2, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}'))
        + len(regexp_extract_all(text2, '\\b555-[0-9]{4}\\b'))
        + len(regexp_extract_all(text2, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))) > 0 AS has_pii,
       md5(regexp_replace(
             regexp_replace(
               regexp_replace(text2, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
               '\\b555-[0-9]{4}\\b', '<PHONE>', 'g'),
             '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g')) AS redacted_md5
FROM (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 4 = 1
                 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
         || CASE WHEN doc_id % 5 = 2
                 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 13) % 256 AS VARCHAR) ELSE '' END AS text2
  FROM documents
)
""")

# hourly gap filling (rollups.fill_hourly_gaps twin) — dense hour spine
# per group, zero rows where no events landed, null-safe group join
ORACLE["rollup_gap_fill"] = q("""
SELECT epoch_us(s.hour_ts) AS hour_ts_us, s.content_type, s.event_type,
       coalesce(r.cnt, 0) AS cnt,
       coalesce(r.total_score, 0.0) AS total_score,
       r.cnt IS NULL AS is_gap
FROM (
  SELECT content_type, event_type,
         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
  FROM (
    SELECT content_type, event_type,
           min(date_trunc('hour', event_ts)) AS h0,
           max(date_trunc('hour', event_ts)) AS h1
    FROM enriched GROUP BY 1, 2
  )
) s
LEFT JOIN (
  SELECT date_trunc('hour', event_ts) AS hour_ts, content_type, event_type,
         count(*) AS cnt,
         CAST(sum(CAST(engagement_score AS DECIMAL(18,2))) AS DOUBLE) AS total_score
  FROM enriched GROUP BY 1, 2, 3
) r ON s.content_type IS NOT DISTINCT FROM r.content_type
   AND s.event_type IS NOT DISTINCT FROM r.event_type
   AND s.hour_ts = r.hour_ts
""")

# window frame variants (relational.window_frame_analytics twin)
ORACLE["window_frames"] = q("""
SELECT o_orderkey, o_custkey,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / count(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3,
       lead(o_orderkey, 1) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS next_orderkey,
       first_value(o_orderkey) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS first_orderkey,
       ntile(4) OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_quartile,
       round(percent_rank() OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey), 6) AS price_pct_rank
FROM orders
""")

# per-label vector centroid rollup (similarity.label_centroids twin);
# centroid surfaced as a csv of 6dp means so the row canonicalizes
ORACLE["label_centroids"] = q("""
SELECT s.label, s.n_vecs, s.mean_norm,
       array_to_string(c.centroid, ',') AS centroid_um_csv
FROM (
  SELECT label, count(*) AS n_vecs,
         round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[])))), 6) AS mean_norm
  FROM embeddings GROUP BY 1
) s
JOIN (
  SELECT label,
         list(CAST(CAST(round(m * 1000000, 0) AS BIGINT) AS VARCHAR) ORDER BY dim)
           AS centroid
  FROM (
    SELECT label, CAST(i AS INT) - 1 AS dim, avg(x) AS m
    FROM (
      -- parallel unnests zip: (value, 1-based position)
      SELECT label, unnest(embedding) AS x,
             unnest(generate_series(1, len(embedding))) AS i
      FROM embeddings
    ) GROUP BY 1, 2
  ) GROUP BY 1
) c ON s.label = c.label
""")

# per-doc mean unigram -log p (quality.unigram_logprob_score twin)
ORACLE["unigram_logprob"] = q("""
SELECT t.doc_id,
       count(*) AS n_tokens,
       round(avg(-ln(CAST(f.tf AS DOUBLE) / CAST(n.n_total AS DOUBLE))), 6)
         AS mean_neg_logp
FROM (
  SELECT doc_id, t AS term
  FROM (SELECT doc_id, unnest(toks) AS t FROM doc_toks) WHERE t <> ''
) t
JOIN (
  SELECT term, count(*) AS tf FROM (
    SELECT t AS term
    FROM (SELECT doc_id, unnest(toks) AS t FROM doc_toks) WHERE t <> ''
  ) GROUP BY 1
) f ON t.term = f.term
CROSS JOIN (
  SELECT count(*) AS n_total FROM (
    SELECT t FROM (SELECT doc_id, unnest(toks) AS t FROM doc_toks) WHERE t <> ''
  )
) n
GROUP BY 1
""")

# per-doc mean interpolated-bigram -log p
# (quality.bigram_logprob_score twin; λ = 0.7, and the unigram weight
# is spelled (1.0 - 0.7) so both engines produce the identical IEEE
# double)
ORACLE["bigram_logprob"] = q("""
, uq AS (
  SELECT doc_id, t AS term
  FROM (SELECT doc_id, unnest(toks) AS t FROM doc_toks) WHERE t <> ''
),
uqc AS (SELECT term, count(*) AS c1 FROM uq GROUP BY 1),
uqn AS (SELECT count(*) AS n_total FROM uq),
tkf AS (SELECT doc_id, list_filter(toks, x -> x <> '') AS tk FROM doc_toks),
bgp AS (
  SELECT doc_id,
         unnest(CASE WHEN len(tk) >= 2
                THEN [{'w1': tk[i], 'w2': tk[i+1]} for i in generate_series(1, len(tk)-1)]
                ELSE [] END) AS pr
  FROM tkf
),
bg AS (SELECT doc_id, pr.w1 AS w1, pr.w2 AS w2 FROM bgp),
bc AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2)
SELECT bg.doc_id,
       count(*) AS n_bigrams,
       round(avg(-ln(
         0.7 * CAST(cb AS DOUBLE) / CAST(u1.c1 AS DOUBLE)
         + (1.0 - 0.7) * CAST(u2.c1 AS DOUBLE) / CAST(n_total AS DOUBLE)
       )), 6) AS mean_neg_logp2
FROM bg
JOIN bc USING (w1, w2)
JOIN uqc u1 ON bg.w1 = u1.term
JOIN uqc u2 ON bg.w2 = u2.term
CROSS JOIN uqn
GROUP BY 1
""")

# hamming<=3 SimHash pairs via 4×15-bit banded search
# (dedup.simhash_near_pairs twin: agree on ≥1 band → candidate, verify
# true hamming with bit_count)
ORACLE["simhash_near_pairs"] = q(f"""
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM (
  SELECT doc_id, simhash, band_id, (simhash >> (band_id * 15)) & 32767 AS band_val
  FROM ({_simhash_sql("doc_toks_dup")}),
       (SELECT unnest(generate_series(0, 3)) AS band_id)
) a
JOIN (
  SELECT doc_id, simhash, band_id, (simhash >> (band_id * 15)) & 32767 AS band_val
  FROM ({_simhash_sql("doc_toks_dup")}),
       (SELECT unnest(generate_series(0, 3)) AS band_id)
) b ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""")

# hopping-window agg twin (10 min windows, 5 min hop): every event is in
# exactly two windows — its 5-min-aligned bucket and the one before
ORACLE["hopping_window_counts"] = q("""
SELECT epoch_us(w_start) AS w_start_us, event_type,
       count(*) AS cnt,
       CAST(sum(CAST(engagement_score AS DECIMAL(18,2))) AS DOUBLE) AS total_score
FROM (
  SELECT e.*, unnest([b, b - INTERVAL 5 MINUTE]) AS w_start
  FROM (
    SELECT *, to_timestamp(CAST(floor(epoch(event_ts) / 300) * 300 AS BIGINT)) AS b
    FROM enriched
  ) e
)
GROUP BY 1, 2
""")

# benchmark decontamination twin: benchmark = every 25th document;
# overlap = distinct-benchmark-shingle hits per training doc
ORACLE["decontaminate"] = q("""
SELECT d.doc_id, d.lang,
       coalesce(o.n_overlap, 0) AS n_overlap,
       coalesce(o.n_overlap, 0) >= 2 AS contaminated
FROM documents d
LEFT JOIN (
  SELECT s.doc_id, count(*) AS n_overlap
  FROM shingle_x s
  JOIN (
    SELECT DISTINCT shingle FROM shingle_x WHERE doc_id % 25 = 0
  ) b ON s.shingle = b.shingle
  GROUP BY 1
) o ON d.doc_id = o.doc_id
""")
