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
)
"""


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

ORACLE["cdc_ts_parse"] = q("""
SELECT event_id, event_id % 4 AS wire_format, epoch_us(event_ts) AS event_ts_us
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

ORACLE["engagement_score"] = q("""
SELECT event_id, event_type, duration_ms, engagement_score
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

ORACLE["content_leaderboard"] = q("""
SELECT content_id, user_id, total_score,
       row_number() OVER (PARTITION BY content_id
                          ORDER BY total_score DESC, user_id) AS rnk
FROM (
  SELECT content_id, user_id,
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

ORACLE["json_props"] = q("""
SELECT event_type,
       count(*) AS cnt,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(CAST(sum(k) AS BIGINT) AS DOUBLE) / count(*) AS avg_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
) GROUP BY 1
""")

ORACLE["surrogate_key"] = q("""
SELECT event_id,
       id_str,
       coalesce(
         TRY_CAST(id_str AS BIGINT),
         abs(CAST(('0x' || substr(md5(id_str), 1, 15)) AS BIGINT))
       ) AS surrogate_key
FROM (
  SELECT event_id,
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

ORACLE["semi_join"] = q("""
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""")

ORACLE["anti_join"] = q("""
SELECT p_partkey, p_name, p_type FROM part
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

ORACLE["rollup_revenue"] = q("""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       count(*) AS cnt
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")

ORACLE["cube_order_stats"] = q("""
SELECT o_orderstatus, o_orderpriority,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       count(*) AS cnt
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")

ORACLE["distinct_aggs"] = q("""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
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

ORACLE["pivot_event_types"] = q("""
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'view') AS "view",
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'error') AS error
FROM events GROUP BY 1
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

ORACLE["having_large_orders"] = q("""
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(total_qty_dec AS DOUBLE) AS total_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty_dec
  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
) ON o_orderkey = l_orderkey
""")

ORACLE["string_funcs"] = q("""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substr(p_name, 1, 5) AS name_prefix,
       length(p_name) AS name_len,
       regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
       concat_ws('|', p_brand, p_type) AS brand_type,
       (p_name LIKE '%a%') AS has_a,
       replace(p_type, ' ', '_') AS type_snake,
       reverse(p_brand) AS brand_rev,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
FROM part
""")

ORACLE["date_funcs"] = q("""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(day(o_orderdate) AS INT) AS order_day,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS order_dow,  -- DuckDB dow is 0-based, Spark 1-based
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch_start,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(quarter(o_orderdate) AS INT) AS order_quarter
FROM orders
""")

ORACLE["math_funcs"] = q("""
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
""")

ORACLE["case_when_buckets"] = q("""
SELECT bucket, count(*) AS cnt,
       CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (
  SELECT CASE WHEN "value" < 10 THEN 'tiny' WHEN "value" < 50 THEN 'small'
              WHEN "value" < 150 THEN 'medium' ELSE 'large' END AS bucket,
         "value"
  FROM events
) GROUP BY 1
""")
