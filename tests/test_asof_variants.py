"""The two as-of join implementations (union-ranking windows vs
cogrouped pandas merge_asof) must agree row-for-row, and the native
session_window streaming sessionizer must agree with the batch
lag+cumsum sessionizer on session counts."""

from __future__ import annotations

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import relational as R
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import rollups
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table
from tests.oracle_utils import frame_rows


def test_asof_pandas_equals_window_impl(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    a = R.asof_join_latest_order(events, orders)
    b = R.asof_join_pandas(events, orders)
    ra = frame_rows(a.columns, [tuple(r) for r in a.collect()])
    rb = frame_rows(b.columns, [tuple(r) for r in b.collect()])
    assert ra == rb


def test_session_window_agrees_with_lag_cumsum(spark, sf_dir):
    """Native session_window(30 min) groups must equal the number of
    gap-based sessions per user from rollups.sessionize."""
    events = load_table(spark, sf_dir, "events")
    native = (
        events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    ours = (
        rollups.sessionize(events, gap_minutes=30)
        .groupBy("user_id")
        .agg(F.max("session_seq").alias("n_sessions"))
    )
    got = {r["user_id"]: r["n_sessions"] for r in native.collect()}
    want = {r["user_id"]: r["n_sessions"] for r in ours.collect()}
    assert got == want
