"""Warehouse physical-layout tests: monthly partition pruning + key
sort (the ClickHouse PARTITION BY toYYYYMM / ORDER BY analog)."""

from __future__ import annotations

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark import warehouse
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import cdc, enrich
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.plans.explain import plan_string
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


def _enriched(spark, sf_dir):
    events = cdc.unwrap_engagement(
        cdc_feed.engagement_cdc_json(load_table(spark, sf_dir, "events"))
    )
    dim = enrich.compact_dim_latest(
        cdc.unwrap_content(cdc_feed.content_cdc_json(load_table(spark, sf_dir, "part")))
    )
    return enrich.enrich_events(events, dim)


def test_month_partition_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "wh")
    enr = _enriched(spark, sf_dir)
    warehouse.write_warehouse(enr, path)

    sliced = warehouse.month_slice(spark, path, "202401")
    plan = plan_string(sliced)
    assert "PartitionFilters" in plan and "event_month" in plan, plan
    # every source event is in Jan 2024 → slice must equal the full table
    assert sliced.count() == enr.count()
    empty = warehouse.month_slice(spark, path, "209901")
    assert empty.count() == 0


def test_key_sort_gives_rowgroup_stats(spark, sf_dir, tmp_path):
    """sortWithinPartitions(event_id) → parquet min/max stats act as a
    sparse index; a point lookup pushes the key filter to the scan."""
    path = str(tmp_path / "wh")
    warehouse.write_warehouse(_enriched(spark, sf_dir), path)
    lookup = warehouse.read_warehouse(spark, path).where(F.col("event_id") == 101)
    plan = plan_string(lookup)
    assert "PushedFilters" in plan and "EqualTo(event_id,101)" in plan
    assert lookup.count() == 1
