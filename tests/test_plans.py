"""Physical-plan assertions — the 100 TB stance, enforced (SURVEY.md §4)."""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as entrymod
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.plans.explain import (
    assert_broadcast_join,
    plan_string,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

QUERIES = entrymod.queries()


def test_enrich_join_is_broadcast(spark, sf_dir):
    """The dim join must never shuffle the fact side (J1)."""
    assert_broadcast_join(QUERIES["enrich_join"](spark, sf_dir))


def test_star_join_broadcasts_true_dims_only(spark, sf_dir):
    """supplier/nation/region are forced broadcasts; orders/customer are
    fact-proportional and must NOT carry a broadcast hint (left to AQE,
    which picks broadcast at small SF and shuffle join at 100 TB)."""
    plan = plan_string(QUERIES["star_join_revenue"](spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 3, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    import inspect

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import relational

    src = inspect.getsource(relational.star_join_revenue)
    assert "broadcast(orders" not in src and "broadcast(customer" not in src


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_string(QUERIES["pricing_summary"](spark, sf_dir))
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark, sf_dir):
    """A 2-column projection must not read all 11 lineitem columns."""
    li = load_table(spark, sf_dir, "lineitem")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = plan_string(df)
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_extendedprice" not in schema_line
    assert "l_quantity" in schema_line


def test_no_cartesian_in_range_join(spark, sf_dir):
    plan = plan_string(QUERIES["range_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_partial_aggregation_in_rollup(spark, sf_dir):
    """Hourly rollup must map-side combine (partial_count/sum before
    the exchange) — the property that bounds shuffle volume at scale."""
    plan = plan_string(QUERIES["hourly_rollup"](spark, sf_dir))
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_rollup_feed_serializes_only_consumed_fields(spark, sf_dir):
    """Guard the slim-feed optimization (round-3): the rollup-path CDC
    queries must not serialize user_id/device/raw_payload into their
    synthetic envelope — to_json of those fields was most of the
    parse cost.  The full-fidelity feed (cdc_unwrap etc.) still
    carries them."""
    import re

    def scan_cols(plan):
        cols = set()
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
            cols |= {f.split(":")[0] for f in m.group(1).split(",") if f}
        return cols

    # the feed never serializes props→raw_payload, so column pruning
    # must drop props from the events scan entirely (unwrap's full
    # from_json SCHEMA still names raw_payload — it parses to NULL)
    slim = scan_cols(plan_string(QUERIES["hourly_rollup"](spark, sf_dir)))
    assert "props" not in slim and "ts" in slim, slim
    full = scan_cols(plan_string(QUERIES["cdc_unwrap"](spark, sf_dir)))
    assert "props" in full, full


def test_interval_attribution_join_is_equi_keyed(spark, sf_dir):
    """The stream-stream attribution join's batch plan must be an
    equality join on content_id with the time range as a join-level
    filter — never a cartesian/BNLJ (the range predicate alone would
    degrade to one; the content_id key prevents it)."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import cdc
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import pipeline as sp

    ev = cdc.unwrap_engagement(
        cdc_feed.engagement_cdc_json(load_table(spark, sf_dir, "events"))
    )
    up = sp.content_update_stream(cdc_feed.content_cdc_json(load_table(spark, sf_dir, "part")))
    plan = plan_string(sp.attribute_events_to_updates(ev, up, "24 hours"))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "content_id" in plan and ("HashJoin" in plan or "SortMergeJoin" in plan)


def test_hll_state_aggregates_partially(spark, sf_dir):
    """The uniqState rollup must combine map-side (partial_hll_sketch_agg
    below the exchange) — at 100 TB the shuffle carries one sketch per
    (hour, event_type) per map task, never raw user_ids."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        cdc, enrich, sketches,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed

    ev = cdc.unwrap_engagement(cdc_feed.engagement_cdc_json(load_table(spark, sf_dir, "events")))
    dim = enrich.compact_dim_latest(
        cdc.unwrap_content(cdc_feed.content_cdc_json(load_table(spark, sf_dir, "part")))
    )
    plan = plan_string(sketches.hourly_uniques_state(enrich.enrich_events(ev, dim)))
    assert "partial_hll_sketch_agg" in plan


def test_repeated_passages_shuffles_on_digest_only(spark, sf_dir):
    """Passage detection must stay an equi-join keyed on the chunk
    digest: no cartesian/BNLJ anywhere in the plan."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import corpus

    plan = plan_string(corpus.repeated_passages(load_table(spark, sf_dir, "documents")))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "passage_md5" in plan
