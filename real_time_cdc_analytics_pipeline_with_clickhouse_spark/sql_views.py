"""SQL surface: named views over the engine's tables, for analysts.

The reference's warehouse users write plain SQL against ClickHouse
(``analytics.enriched_events`` and ``engagement_hourly_mv``,
sql/clickhouse-init.sql:7-38) and read serving keys from Redis.  This
module gives the same experience on Spark: register the engine's
derived tables as temp views once, then ``spark.sql(...)`` anything —
Catalyst plans straight through the view definitions (views are
logical plans, not materializations, so filter/column pushdown crosses
the view boundary into the scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators import cdc, enrich, rollups
from .sources import cdc_feed
from .tables import load_table

VIEW_NAMES = [
    "enriched_events",
    "engagement_hourly_mv",
    "user_leaderboard_v",
    "latest_event_v",
    "event_counters_v",
    "documents_corpus",
]


def register_warehouse_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create the analyst-facing temp views from the CDC feeds at
    ``sf_dir``.  Returns the view names registered."""
    dim = enrich.compact_dim_latest(
        cdc.unwrap_content(cdc_feed.content_cdc_json(load_table(spark, sf_dir, "part")))
    )
    enriched = enrich.enrich_events(
        cdc.unwrap_engagement(cdc_feed.engagement_cdc_json(load_table(spark, sf_dir, "events"))),
        dim,
    )
    views: dict[str, DataFrame] = {
        "enriched_events": enriched,
        "engagement_hourly_mv": rollups.hourly_rollup(enriched),
        "user_leaderboard_v": rollups.user_leaderboard(enriched),
        "latest_event_v": rollups.latest_event(enriched),
        "event_counters_v": rollups.event_counters(enriched),
        # raw corpus as a base-table view: filters/projections written
        # in SQL push all the way into the parquet scan
        "documents_corpus": load_table(spark, sf_dir, "documents"),
    }
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return list(views)
