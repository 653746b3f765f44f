"""Serving-side lookup API (SURVEY.md §3.3).

The reference's consumers read Redis point keys and sorted sets:
``GET engagement:{user}:{content}``, ``ZREVRANGE user_engagement:{user}``,
``ZREVRANGE top_content:bucket:{minute}``, ``GET event_counters:{type}``
(ESJ:412-441).  Here the same lookups are partition-pruned /
filter-pushed point reads over materialized serving tables — each
getter's predicate reaches the parquet scan, so a lookup touches one
partition directory (leaderboards) or a few row groups, not the table.

``materialize_serving_tables`` is what a ``foreachBatch`` serving sink
runs per micro-batch (full refresh here; with Delta, MERGE-updates).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .operators import rollups

TABLES = ["user_leaderboard", "latest_event", "event_counters", "trending"]


def materialize_serving_tables(enriched: DataFrame, base_dir: str) -> None:
    """Write the four serving tables.  The leaderboard is partitioned
    by a user bucket (1024 buckets): per-user reads prune to one
    directory — the layout analog of Redis key sharding — without
    creating millions of tiny single-user partitions."""
    (
        rollups.user_leaderboard(enriched)
        .withColumn("user_bucket", F.pmod(F.col("user_id"), F.lit(1024)))
        .write.mode("overwrite")
        .partitionBy("user_bucket")
        .parquet(f"{base_dir}/user_leaderboard")
    )
    rollups.latest_event(enriched).write.mode("overwrite").parquet(f"{base_dir}/latest_event")
    rollups.event_counters(enriched).write.mode("overwrite").parquet(f"{base_dir}/event_counters")
    rollups.trending_recent(enriched).write.mode("overwrite").parquet(f"{base_dir}/trending")


def get_user_leaderboard(spark: SparkSession, base_dir: str, user_id: int, k: int = 10) -> DataFrame:
    """ZREVRANGE user_engagement:{user} 0 k — ranked contents."""
    return (
        spark.read.parquet(f"{base_dir}/user_leaderboard")
        .where((F.col("user_bucket") == user_id % 1024) & (F.col("user_id") == user_id))
        .where(F.col("rnk") <= k)
        .orderBy("rnk")
        .drop("user_bucket")
    )


def get_latest_event(spark: SparkSession, base_dir: str, user_id: int, content_id: int) -> DataFrame:
    """GET engagement:{user}:{content} — the last enriched event."""
    return spark.read.parquet(f"{base_dir}/latest_event").where(
        (F.col("user_id") == user_id) & (F.col("content_id") == content_id)
    )


def get_event_counter(spark: SparkSession, base_dir: str, event_type: str) -> DataFrame:
    """GET event_counters:{type}."""
    return spark.read.parquet(f"{base_dir}/event_counters").where(
        F.col("event_type") == event_type
    )


def get_trending(spark: SparkSession, base_dir: str, k: int = 5) -> DataFrame:
    """ZREVRANGE top_content:bucket:{latest minutes} — trending view."""
    return (
        spark.read.parquet(f"{base_dir}/trending")
        .where(F.col("rnk") <= k)
        .orderBy("minute_bucket", "rnk")
    )
