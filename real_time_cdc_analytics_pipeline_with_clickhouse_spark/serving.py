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
from .warehouse import _stage_swap

TABLES = ["user_leaderboard", "latest_event", "event_counters", "trending"]


def materialize_serving_tables(enriched: DataFrame, base_dir: str) -> None:
    """Write the four serving tables.  The leaderboard is partitioned
    by a user bucket (1024 buckets): per-user reads prune to one
    directory — the layout analog of Redis key sharding — without
    creating millions of tiny single-user partitions."""
    (
        _leaderboard_state(enriched)
        .write.mode("overwrite")
        .partitionBy("user_bucket")
        .parquet(f"{base_dir}/user_leaderboard")
    )
    rollups.latest_event(enriched).write.mode("overwrite").parquet(f"{base_dir}/latest_event")
    rollups.event_counters(enriched).write.mode("overwrite").parquet(f"{base_dir}/event_counters")
    rollups.trending_recent(enriched).write.mode("overwrite").parquet(f"{base_dir}/trending")


N_BUCKETS = 1024


def _leaderboard_state(enriched: DataFrame) -> DataFrame:
    """(user, content) → exact decimal score partials + bucket + rank.

    Scores are stored as DECIMAL so increments merge exactly — an
    incrementally maintained table stays bit-identical to a full
    recompute regardless of batch arrival order."""
    agg = enriched.groupBy("user_id", "content_id").agg(
        F.sum(F.col("engagement_score").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("score_dec")
    )
    return _rank_state(agg)


def _rank_state(agg: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("score_dec").desc(), F.col("content_id"))
    return (
        agg.withColumn("total_score", F.col("score_dec").cast("double"))
        .withColumn("rnk", F.row_number().over(w))
        .withColumn("user_bucket", F.pmod(F.col("user_id"), F.lit(N_BUCKETS)))
    )


def merge_leaderboard_increment(spark: SparkSession, base_dir: str, new_enriched: DataFrame) -> None:
    """Fold a micro-batch into the stored leaderboard incrementally —
    the warehouse's partition-scoped MERGE pattern generalized from
    time partitions to key-space buckets:

    1. decimal score deltas per (user, content) from the batch only;
    2. the affected ``user_bucket`` set (≤ N_BUCKETS, a bounded
       collect) prunes the read — untouched buckets are never read or
       written;
    3. merge = additive decimal sum, then re-rank ONLY the affected
       buckets' users;
    4. dynamic partition overwrite commits just those buckets.

    Exactness: decimal addition is associative/commutative, so any
    batch arrival order lands bit-identical to a full recompute
    (tested).
    """
    delta = new_enriched.groupBy("user_id", "content_id").agg(
        F.sum(F.col("engagement_score").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("score_dec")
    ).withColumn("user_bucket", F.pmod(F.col("user_id"), F.lit(N_BUCKETS)))
    delta.persist()
    try:
        buckets = [r[0] for r in delta.select("user_bucket").distinct().collect()]
        if not buckets:
            return
        path = f"{base_dir}/user_leaderboard"
        current = (
            spark.read.parquet(path)
            .where(F.col("user_bucket").isin(buckets))
            .select("user_id", "content_id", "score_dec", "user_bucket")
        )
        merged = (
            current.unionByName(delta)
            .groupBy("user_id", "content_id", "user_bucket")
            .agg(F.sum("score_dec").cast("decimal(28,2)").alias("score_dec"))
        )
        ranked = _rank_state(merged.drop("user_bucket"))
        _stage_swap(ranked, path, partition_by="user_bucket")
    finally:
        delta.unpersist()


def get_user_leaderboard(spark: SparkSession, base_dir: str, user_id: int, k: int = 10) -> DataFrame:
    """ZREVRANGE user_engagement:{user} 0 k — ranked contents."""
    return (
        spark.read.parquet(f"{base_dir}/user_leaderboard")
        .where((F.col("user_bucket") == user_id % N_BUCKETS) & (F.col("user_id") == user_id))
        .where(F.col("rnk") <= k)
        .orderBy("rnk")
        .drop("user_bucket", "score_dec")
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


def merge_trending_increment(spark: SparkSession, base_dir: str, new_enriched: DataFrame) -> None:
    """Fold a micro-batch into the stored per-minute trending partials
    incrementally — the leaderboard's partition-scoped MERGE pattern
    applied to TIME partitions:

    1. decimal score deltas per (minute_bucket, content_id) from the
       batch only;
    2. the touched minute buckets (bounded by the watermark — a
       handful per batch, collected as a short list) prune the read;
    3. merge = additive decimal sum over just those buckets;
    4. dynamic partition overwrite commits only them.

    The stored table is ``trending_state`` partitioned by
    minute_bucket: partial DECIMAL sums, rank-free (ranking is a
    per-bucket read-time window over ≤ content-cardinality rows —
    cheap, and storing it would force re-ranking untouched buckets
    whenever k changes).  Decimal addition is order-independent, so
    any batch split lands bit-identical to a full recompute (tested).
    """
    delta = new_enriched.groupBy(
        F.date_format("event_ts", "yyyyMMddHHmm").alias("minute_bucket"),
        "content_id",
    ).agg(
        F.sum(F.col("engagement_score").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("score_dec")
    )
    delta.persist()
    try:
        buckets = [r[0] for r in delta.select("minute_bucket").distinct().collect()]
        if not buckets:
            return
        path = f"{base_dir}/trending_state"
        import os

        if os.path.isdir(path) and any(
            f.startswith("minute_bucket=") for f in os.listdir(path)
        ):
            current = (
                spark.read.parquet(path)
                .withColumn("minute_bucket", F.col("minute_bucket").cast("string"))
                .where(F.col("minute_bucket").isin(buckets))
                .select("minute_bucket", "content_id", "score_dec")
            )
            merged = (
                current.unionByName(delta)
                .groupBy("minute_bucket", "content_id")
                .agg(F.sum("score_dec").cast("decimal(28,2)").alias("score_dec"))
            )
        else:
            merged = delta
        _stage_swap(merged, path, partition_by="minute_bucket")
    finally:
        delta.unpersist()


def get_minute_topk(spark: SparkSession, base_dir: str, minute_bucket: str, k: int = 5) -> DataFrame:
    """ZREVRANGE top_content:bucket:{minute} — rank one bucket's
    partials at read time; the bucket predicate prunes the scan to a
    single partition directory."""
    from pyspark.sql import Window

    w = Window.partitionBy("minute_bucket").orderBy(
        F.col("total_score").desc(), F.col("content_id")
    )
    return (
        spark.read.parquet(f"{base_dir}/trending_state")
        .where(F.col("minute_bucket") == minute_bucket)
        .select(
            F.col("minute_bucket").cast("string").alias("minute_bucket"),
            "content_id",
            F.col("score_dec").cast("double").alias("total_score"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )
