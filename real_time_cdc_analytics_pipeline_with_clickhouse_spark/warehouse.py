"""Warehouse physical layout (SURVEY.md §2.3 P14, §4).

The reference's ClickHouse table is laid out as
``PARTITION BY toYYYYMM(event_ts) ORDER BY (event_id)`` with a sparse
primary index (clickhouse-init.sql:21-28).  The Spark-native analog:

- monthly ``partitionBy`` directories → static + dynamic partition
  pruning on time predicates;
- ``sortWithinPartitions(event_id)`` → parquet row-group min/max stats
  become a sparse index over event_id, so point/range lookups skip
  row groups (Delta would add ZORDER + data-skipping files on top).

At 100 TB the partition column bounds every time-scoped query to the
months it touches and the sort bounds key lookups to a few row groups —
the same two pruning levers ClickHouse gets from its MergeTree layout.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MONTH_COL = "event_month"


def write_warehouse(enriched: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write the enriched-events table monthly-partitioned, key-sorted."""
    (
        enriched.withColumn(MONTH_COL, F.date_format("event_ts", "yyyyMM"))
        .repartition(F.col(MONTH_COL))
        .sortWithinPartitions("event_id")
        .write.mode(mode)
        .partitionBy(MONTH_COL)
        .parquet(path)
    )


def read_warehouse(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def month_slice(spark: SparkSession, path: str, yyyymm: str) -> DataFrame:
    """Time-scoped read — the predicate is on the partition column, so
    the scan touches exactly one month directory (assert via
    ``PartitionFilters`` in the plan)."""
    return read_warehouse(spark, path).where(F.col(MONTH_COL) == yyyymm)


def _stage_swap(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    """Rewrite ``path`` from ``df`` safely while ``df`` may be reading
    it: materialize to a staging dir, then overwrite the target from
    the staging copy.

    For a partitioned target the final overwrite runs in *dynamic*
    partition-overwrite mode: each partition is replaced at job commit
    (staged task files moved into place), never delete-everything-then-
    rewrite — a crash mid-swap loses at most the partitions whose
    commit was in flight, and the staging copy still holds the full
    intended state."""
    spark = df.sparkSession
    staging = path.rstrip("/") + "_staging"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(staging)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    if partition_by:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        r = spark.read.parquet(staging).write.mode("overwrite")
        if partition_by:
            r = r.partitionBy(partition_by)
        r.parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_warehouse(spark: SparkSession, path: str) -> None:
    """Small-file compaction — the MergeTree background-merge analog.

    Streaming micro-batch appends leave many small files per month;
    rewriting each month partition as few key-sorted files restores
    scan efficiency and row-group stats (run periodically, like
    ClickHouse merges — the table's logical content is unchanged).
    """
    df = (
        read_warehouse(spark, path)
        .repartition(F.col(MONTH_COL))
        .sortWithinPartitions("event_id")
    )
    _stage_swap(df, path, partition_by=MONTH_COL)


# --- incremental hourly-rollup maintenance (the MV insert-trigger analog) ---

_ROLLUP_KEY = ["hour_ts", "content_type", "event_type"]


def _partial_rollup(enriched: DataFrame) -> DataFrame:
    return enriched.groupBy(
        F.date_trunc("hour", F.col("event_ts")).alias("hour_ts"),
        "content_type",
        "event_type",
    ).agg(
        F.count("*").alias("cnt"),
        # DECIMAL in storage: increments merge exactly, in any order
        F.sum(F.col("engagement_score").cast("decimal(18,2)")).cast("decimal(28,2)").alias("score_dec"),
    )


def write_rollup(enriched: DataFrame, path: str) -> None:
    """Materialize the hourly rollup (clickhouse-init.sql:26-38 analog)."""
    _partial_rollup(enriched).write.mode("overwrite").parquet(path)


def merge_rollup_increment(spark: SparkSession, path: str, new_enriched: DataFrame) -> None:
    """Fold a new batch into the stored rollup additively — the
    SummingMergeTree partial-merge, run at write time.  Because partials
    are DECIMAL, increment order cannot change the stored values; the
    result is bit-identical to a full recompute (tested)."""
    current = spark.read.parquet(path)
    merged = (
        current.unionByName(_partial_rollup(new_enriched))
        .groupBy(*_ROLLUP_KEY)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("score_dec").cast("decimal(28,2)").alias("score_dec"),
        )
    )
    _stage_swap(merged, path)


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select(
        "hour_ts", "content_type", "event_type", "cnt",
        F.col("score_dec").cast("double").alias("total_score"),
    )
