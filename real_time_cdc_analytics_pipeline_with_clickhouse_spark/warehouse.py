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
