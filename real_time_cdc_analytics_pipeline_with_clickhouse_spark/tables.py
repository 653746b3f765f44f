"""Loaders for the driver's parquet tables (TESTDATA.md).

``events.parquet`` carries TIMESTAMP(NANOS); with
``spark.sql.legacy.parquet.nanosAsLong=true`` Spark reads it as a long
of epoch-nanos, which we convert to a microsecond TimestampType here
(``ts div 1000`` — integer division, no double round-trip, so the value
matches DuckDB's ns→us truncation exactly).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Naive parquet TIMESTAMP(MICROS) columns (isAdjustedToUTC=false) read
    # as TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ; normalize to
    # TimestampType so chrono functions (unix_micros, date_trunc, window)
    # apply uniformly.  The session TZ is pinned UTC (session.py), so the
    # cast preserves the wall-clock value — bit-identical to DuckDB's
    # naive read of the same column.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` queries."""
    for n, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(n)
