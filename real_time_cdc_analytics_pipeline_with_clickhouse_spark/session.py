"""SparkSession construction tuned for this engine.

Single place for configs so tests, ``__spark_entry__`` and ``bench.py``
agree.  Scale stance: AQE on (runtime coalescing + skew-join splitting),
UTC session time zone (oracle parity), nanos-as-long for the driver's
``events.parquet`` (written with ns timestamps, which Spark's parquet
reader otherwise rejects).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that are safe (and wanted) on any session, including one the
# driver created for us: all runtime-settable SQLConf entries.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores TIMESTAMP(NANOS); read as long, convert in
    # tables.load_events (Spark has no ns timestamp type).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Oracle (DuckDB) timestamps are naive/UTC; pin the session TZ so
    # date_trunc/hour buckets agree bit-for-bit.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # local[32] with 128 GiB: modest partition counts keep small-SF test
    # latency down; AQE coalesces further at runtime.  At cluster scale
    # this is sized per-job (see README scale notes).
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # Arrow for the few pandas-UDF extension operators.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}

# Disk-backed streaming state: at 100× key cardinality the default
# HDFS-backed store holds every key on the executor heap; RocksDB
# spills to local SSD and checkpoints changelogs.  Applied only when
# the build actually ships the provider (classload-guarded) so the
# engine still runs on a RocksDB-less Spark.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _rocksdb_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(ROCKSDB_PROVIDER)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply engine confs to an existing session (e.g. the driver's)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build; defaults are acceptable
    if _rocksdb_available(spark):
        try:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
        except Exception:
            pass
    return spark


def get_spark(app_name: str = "cdc-analytics-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    import tempfile

    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # saveAsTable target for bucketed tables (kept out of the repo)
        .config("spark.sql.warehouse.dir", os.path.join(tempfile.gettempdir(), "sg_warehouse"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return apply_runtime_confs(builder.getOrCreate())
