"""Optional Delta-native storage path (lakehouse.py).

The dispatch contract must hold in EVERY environment: without
delta-spark, ``merge_upsert`` routes to the parquet emulation and the
probes report unavailability; with it (CI images that add the
package), the delta leg runs the same latest-wins/replay assertions
through a real ``MERGE INTO``.  The delta-parametrized tests skip
cleanly when the package is absent — the same gating pattern as the
Kafka/Avro connectors.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark import lakehouse


def _delta_present(spark) -> bool:
    return lakehouse.delta_available(spark)


def test_probe_consistent_and_layout_detection(spark, tmp_path):
    """delta_available is a pure capability probe (stable across calls)
    and is_delta_table keys on the transaction log dir only."""
    assert lakehouse.delta_available(spark) == lakehouse.delta_available(spark)
    d = tmp_path / "t"
    assert not lakehouse.is_delta_table(str(d))
    (d / "_delta_log").mkdir(parents=True)
    assert lakehouse.is_delta_table(str(d))


def _merge_frames(spark):
    rows1 = [(1, "2024-01-01 10:00:00", "a"), (2, "2024-01-01 11:00:00", "b")]
    rows2 = [
        (2, "2024-01-01 12:00:00", "b2"),   # newer version wins
        (2, "2024-01-01 09:00:00", "b0"),   # older version loses
        (3, "2024-02-01 10:00:00", "c"),    # new key, new month
    ]
    mk = lambda rows: spark.createDataFrame(rows, "event_id long, ts string, v string").select(
        "event_id", F.to_timestamp("ts").alias("event_ts"), "v"
    )
    return mk(rows1), mk(rows2)


@pytest.mark.parametrize("fmt", ["parquet", "delta"])
def test_merge_upsert_latest_wins_both_paths(spark, tmp_path, fmt):
    """Same MERGE contract through either backend: latest version per
    key within its month partition, replay loses the tiebreak."""
    if fmt == "delta" and not _delta_present(spark):
        pytest.skip("delta-spark not on the classpath")
    target = str(tmp_path / "wh")
    b1, b2 = _merge_frames(spark)

    if fmt == "delta":
        lakehouse.merge_upsert_delta(b1, target, key="event_id", version="event_ts")
        lakehouse.merge_upsert_delta(b2, target, key="event_id", version="event_ts")
        lakehouse.merge_upsert_delta(b2, target, key="event_id", version="event_ts")  # replay
        assert lakehouse.is_delta_table(target)
    else:
        from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming.pipeline import (
            merge_upsert_parquet,
        )

        merge_upsert_parquet(b1, target, key="event_id", version="event_ts")
        merge_upsert_parquet(b2, target, key="event_id", version="event_ts")
        merge_upsert_parquet(b2, target, key="event_id", version="event_ts")  # replay
        assert not lakehouse.is_delta_table(target)

    got = {
        r["event_id"]: r["v"]
        for r in lakehouse.read_merged(spark, target).collect()
    }
    assert got == {1: "a", 2: "b2", 3: "c"}
    months = {
        r[0]
        for r in lakehouse.read_merged(spark, target)
        .select(F.col(lakehouse.MONTH_COL).cast("string"))
        .collect()
    }
    assert months == {"202401", "202402"}


def test_merge_upsert_dispatch_falls_back_to_parquet_here(spark, tmp_path):
    """In this container (no delta-spark) the dispatcher must take the
    emulation path and produce a plain month-partitioned parquet
    layout."""
    if _delta_present(spark):
        pytest.skip("delta present: the fallback leg is not reachable")
    target = str(tmp_path / "wh")
    b1, _ = _merge_frames(spark)
    lakehouse.merge_upsert(b1, target, key="event_id", version="event_ts")
    assert not lakehouse.is_delta_table(target)
    assert any(f.startswith(f"{lakehouse.MONTH_COL}=") for f in os.listdir(target))
    assert lakehouse.read_merged(spark, target).count() == 2


@pytest.mark.parametrize("fmt", ["delta"])
def test_dim_publish_delta_roundtrip(spark, tmp_path, fmt):
    """Native dim publish: one transactional overwrite, read through
    the log (skips without delta-spark)."""
    if not _delta_present(spark):
        pytest.skip("delta-spark not on the classpath")
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import pipeline as sp

    dim_dir = str(tmp_path / "dim")
    v1 = spark.createDataFrame([(1, "podcast", 60)], "id long, content_type string, length_seconds long")
    v2 = spark.createDataFrame([(1, "video", 300)], "id long, content_type string, length_seconds long")
    sp._publish_dim_version(v1, dim_dir)
    assert lakehouse.is_delta_table(dim_dir)
    assert sp.read_dim(spark, dim_dir).collect()[0]["content_type"] == "podcast"
    sp._publish_dim_version(v2, dim_dir)
    assert sp.read_dim(spark, dim_dir).collect()[0]["content_type"] == "video"


def test_merge_format_is_sticky_per_table(spark, tmp_path, monkeypatch):
    """A target already maintained by the parquet emulation must KEEP
    routing to the emulation even when delta-spark becomes available —
    the Delta bootstrap is an overwrite, so re-routing an existing
    parquet table would destroy its history."""
    import pyspark.sql.functions as F

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark import lakehouse as lh

    target = str(tmp_path / "wh")
    b1 = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "event_id long, event_ts string"
    ).withColumn("event_ts", F.to_timestamp("event_ts"))
    lh.merge_upsert(b1, target, key="event_id", version="event_ts")
    assert lh._is_parquet_emulation_table(target)

    # delta "appears on the classpath"
    monkeypatch.setattr(lh, "delta_available", lambda _s: True)

    def boom(*_a, **_k):
        raise AssertionError("existing parquet table was routed to Delta")

    monkeypatch.setattr(lh, "merge_upsert_delta", boom)
    b2 = spark.createDataFrame(
        [(2, "2024-01-01 11:00:00")], "event_id long, event_ts string"
    ).withColumn("event_ts", F.to_timestamp("event_ts"))
    lh.merge_upsert(b2, target, key="event_id", version="event_ts")  # must not raise
    assert lh.read_merged(spark, target).count() == 2

    # a FRESH target under delta_available does route to Delta
    with pytest.raises(AssertionError, match="routed to Delta"):
        lh.merge_upsert(b2, str(tmp_path / "fresh"), key="event_id", version="event_ts")
