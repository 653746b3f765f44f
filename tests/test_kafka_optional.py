"""Optional Kafka integration (S1/K3 production paths).

The sandbox has no spark-sql-kafka connector and no broker, so these
tests SKIP unless both are present — but when an environment provides
them (``SPARK_GRAFT_KAFKA_BROKERS``), the exact production builders
``kafka_cdc_source`` / ``kafka_outbox_sink`` get executed end-to-end:
produce the deterministic CDC feed to a topic, stream it back through
parse→enrich, and assert the outbox payload round-trips.
"""

from __future__ import annotations

import os
import uuid

import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import pipeline as sp
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

BROKERS = os.environ.get("SPARK_GRAFT_KAFKA_BROKERS", "")


def _kafka_connector_available(spark) -> bool:
    try:
        spark.readStream.format("kafka").option("kafka.bootstrap.servers", "x:1").option(
            "subscribe", "probe"
        ).load()
        return True
    except Exception as e:  # DATA_SOURCE_NOT_FOUND when the jar is absent
        return "DATA_SOURCE_NOT_FOUND" not in str(e) and "Failed to find" not in str(e)


def test_kafka_cdc_roundtrip(spark, sf_dir, tmp_path):
    if not BROKERS:
        pytest.skip("no Kafka broker configured (set SPARK_GRAFT_KAFKA_BROKERS)")
    if not _kafka_connector_available(spark):
        pytest.skip("spark-sql-kafka connector not on classpath")

    topic_in = f"sg-cdc-{uuid.uuid4().hex[:8]}"
    topic_out = f"sg-outbox-{uuid.uuid4().hex[:8]}"
    events = load_table(spark, sf_dir, "events").limit(200)

    # produce the deterministic Debezium-shaped feed to the topic
    (
        cdc_feed.engagement_cdc_json(events)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("topic", topic_in)
        .save()
    )

    stream = sp.kafka_cdc_source(spark, BROKERS, topic_in, starting_offsets="earliest")
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.cdc import (
        unwrap_engagement,
    )

    import pyspark.sql.functions as F

    payload = unwrap_engagement(stream).select(
        F.to_json(F.struct("event_id", "user_id", "event_type")).alias("value")
    )
    q = sp.kafka_outbox_sink(payload, BROKERS, topic_out, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    out = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("subscribe", topic_out)
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    )
    n_in = events.where(F.col("event_id") % 97 != 0).count()  # feed drops %97 ids
    assert out.count() == n_in
