"""Optional Avro contract tests (S1/S2 wire-format parity).

The pip pyspark distribution does not bundle the external spark-avro
package, so the round-trip tests SKIP here — but when an environment
loads it (``--packages org.apache.spark:spark-avro_2.13:<ver>``), the
exact production encode/decode builders get executed.  The schema
*contracts* themselves (field names/types re-expressed from the
reference's registered .avsc files) are validated unconditionally.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import avro_contract as av


def test_contract_shapes():
    """The declared contracts carry every field the reference registers
    in its Schema Registry (setup-kafka-topics.sh:43-69)."""
    eng = json.loads(av.ENGAGEMENT_AVSC)
    assert [f["name"] for f in eng["fields"]] == [
        "event_id", "content_id", "user_id", "event_type", "event_ts",
        "duration_ms", "device", "engagement_score", "raw_payload", "processed_ts",
    ]
    assert eng["namespace"] == "com.cdc.events"
    # event_id is the reference's long-or-string union
    assert eng["fields"][0]["type"] == ["null", "long", "string"]
    con = json.loads(av.CONTENT_AVSC)
    assert [f["name"] for f in con["fields"]] == [
        "id", "slug", "title", "content_type", "length_seconds", "publish_ts",
    ]
    assert con["fields"][4]["type"] == ["null", "int"]


def test_confluent_header_strip(spark):
    """The 5-byte wire header is removed, byte-exactly."""
    df = spark.createDataFrame([(bytearray(b"\x00\x00\x00\x00\x07avrobody"),)], "value binary")
    out = df.select(av.strip_confluent_header(F.col("value")).alias("body")).first()
    assert bytes(out["body"]) == b"avrobody"


def test_avro_roundtrip(spark, sf_dir):
    if not av.avro_available(spark):
        pytest.skip("spark-avro package not on classpath")
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").limit(100).select(
        F.col("event_id").cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("content_id"),
        F.col("user_id").cast("string").alias("user_id"),
        F.col("event_type").alias("event_type"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("event_ts"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit("web").alias("device"),
        F.lit(None).cast("double").alias("engagement_score"),
        F.col("props").alias("raw_payload"),
        F.lit(None).cast("string").alias("processed_ts"),
    )
    wire = ev.select(av.encode_engagement_avro(F.struct(*ev.columns)).alias("value"))
    back = wire.select(av.decode_engagement_avro(F.col("value")).alias("r")).select("r.*")
    assert sorted(r["event_id"] for r in back.collect()) == sorted(
        r["event_id"] for r in ev.collect()
    )
