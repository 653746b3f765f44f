"""Avro wire contracts for the CDC topics (S1/S2 production paths).

The reference registers Avro schemas for the engagement-event and
content topics in a Schema Registry
(kafka-config/setup-kafka-topics.sh:43-69; schemas/*.avsc); its
Debezium connector is nonetheless configured for JSON
(debezium connector config), so JSON is the exercised wire format and
Avro is the *declared contract*.  This module re-expresses those two
contracts and the (de)serialization builders on Spark's side:

- ``ENGAGEMENT_AVSC`` / ``CONTENT_AVSC`` — the record schemas
  (schemas/engagement_event.avsc, schemas/content.avsc), field-for-field.
- ``decode_engagement_avro`` / ``encode_engagement_avro`` — the
  ``from_avro``/``to_avro`` column transforms a Kafka ``value`` takes.

``from_avro``/``to_avro`` live in the external ``spark-avro`` package
(not bundled with pip pyspark), so everything is gated behind
``avro_available``; tests skip when the package is absent
(tests/test_avro_optional.py), exactly like the Kafka connector gate.
Payloads produced by Confluent serializers carry a 5-byte magic+id
header before the Avro body — strip it with ``strip_confluent_header``
before ``from_avro`` (standalone ``to_avro`` output has no header).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import Column, SparkSession

# schemas/engagement_event.avsc, re-expressed (namespace preserved)
ENGAGEMENT_AVSC = json.dumps(
    {
        "type": "record",
        "name": "EngagementEvent",
        "namespace": "com.cdc.events",
        "fields": [
            {"name": "event_id", "type": ["null", "long", "string"]},
            {"name": "content_id", "type": ["null", "string"]},
            {"name": "user_id", "type": ["null", "string"]},
            {"name": "event_type", "type": ["null", "string"]},
            {"name": "event_ts", "type": ["null", "string"]},
            {"name": "duration_ms", "type": ["null", "long"]},
            {"name": "device", "type": ["null", "string"]},
            {"name": "engagement_score", "type": ["null", "double"]},
            {"name": "raw_payload", "type": ["null", "string"]},
            {"name": "processed_ts", "type": ["null", "string"]},
        ],
    }
)

# schemas/content.avsc, re-expressed
CONTENT_AVSC = json.dumps(
    {
        "type": "record",
        "name": "Content",
        "namespace": "com.cdc.events",
        "fields": [
            {"name": "id", "type": "string"},
            {"name": "slug", "type": "string"},
            {"name": "title", "type": "string"},
            {"name": "content_type", "type": "string"},
            {"name": "length_seconds", "type": ["null", "int"]},
            {"name": "publish_ts", "type": "string"},
        ],
    }
)


def avro_available(spark: SparkSession) -> bool:
    """True iff the spark-avro package is on the classpath."""
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(to_avro(F.col("id"))).collect()
        return True
    except Exception:
        return False


def strip_confluent_header(value: Column) -> Column:
    """Drop the 5-byte Confluent wire header (0x00 magic + 4-byte
    schema id) a Schema-Registry-aware producer prepends."""
    return F.substring(value, 6, 2147483647)


def decode_engagement_avro(value: Column, confluent: bool = False) -> Column:
    from pyspark.sql.avro.functions import from_avro

    body = strip_confluent_header(value) if confluent else value
    return from_avro(body, ENGAGEMENT_AVSC, {"mode": "PERMISSIVE"})


def encode_engagement_avro(struct: Column) -> Column:
    from pyspark.sql.avro.functions import to_avro

    return to_avro(struct, ENGAGEMENT_AVSC)


def decode_content_avro(value: Column, confluent: bool = False) -> Column:
    from pyspark.sql.avro.functions import from_avro

    body = strip_confluent_header(value) if confluent else value
    return from_avro(body, CONTENT_AVSC, {"mode": "PERMISSIVE"})


def encode_content_avro(struct: Column) -> Column:
    from pyspark.sql.avro.functions import to_avro

    return to_avro(struct, CONTENT_AVSC)
