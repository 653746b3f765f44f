"""Declared StructTypes for the CDC envelope and engine row types.

Mirrors the Debezium JSON the reference consumes
(``/root/reference/debezium/enhanced-postgres-connector.json:28-34``,
parsed at ``EnhancedEngagementStreamingJob.java:163-197`` — "ESJ").
Schemas are always declared up front; the engine never infers
(SURVEY.md §1.3).  Parsing is lenient: ``from_json`` in PERMISSIVE mode
yields nulls for missing/malformed fields, matching the reference's
probe-and-null Jackson parsers (ESJ:176-197) and
``errors.tolerance=all``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# after/before image of an engagement_events row on the wire.  All
# fields nullable — the Avro contract declares every field as a
# nullable union (schemas/engagement_event.avsc:6-55).
ENGAGEMENT_RECORD = StructType(
    [
        StructField("id", StringType()),
        StructField("user_id", StringType()),
        StructField("content_id", StringType()),
        StructField("event_type", StringType()),
        StructField("device", StringType()),
        StructField("duration_ms", LongType()),
        StructField("event_ts", StringType()),  # multi-format; parsed by cdc.parse_event_ts
        StructField("raw_payload", StringType()),
    ]
)

# content dimension row (sql/init.sql:7-14)
CONTENT_RECORD = StructType(
    [
        StructField("id", StringType()),
        StructField("slug", StringType()),
        StructField("title", StringType()),
        StructField("content_type", StringType()),
        StructField("length_seconds", LongType()),
        StructField("publish_ts", StringType()),
    ]
)

SOURCE_BLOCK = StructType(
    [
        StructField("ts_ms", LongType()),
        StructField("db", StringType()),
        StructField("table", StringType()),
    ]
)


def envelope(record: StructType, with_delete_routing: bool = True) -> StructType:
    """Debezium envelope: {payload: {op, before, after, source}}.

    The reference also accepts the record at the *root* (no ``payload``
    wrapper, ESJ:166-167); the unwrap operator coalesces both shapes,
    so the envelope schema embeds the record fields at top level too.

    The declared schema is the *consumed* projection, not the full wire
    shape — Jackson skips undeclared fields, and skipping is much
    cheaper than materializing (measured ~18% off the envelope parse).
    The engagement parser never reads ``op``/``before`` (ESJ:163-172),
    so its envelope omits them; the content parser reads only
    ``before.id`` on deletes (ESJ:249-259), so ``before`` is slimmed
    to the key.
    """
    payload_fields = []
    if with_delete_routing:
        payload_fields += [
            StructField("op", StringType()),
            StructField("before", StructType([record.fields[0]])),
        ]
    payload_fields += [
        StructField("after", record),
        StructField("source", SOURCE_BLOCK),
    ]
    return StructType(
        [StructField("payload", StructType(payload_fields))] + list(record.fields)
    )


ENGAGEMENT_ENVELOPE = envelope(ENGAGEMENT_RECORD, with_delete_routing=False)
CONTENT_ENVELOPE = envelope(CONTENT_RECORD)

# Enriched-event golden schema (FIXTURES.md B3; mirrors
# analytics.enriched_events, sql/clickhouse-init.sql:7-23).
ENRICHED_EVENT = StructType(
    [
        StructField("event_id", LongType(), nullable=False),
        StructField("content_id", LongType(), nullable=False),
        StructField("user_id", LongType(), nullable=False),
        StructField("event_type", StringType(), nullable=False),
        StructField("event_ts", TimestampType(), nullable=False),
        StructField("duration_ms", LongType(), nullable=True),
        StructField("device", StringType(), nullable=False),
        StructField("engagement_score", DoubleType(), nullable=False),
        StructField("content_type", StringType(), nullable=True),
        StructField("length_seconds", LongType(), nullable=True),
        StructField("engagement_seconds", DoubleType(), nullable=True),
        StructField("engagement_pct", DoubleType(), nullable=True),
    ]
)

# Multimodal column pattern: opaque binary payload + typed metadata
# (north-star extension; see operators/multimodal.py).
MULTIMODAL_ASSET = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("modality", StringType(), nullable=False),  # image|audio|video|text
        StructField("payload", BinaryType(), nullable=True),
        StructField("mime", StringType(), nullable=True),
        StructField("width", LongType(), nullable=True),
        StructField("height", LongType(), nullable=True),
        StructField("sample_rate", LongType(), nullable=True),
        StructField("n_frames", LongType(), nullable=True),
    ]
)

EMBEDDING = ArrayType(DoubleType())
