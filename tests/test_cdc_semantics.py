"""Unit-level CDC semantics beyond the oracle checks (SURVEY.md §2.3-2.4)."""

from __future__ import annotations

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.scalar import (
    surrogate_event_key,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import cdc
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


def test_malformed_and_bare_records(spark, sf_dir):
    """P1/P5: malformed JSON dropped, bare records (no payload) parsed."""
    events = load_table(spark, sf_dir, "events")
    n = events.count()
    feed = cdc_feed.engagement_cdc_json(events)
    out = cdc.unwrap_engagement(feed)
    n_malformed = events.where(F.col("event_id") % 97 == 0).count()
    assert out.count() == n - n_malformed
    # bare records survive with fields intact but no source block
    bare = out.where((F.col("event_id") % 11 == 0))
    assert bare.count() > 0
    assert bare.where(F.col("source_ts_ms").isNotNull()).count() == 0
    assert bare.where(F.col("event_ts").isNull()).count() == 0


def test_four_timestamp_formats_all_parse(spark, sf_dir):
    """P3: every wire format round-trips to a non-null timestamp."""
    events = load_table(spark, sf_dir, "events")
    out = cdc.unwrap_engagement(cdc_feed.engagement_cdc_json(events))
    per_fmt = (
        out.groupBy((F.col("event_id") % 4).alias("fmt"))
        .agg(F.count("*").alias("n"), F.sum(F.col("event_ts").isNull().cast("int")).alias("nulls"))
        .collect()
    )
    assert len(per_fmt) == 4
    for r in per_fmt:
        assert r["nulls"] == 0, f"format {r['fmt']} produced null timestamps"


def test_unknown_timestamp_format_yields_null():
    import pyspark.sql.functions as F  # noqa: F811
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.session import get_spark

    spark = get_spark("ts-edge")
    df = spark.createDataFrame([("31/12/2024 10:00",), ("garbage",), (None,)], ["s"])
    out = df.select(cdc.parse_event_ts(F.col("s")).alias("t"))
    assert all(r["t"] is None for r in out.collect())


def test_nonstandard_width_still_parses_via_fallback(spark):
    """P3 leniency: widths the dispatcher doesn't own (or owns with a
    different pattern) still parse through the full-chain fallback —
    e.g. a 25-char micros-style string with 5 fractional digits, or a
    20-char 'Z'-offset form."""
    rows = [
        ("2026-01-01T00:00:00.12345",),    # 25 chars, 5-digit micros
        ("2026-01-01T00:00:00.1234",),     # 24 chars, 4-digit micros
        ("2026-01-01T00:00:00.1",),        # 21 chars, 1-digit fraction
    ]
    df = spark.createDataFrame(rows, ["s"])
    out = df.select(cdc.parse_event_ts(F.col("s")).alias("t")).collect()
    assert all(r["t"] is not None for r in out), out


def test_delete_routing_uses_before_image(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    changes = cdc.unwrap_content(cdc_feed.content_cdc_json(part))
    deletes = changes.where(F.col("is_delete"))
    n_expected = part.where(F.col("p_partkey") % 17 == 0).count()
    assert deletes.count() == n_expected
    # delete rows carry the key from the before-image, nothing else
    assert deletes.where(F.col("id").isNull()).count() == 0
    assert deletes.where(F.col("content_type").isNotNull()).count() == 0


def test_surrogate_key_fallback(spark):
    df = spark.createDataFrame([("123",), ("evt-9",), (None,)], ["id"])
    out = df.select(F.col("id"), surrogate_event_key(F.col("id")).alias("k")).collect()
    by_id = {r["id"]: r["k"] for r in out}
    assert by_id["123"] == 123            # numeric string parses
    assert by_id["evt-9"] is not None and by_id["evt-9"] >= 0  # hash fallback
    assert by_id[None] is None            # null propagates (P10)


def test_enriched_golden_schema(spark, sf_dir):
    """FIXTURES.md B3: the enrichment slice exposes the golden columns."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import enrich

    events = cdc.unwrap_engagement(
        cdc_feed.engagement_cdc_json(load_table(spark, sf_dir, "events"))
    )
    dim = enrich.compact_dim_latest(
        cdc.unwrap_content(cdc_feed.content_cdc_json(load_table(spark, sf_dir, "part")))
    )
    out = enrich.enrich_events(events, dim)
    expected = {
        "event_id", "content_id", "user_id", "event_type", "event_ts", "duration_ms",
        "device", "engagement_score", "content_type", "length_seconds",
        "engagement_seconds", "engagement_pct",
    }
    assert expected <= set(out.columns)


def test_schema_drift_extra_fields_ignored(spark):
    """Forward compatibility: Debezium adding columns (or envelope
    fields like txId) must not break the declared-schema parse — the
    consumed projection stays intact, unknown fields are skipped."""
    drifted = spark.createDataFrame(
        [
            (
                '{"payload": {"op": "c", "txId": 991, "after": '
                '{"id": "41", "user_id": "7", "content_id": "3", "event_type": "view", '
                '"device": "web", "duration_ms": 1500, "event_ts": "2024-01-01T00:00:05", '
                '"raw_payload": "{}", "brand_new_column": "surprise"}, '
                '"source": {"ts_ms": 1704067205000, "db": "app", "table": "engagement_events", '
                '"sequence": "[1,2]"}}}',
            ),
            # bare-record shape with drifted extras
            ('{"id": "42", "user_id": "8", "event_type": "click", "extra": [1, 2, 3]}',),
        ],
        "value string",
    )
    rows = {r["event_id"]: r for r in cdc.unwrap_engagement(drifted).collect()}
    assert set(rows) == {41, 42}
    assert rows[41]["duration_ms"] == 1500 and rows[41]["source_ts_ms"] == 1704067205000
    assert rows[41]["event_type"] == "view"
    assert rows[42]["event_type"] == "click" and rows[42]["duration_ms"] is None


def test_slim_feed_requires_id_field(spark, sf_dir):
    """A projected feed without 'id' would be silently dropped whole by
    unwrap (id-less records are discarded); the builder refuses it."""
    import pytest as _pytest

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    with _pytest.raises(ValueError, match="id"):
        cdc_feed.engagement_cdc_json(ev, fields=("event_type", "event_ts"))


def test_unknown_envelope_fields_are_ignored(spark):
    """Forward compatibility: a producer adding NEW fields (in the
    record, the payload, or the envelope root) must not break or
    change the unwrap — from_json with a fixed schema skips unknown
    keys, the Avro-reader-compatibility stance of the wire contract."""
    base = (
        '{"payload": {"op": "c", "after": {"id": "5", "user_id": "2", '
        '"content_id": "9", "event_type": "view", "device": "web", '
        '"duration_ms": 1500, "event_ts": "2024-01-01T10:00:00"}, '
        '"source": {"ts_ms": 7, "db": "d", "table": "t"}}}'
    )
    widened = (
        '{"schema_version": 9, "payload": {"op": "c", "txn": {"lsn": 123}, '
        '"after": {"id": "5", "user_id": "2", "content_id": "9", '
        '"event_type": "view", "device": "web", "duration_ms": 1500, '
        '"event_ts": "2024-01-01T10:00:00", "experiment_tag": "b7", '
        '"nested_new": {"a": 1}}, '
        '"source": {"ts_ms": 7, "db": "d", "table": "t", "shard": 3}}}'
    )
    df = spark.createDataFrame([(base,), (widened,)], "value string")
    rows = cdc.unwrap_engagement(df).collect()
    assert len(rows) == 2
    assert rows[0].asDict() == rows[1].asDict()  # identical unwrap
