"""Deterministic Debezium-shaped CDC feeds derived from driver tables.

FIXTURES.md §B: every derivation is a pure function of table columns —
no wall clock, no RNG — so the Spark pipeline and the DuckDB oracle see
identical inputs.  The JSON shape mirrors the unwrapped Debezium output
the reference consumes (``debezium/enhanced-postgres-connector.json:28-34``)
and the parser expectations of ``EnhancedEngagementStreamingJob.java``
(ESJ:163-274).

Derivation contract (duplicated, deliberately, in ``oracle.py`` SQL):

engagement (from ``events``):
  - ``content_id  = event_id % 200``          (joins part.p_partkey 0..199)
  - ``duration_ms = floor(value*1000)``; NULL for ``click`` events
    (mirrors sql/init.sql:92-105 — clicks carry no duration)
  - ``device      = CASE event_id % 4 → ios|android|web|tv``
  - ``event_ts`` wire string in one of 4 formats by ``event_id % 4``
    (exercises the reference's multi-format parse, ESJ:206-233)
  - ``event_id % 97 == 0``  → malformed JSON line (dropped, ESJ:200-203)
  - ``event_id % 11 == 0``  → bare record, no ``payload`` wrapper
    (root-fallback path, ESJ:166-167)

content dimension (from ``part``):
  - v1 insert for every key; v2 update when ``p_partkey % 3 == 0``;
    final delete when ``p_partkey % 17 == 0`` (upsert/delete compaction
    tests, ESJ:244-270 + 310-318)
  - ``content_type   = CASE p_partkey % 3 → podcast|newsletter|video``
  - ``length_seconds = p_size*60`` (v1) / ``p_size*60 + 30`` (v2)
  - ``source_ts_ms   = 1704067200000 + p_partkey*10 + version``

duplicate delivery (FIXTURES.md B4): ``event_id % 13 == 0`` rows are
emitted twice, the second copy 1h later with +1000ms duration — drives
the ReplacingMergeTree-style last-write-wins dedup check
(clickhouse-init.sql:21-22).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

ISO_OFFSET = "yyyy-MM-dd'T'HH:mm:ssXXX"
ISO_MICROS = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
ISO_MILLIS = "yyyy-MM-dd'T'HH:mm:ss.SSS"
ISO_SECONDS = "yyyy-MM-dd'T'HH:mm:ss"

DIM_TS_BASE_MS = 1704067200000  # 2024-01-01T00:00:00Z


def _device(event_id: Column) -> Column:
    return (
        F.when(event_id % 4 == 0, "ios")
        .when(event_id % 4 == 1, "android")
        .when(event_id % 4 == 2, "web")
        .otherwise("tv")
    )


def _wire_ts(ts: Column, event_id: Column) -> Column:
    """Format event time in one of the 4 formats of ESJ:206-233."""
    return (
        F.when(event_id % 4 == 0, F.concat(F.date_format(ts, ISO_SECONDS), F.lit("+00:00")))
        .when(event_id % 4 == 1, F.date_format(ts, ISO_MICROS))
        .when(event_id % 4 == 2, F.date_format(ts, ISO_MILLIS))
        .otherwise(F.date_format(ts, ISO_SECONDS))
    )


def engagement_records(events: DataFrame) -> DataFrame:
    """Wire-shape engagement record fields (pre-JSON), one per event."""
    eid = F.col("event_id")
    return events.select(
        eid.cast("string").alias("id"),
        F.col("user_id").cast("string").alias("user_id"),
        (eid % 200).cast("string").alias("content_id"),
        F.col("event_type"),
        _device(eid).alias("device"),
        F.when(F.col("event_type") != "click", F.floor(F.col("value") * 1000).cast("long")).alias(
            "duration_ms"
        ),
        _wire_ts(F.col("ts"), eid).alias("event_ts"),
        F.col("props").alias("raw_payload"),
        eid.alias("_event_id"),  # numeric helper, not serialized
        F.unix_millis(F.col("ts")).alias("_source_ts_ms"),
    )


ENGAGEMENT_FIELDS = (
    "id", "user_id", "content_id", "event_type", "device", "duration_ms", "event_ts", "raw_payload"
)


def _engagement_envelope_json(rec: DataFrame, fields: tuple[str, ...] = ENGAGEMENT_FIELDS) -> Column:
    record = F.struct(*fields)
    source = F.struct(
        F.col("_source_ts_ms").alias("ts_ms"),
        F.lit("engagement_db").alias("db"),
        F.lit("engagement_events").alias("table"),
    )
    full = F.to_json(F.struct(F.struct(F.lit("c").alias("op"), record.alias("after"), source.alias("source")).alias("payload")))
    bare = F.to_json(record)
    malformed = F.lit('{"payload": {"after": {"id": ')  # truncated on purpose
    eid = F.col("_event_id")
    return (
        F.when(eid % 97 == 0, malformed).when(eid % 11 == 0, bare).otherwise(full)
    )


def engagement_cdc_json(
    events: DataFrame, fields: tuple[str, ...] = ENGAGEMENT_FIELDS
) -> DataFrame:
    """The engagement CDC feed: one JSON string per event (col ``value``).

    Repartitioned to the session's parallelism — the analog of the
    reference topic's 16 Kafka partitions (a single-file parquet input
    would otherwise serialize the whole parse chain onto one task).

    ``fields`` restricts the serialized record keys (``id`` must stay —
    unwrap drops id-less rows): a consumer that never reads
    ``raw_payload``/``user_id``/``device`` shouldn't pay to serialize
    and re-parse them; ``unwrap_engagement``'s full schema surfaces the
    omitted keys as NULLs.  This mirrors a production CDC topic carrying
    a trimmed projection rather than the full row image.
    """
    if "id" not in fields:
        # unwrap drops id-less records — an id-less feed silently
        # yields zero rows downstream; fail loudly instead
        raise ValueError("engagement feed fields must include 'id'")
    par = events.sparkSession.sparkContext.defaultParallelism
    # hash-keyed on event_id rather than round-robin: every keyless
    # repartition(n) first pays a LOCAL SORT of its input (guide §2.5,
    # sortBeforeRepartition) — here that sort ran inside the
    # single-partition parquet scan task, serializing it; event_id is
    # dense and (near-)unique, so the hash spreads evenly, and the
    # deterministic key is also the retry-safe choice (SPARK-38388)
    rec = engagement_records(events.repartition(par, F.col("event_id")))
    return rec.select(_engagement_envelope_json(rec, fields).alias("value"))


def duplicated_engagement_cdc_json(
    events: DataFrame, fields: tuple[str, ...] = ENGAGEMENT_FIELDS
) -> DataFrame:
    """FIXTURES.md B4: at-least-once delivery — ``event_id % 13 == 0``
    rows arrive twice; the replayed copy is 1h later with +1000ms
    duration.  Drives the A2 last-write-wins dedup check."""
    dupes = events.where(F.col("event_id") % 13 == 0).select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        "user_id",
        "event_type",
        (F.col("value") + 1.0).alias("value"),
        "props",
    )
    return engagement_cdc_json(
        events.select("event_id", "ts", "user_id", "event_type", "value", "props").unionAll(dupes),
        fields,
    )


def content_versions(part: DataFrame) -> DataFrame:
    """Upsert/delete version history of the content dimension (pre-JSON).

    Single-scan derivation (round 12, guide §6): the old three-branch
    ``base ∪ v2-filter ∪ v3-filter`` union planned THREE FileScans of
    ``part``; each row now emits its 1-3 version structs as one
    conditionally-sized array inlined in place — one scan, no union,
    value-identical rows (v1 for every key; v2 when ``pk % 3 == 0``
    with +30 s and ts+1; v3 delete when ``pk % 17 == 0`` with ts+2 —
    the same field expressions, byte for byte).  ``slice(array(v), 1,
    cond::int)`` is the typed empty-array idiom: length 0 drops the
    version, length 1 keeps it."""
    pk = F.col("p_partkey")
    ctype = (
        F.when(pk % 3 == 0, "podcast").when(pk % 3 == 1, "newsletter").otherwise("video")
    )
    base_ts = F.lit(DIM_TS_BASE_MS) + pk * 10 + 1
    length_s = F.col("p_size").cast("long") * 60

    def _ver(op: str, length_col, ts_offset: int):
        return F.struct(
            pk.cast("string").alias("id"),
            F.lower(F.regexp_replace(F.col("p_name"), " ", "-")).alias("slug"),
            F.col("p_name").alias("title"),
            ctype.alias("content_type"),
            length_col.alias("length_seconds"),
            F.lit("2024-01-01T00:00:00").alias("publish_ts"),
            F.lit(op).alias("op"),
            (base_ts + ts_offset).alias("source_ts_ms"),
            pk.alias("_key"),
        )

    versions = F.concat(
        F.array(_ver("c", length_s, 0)),
        F.slice(F.array(_ver("u", length_s + 30, 1)), 1, (pk % 3 == 0).cast("int")),
        F.slice(F.array(_ver("d", length_s, 2)), 1, (pk % 17 == 0).cast("int")),
    )
    return part.select(F.inline(versions))


def content_cdc_json(part: DataFrame) -> DataFrame:
    """The content-dimension CDC feed as Debezium-envelope JSON strings."""
    v = content_versions(part)
    record = F.struct("id", "slug", "title", "content_type", "length_seconds", "publish_ts")
    source = F.struct(
        F.col("source_ts_ms").alias("ts_ms"),
        F.lit("engagement_db").alias("db"),
        F.lit("content").alias("table"),
    )
    # deletes carry before-image only (ESJ:249-259); to_json drops nulls
    after = F.when(F.col("op") != "d", record)
    before = F.when(F.col("op") == "d", F.struct(F.col("id")))
    return v.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.col("op"),
                    before.alias("before"),
                    after.alias("after"),
                    source.alias("source"),
                ).alias("payload")
            )
        ).alias("value")
    )
