"""CDC envelope normalization (SURVEY.md §2.3 P1-P5, §2.4 F1-F4).

Re-expresses the reference's Jackson parsers
(``EnhancedEngagementStreamingJob.java:157-274``) as declarative
``from_json`` + projections: PERMISSIVE parsing makes malformed input
null (P5), ``coalesce(payload.after, root)`` handles both envelope and
bare-record shapes (P1), a 4-format ``try_to_timestamp`` chain mirrors
the multi-format parse (P3), and delete ops route through the
before-image id (P4).

Everything is a narrow map/filter — no shuffle; at 100 TB this stage is
pure scan-side work that fuses into one WholeStageCodegen span.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.scalar import (
    engagement_pct,
    engagement_score,
    engagement_seconds,
)
from ..schemas import CONTENT_ENVELOPE, ENGAGEMENT_ENVELOPE
from ..sources.cdc_feed import ISO_MICROS, ISO_MILLIS, ISO_OFFSET, ISO_SECONDS


def _pin(col: Column) -> Column:
    """Value-identical copy of ``col`` that the optimizer must treat as
    NONDETERMINISTIC (``shuffle`` of a one-element array always yields
    that element, but ``shuffle`` carries the nondeterministic flag),
    so the expression can never be substituted past, nor a dependent
    filter pushed across, the node that computes it.

    Why this exists (round 11, guide §4.4 — the duplicated-evaluation
    trap, native-expression edition): the unwrap filters reference the
    PARSED envelope, and predicate pushdown substitutes the entire
    to_json→from_json→try_cast chain into the predicate and lands it
    below the feed's repartition — the whole JSON round-trip then runs
    (a) once per consumer per row and (b) inside the single-partition
    scan stage, serializing the most expensive expression in the
    engine onto one task (measured at sf0.1: unwrap 1.71 s with the
    pushed filter vs 0.85 s pinned, against a 0.65 s filterless
    floor).  The filter itself prunes only ~1% of rows (malformed +
    id-less records), so pushing it below the exchange saves ~1% of
    exchange bytes while multiplying parse CPU at ANY scale — pinning
    above the exchange is strictly better.  A ``rand() >= -1``
    tautology does NOT work here: Catalyst folds it away and the
    filter slides back onto the scan.  Task retries stay safe — the
    expression's VALUE never depends on the shuffle draw (one-element
    array).

    Second refinement (same round): the pin wraps the ``from_json``
    STRUCT itself, not the filtered column.  Pinning only the filter
    column kept the filter above the exchange but still let
    CollapseProject substitute the parse chain into the predicate AND
    into every output projection — ``from_json`` appeared 3× in the
    physical plan and ran ~2× per surviving row.  With the pin on the
    parse, the struct is nondeterministic, so the optimizer may
    neither inline it into its many consumers nor push the (now
    plain, deterministic) null-id filter through the projection that
    computes it: the parse runs exactly once per row, field accesses
    downstream are struct reads.  Measured at sf0.1 (min-of-5,
    interleaved): unwrap 0.472 s pin-on-filter → 0.295 s
    pin-on-parse; plan ``from_json`` count 3 → 1."""
    return F.element_at(F.shuffle(F.array(col)), 1)


def parse_event_ts(c: Column) -> Column:
    """P3 — multi-format timestamp parse; unknown formats → null.

    Mirrors ESJ:206-233 (ISO-offset, then micro/milli/second local
    forms).  ``try_to_timestamp`` returns null instead of raising, the
    Spark analog of the reference's catch-and-null.

    Dispatches on string LENGTH first — the four wire formats render
    at distinct fixed widths (offset +HH:MM → 25, micros → 26,
    millis → 23, seconds → 19), so one parse attempt handles the
    common case (a blind coalesce chain pays up to three internal
    parse failures per row; measured ~17% off the parse expression).
    The full four-way chain remains the final fallback for EVERY row,
    so any string the dispatched pattern fails on (e.g. a 25-char
    micros form with 5 fractional digits — 'SSSSSS' accepts 1-6
    digits, so widths are not a partition of the accepted language)
    still parses exactly as the plain chain would.  Fast path cost is
    unchanged: coalesce evaluates lazily, so a dispatch hit never
    reaches the fallback.
    """
    chain = F.coalesce(
        F.try_to_timestamp(c, F.lit(ISO_OFFSET)),
        F.try_to_timestamp(c, F.lit(ISO_MICROS)),
        F.try_to_timestamp(c, F.lit(ISO_MILLIS)),
        F.try_to_timestamp(c, F.lit(ISO_SECONDS)),
    )
    n = F.length(c)
    return F.coalesce(
        F.when(n == 25, F.try_to_timestamp(c, F.lit(ISO_OFFSET))),
        F.when(n == 26, F.try_to_timestamp(c, F.lit(ISO_MICROS))),
        F.when(n == 23, F.try_to_timestamp(c, F.lit(ISO_MILLIS))),
        F.when(n == 19, F.try_to_timestamp(c, F.lit(ISO_SECONDS))),
        chain,
    )


def unwrap_engagement(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """P1+P2+P3+P5/F1 — envelope unwrap, field extraction, ts parse.

    Input: one JSON string per change record.  Output columns:
    event_id, user_id, content_id (long), event_type, device,
    duration_ms (long), event_ts (timestamp), raw_payload, source_ts_ms.
    Malformed JSON and records with no id are dropped (ESJ:200-203).
    """
    # the pin makes the parse single-evaluation and un-pushable — the
    # most expensive expression in the engine runs once per row, above
    # the feed's exchange (see _pin)
    parsed = raw.select(
        _pin(F.from_json(F.col(value_col), ENGAGEMENT_ENVELOPE)).alias("m")
    )
    # payload.after when enveloped; else the record sits at the root
    rec = F.coalesce(
        F.col("m.payload.after"),
        F.struct(
            "m.id", "m.user_id", "m.content_id", "m.event_type",
            "m.device", "m.duration_ms", "m.event_ts", "m.raw_payload",
        ),
    ).alias("r")
    out = parsed.select(rec, F.col("m.payload.source.ts_ms").alias("source_ts_ms"))
    return (
        out.select(
            F.col("r.id").try_cast("long").alias("event_id"),
            F.col("r.user_id").try_cast("long").alias("user_id"),
            F.col("r.content_id").try_cast("long").alias("content_id"),
            F.col("r.event_type").alias("event_type"),
            F.col("r.device").alias("device"),
            F.col("r.duration_ms").alias("duration_ms"),
            parse_event_ts(F.col("r.event_ts")).alias("event_ts"),
            F.col("r.raw_payload").alias("raw_payload"),
            F.col("source_ts_ms"),
        )
        .where(F.col("event_id").isNotNull())  # F1/F2 (parse pinned above)
    )


def unwrap_content(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """P4+F3+F4 — content envelope unwrap with delete routing.

    Upserts project the after-image; deletes (``op in ('d','D')``)
    carry only ``before.id`` and set ``is_delete`` (ESJ:244-270).
    Rows without an id are dropped (ESJ:269).
    """
    parsed = raw.select(
        _pin(F.from_json(F.col(value_col), CONTENT_ENVELOPE)).alias("m")
    )  # single-evaluation parse — see _pin
    op = F.col("m.payload.op")
    is_delete = F.lower(op) == "d"  # F3
    rec = F.coalesce(
        F.col("m.payload.after"),
        F.struct("m.id", "m.slug", "m.title", "m.content_type", "m.length_seconds", "m.publish_ts"),
    )
    out = parsed.select(
        F.when(is_delete, F.col("m.payload.before.id")).otherwise(rec["id"]).try_cast("long").alias("id"),
        rec["slug"].alias("slug"),
        rec["title"].alias("title"),
        rec["content_type"].alias("content_type"),
        rec["length_seconds"].alias("length_seconds"),
        is_delete.alias("is_delete"),
        F.col("m.payload.source.ts_ms").alias("source_ts_ms"),
    )
    return out.where(F.col("id").isNotNull())  # F4 (parse pinned above)


def enriched_columns(df: DataFrame) -> DataFrame:
    """P6-P8 — derived engagement metrics on an already-joined frame."""
    return (
        df.withColumn("engagement_seconds", engagement_seconds(F.col("duration_ms")))
        .withColumn("engagement_pct", engagement_pct(F.col("duration_ms"), F.col("length_seconds")))
        .withColumn("engagement_score", engagement_score(F.col("event_type"), F.col("duration_ms")))
    )
