"""Activity-trend similarity over the event stream — "which entities
behave alike?": per-entity event-count time series on a shared grid,
ranked by Pearson correlation against a query entity.  The behavioral
cohort-discovery query of the warehouse layer (cf. the distributed
time-series / trajectory similarity-search line of work retrieved in
PAPERS.md — EDBT'19 streaming series similarity, ICDE'21 REPOSE), on
the same vector machinery the embedding operators use.

Scale shape, deliberately 100 TB-first:

- the series matrix is (entities × grid), never (events × anything):
  one combinable (entity, bucket) count aggregation, then one
  per-entity fold into a dense array on the SHARED grid — grid length
  grows with the time span (bounded: 30 d of hourly buckets = 720),
  not with event volume;
- grid bounds are a 1-row aggregate (broadcast scalar); the query
  entity's z-normalized series is one broadcast row;
- correlation is the closed form (Σxy − H·x̄·ȳ) / (H·σx·σy) over
  native array folds — dot product via ``zip_with``+``aggregate``,
  moments as scalar expressions; no UDF, no shuffle beyond the one
  count aggregation;
- zero-variance series (constant activity) are excluded — correlation
  is undefined there, and silently returning NaN would corrupt the
  ranking.

Exact-model tested: a numpy recomputation from independently
aggregated (DuckDB) counts reproduces every returned correlation and
the full ranking (tests/test_timeseries.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.vector import dot

BUCKET_SECONDS = {"hour": 3600, "day": 86400}


def activity_series(
    events: DataFrame, entity_col: str = "user_id", bucket: str = "day"
) -> DataFrame:
    """(entity, series array<double>, n_events) — per-entity event
    counts on the global ``bucket`` grid spanning [min(ts), max(ts)].

    The dense fold is ``transform(sequence(0, H−1), i →
    coalesce(m[i], 0))`` over a ``map_from_entries`` of the entity's
    sparse counts — grid-sized per entity, built map-side after one
    combinable count shuffle."""
    if bucket not in BUCKET_SECONDS:
        raise ValueError(f"bucket must be one of {sorted(BUCKET_SECONDS)}, got {bucket!r}")
    step = BUCKET_SECONDS[bucket]
    b = F.floor(F.unix_timestamp("ts") / step).cast("long")
    counts = (
        events.select(F.col(entity_col).alias("entity"), b.alias("b"))
        .groupBy("entity", "b")
        .agg(F.count("*").alias("cnt"))
    )
    bounds = counts.agg(
        F.min("b").alias("b0"), (F.max("b") - F.min("b") + 1).alias("h")
    )
    dense = F.transform(
        F.sequence(F.lit(0), (F.col("h") - 1).cast("int")),
        lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0).cast("long")).cast(
            "double"
        ),
    )
    return (
        counts.crossJoin(F.broadcast(bounds))
        .groupBy("entity", "b0", "h")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct((F.col("b") - F.col("b0")).cast("int"), "cnt"))
            ).alias("m"),
            F.sum("cnt").alias("n_events"),
        )
        .select("entity", dense.alias("series"), "n_events")
    )


def _moments(series_col, h):
    """(mean, std) of a series as scalar expressions (population σ —
    the H factors cancel in the correlation, they just need to agree
    with the test model)."""
    mean = F.aggregate(series_col, F.lit(0.0), lambda a, x: a + x) / h
    var = (
        F.aggregate(series_col, F.lit(0.0), lambda a, x: a + x * x) / h - mean * mean
    )
    return mean, F.sqrt(F.greatest(var, F.lit(0.0)))


def similar_activity_topk(
    events: DataFrame,
    query_entity: int,
    k: int = 5,
    entity_col: str = "user_id",
    bucket: str = "day",
) -> DataFrame:
    """Top-k entities by Pearson correlation of their activity series
    against ``query_entity``'s (query excluded; zero-variance series
    excluded — correlation is undefined on a constant).  Deterministic
    total order: (6dp correlation DESC, entity).

    corr = (Σ q·c − H·q̄·c̄) / (H·σq·σc) — one broadcast of the query
    row against the series table, all folds native."""
    series = activity_series(events, entity_col, bucket)
    h = F.size("series").cast("double")
    mean, std = _moments(F.col("series"), h)
    stats = series.select(
        "entity", "series", "n_events", h.alias("hh"), mean.alias("mu"), std.alias("sd")
    ).where(F.col("sd") > 0)
    # resolve the query row eagerly: an absent or zero-variance query
    # must fail LOUDLY, not return an empty frame that reads as "no
    # similar entities" — and inlining its (grid-sized, bounded)
    # series as literals keeps the scored plan to a single pass over
    # the stats lineage instead of re-aggregating it broadcast-side
    qrows = stats.where(F.col("entity") == query_entity).collect()
    if not qrows:
        raise ValueError(
            f"query entity {query_entity!r} is absent or has zero-variance "
            "activity — correlation is undefined; pick an entity with events "
            "in at least two distinct buckets"
        )
    qs = [float(x) for x in qrows[0]["series"]]
    qmu, qsd = float(qrows[0]["mu"]), float(qrows[0]["sd"])
    qcol = F.array(*[F.lit(x) for x in qs])
    corr = (dot(F.col("series"), qcol) - F.col("hh") * F.col("mu") * F.lit(qmu)) / (
        F.col("hh") * F.col("sd") * F.lit(qsd)
    )
    scored = stats.where(F.col("entity") != query_entity).select(
        "entity", "n_events", F.round(corr, 6).alias("corr")
    )
    w = Window.orderBy(F.col("corr").desc(), "entity")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("entity", "rnk", "corr", "n_events")
    )


def activity_anomalies(
    events: DataFrame,
    entity_col: str = "user_id",
    bucket: str = "day",
    threshold: float = 3.0,
) -> DataFrame:
    """Per-entity anomalous activity buckets — the warehouse-layer
    outlier sweep ("which days was this user's behavior abnormal?"):
    a grid bucket whose event count deviates from ITS OWN entity's
    mean by ≥ ``threshold`` population σ flags, with the deviation
    reported as a z-score.  Self-normalized per entity, so a
    chronically busy service account and a quiet user are judged each
    against their own baseline, not a global one.

    Scale shape: the same single combinable (entity, bucket) count
    shuffle as ``activity_series``; moments are native array folds
    over the grid-sized series; flagging is a filter over
    ``posexplode`` of the dense series — rows out ∝ anomalies, and
    the intermediate is (entities × grid), never (events × anything).
    Zero-variance entities are excluded (z undefined on a constant —
    the ``similar_activity_topk`` rule).

    Output: (entity, bucket_idx, bucket_start timestamp, cnt, zscore)
    in deterministic (entity, bucket_idx) order; zscore rounded 6dp,
    signed (quiet-day dips flag too)."""
    series = activity_series(events, entity_col, bucket)  # validates bucket
    step = BUCKET_SECONDS[bucket]
    # activity_series folds the dense grid but drops b0; recompute the
    # shared origin with the same 1-row broadcast aggregate
    b = F.floor(F.unix_timestamp("ts") / step).cast("long")
    origin = events.select(b.alias("b")).agg(F.min("b").alias("b0"))
    h = F.size("series").cast("double")
    mean, std = _moments(F.col("series"), h)
    stats = series.select(
        "entity", "series", mean.alias("mu"), std.alias("sd")
    ).where(F.col("sd") > 0)
    z = (F.col("cnt") - F.col("mu")) / F.col("sd")
    return (
        stats.select(
            "entity",
            "mu",
            "sd",
            F.posexplode("series").alias("bucket_idx", "cnt"),
        )
        # the threshold applies to the ROUNDED z-score (the reported
        # value): summation-order float noise at an exact boundary
        # (|z| == threshold) must not flip the verdict between engines
        .where(F.abs(F.round(z, 6)) >= threshold)
        .crossJoin(F.broadcast(origin))
        .select(
            "entity",
            "bucket_idx",
            F.timestamp_seconds((F.col("b0") + F.col("bucket_idx")) * step).alias(
                "bucket_start"
            ),
            F.col("cnt").cast("long").alias("cnt"),
            F.round(z, 6).alias("zscore"),
        )
        .orderBy("entity", "bucket_idx")
    )
