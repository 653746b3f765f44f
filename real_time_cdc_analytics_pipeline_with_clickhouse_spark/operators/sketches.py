"""Mergeable aggregate states — the ClickHouse AggregatingMergeTree
analog (SURVEY.md §2.6 note on approximate aggregates).

The reference's warehouse layer keeps *partial aggregate states* in a
materialized view and re-merges them at read time: its hourly MV
literally stores ``sumState(...)`` inside a SummingMergeTree
(clickhouse-init.sql:36), and the standard companion pattern in that
warehouse is ``uniqState``/``quantileState`` re-merged with
``uniqMerge``/``quantileMerge`` — a rollup kept at hour grain can then
answer day/month distinct-count and quantile questions WITHOUT
rescanning facts.  The additive-sum half of that pattern already lives
in ``warehouse.merge_rollup_increment``; this module supplies the
non-additive half with Spark-native mergeable states:

- **distinct counts** — Apache DataSketches HLL sketches via
  ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``:
  a binary, column-storable state that re-merges at any grain (hour →
  day → total) with no fact rescan.  At 100 TB this is the only way a
  "distinct users per hour, re-groupable to any window" query stays a
  rollup-table read instead of a full shuffle of user_ids.
- **quantiles** — a fixed-bin histogram state in LONG form
  ``(keys…, bin, cnt)``: merge = plain additive sum (commutative,
  associative, bit-exact — the same DECIMAL-style guarantee as the
  additive rollup), estimate = read-time cumulative interpolation for
  ANY q.  Deterministic, so unlike t-digest/KLL it is exactly
  DuckDB-twinnable (tests/test_sketches.py).

Scale shape: states live at rollup-key cardinality (hours ×
event_types, bins), never fact cardinality; every merge is a
combinable hash aggregate; nothing here shuffles the fact table more
than once.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from ..warehouse import _stage_swap

# 2^12 registers ≈ 1.6 % relative standard error — the DataSketches
# default, matching ClickHouse uniq()'s ~1.6 % accuracy class.
DEFAULT_LGK = 12

_UNIQ_KEY = ["hour_ts", "event_type"]


def hourly_uniques_state(enriched: DataFrame, lgk: int = DEFAULT_LGK) -> DataFrame:
    """The uniqState MV: per (hour, event_type), an HLL sketch of the
    distinct user_ids plus the plain event count.  The sketch column is
    BINARY and parquet-storable; ``merge_uniques_to`` re-merges it to
    any coarser grain."""
    return enriched.groupBy(
        F.date_trunc("hour", F.col("event_ts")).alias("hour_ts"),
        "event_type",
    ).agg(
        F.hll_sketch_agg("user_id", F.lit(lgk)).alias("uniq_users_state"),
        F.count("*").alias("cnt"),
    )


def merge_uniques_to(state: DataFrame, keys: list[str]) -> DataFrame:
    """uniqMerge: re-group stored sketches to a coarser grain (e.g.
    ``[date_trunc('day', hour_ts)]`` or ``['event_type']`` or ``[]``
    for a global count).  Sketch union is lossless re-aggregation —
    the estimate equals sketching the raw facts directly (tested)."""
    grouped = state.groupBy(*keys) if keys else state.groupBy()
    return grouped.agg(
        F.hll_union_agg("uniq_users_state").alias("uniq_users_state"),
        F.sum("cnt").alias("cnt"),
    )


def estimate_uniques(state: DataFrame) -> DataFrame:
    """Read-time estimate: replace the binary state with its distinct
    count (the uniqMerge() SELECT surface)."""
    return state.withColumn(
        "uniq_users", F.hll_sketch_estimate("uniq_users_state")
    ).drop("uniq_users_state")


def write_uniques_state(enriched: DataFrame, path: str, lgk: int = DEFAULT_LGK) -> None:
    hourly_uniques_state(enriched, lgk).write.mode("overwrite").parquet(path)


def merge_uniques_increment(
    spark: SparkSession, path: str, new_enriched: DataFrame, lgk: int = DEFAULT_LGK
) -> None:
    """Fold a new fact batch into the stored uniqState table — the
    AggregatingMergeTree insert-trigger run at write time.  Sketch
    union is commutative/associative, so any increment order yields
    the same estimates as a full recompute (tested)."""
    import os

    if not os.path.isdir(path):  # bootstrap: first batch creates the table
        write_uniques_state(new_enriched, path, lgk)
        return
    current = spark.read.parquet(path)
    merged = merge_uniques_to(
        current.unionByName(hourly_uniques_state(new_enriched, lgk)), _UNIQ_KEY
    )
    _stage_swap(merged, path)


# --- fixed-bin histogram state (the quantileState analog) ------------------


def histogram_state(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    lo: float,
    hi: float,
    nbins: int = 128,
) -> DataFrame:
    """Histogram partial state ``(keys…, bin, cnt)`` over
    ``value_col``: bin = clamp(floor((v - lo) / w), 0, nbins-1) with
    w = (hi - lo) / nbins; out-of-range values clamp into the edge
    bins, NULLs are excluded (quantile semantics ignore NULLs).

    LONG form makes the merge a plain additive groupBy-sum — exactly
    mergeable in any order, streaming-update friendly, and trivially
    oracle-checkable — at the cost of fixed bounds (the usual
    histogram-state trade; pick lo/hi from the domain, e.g. the score
    expression's known [0, 7.5] range)."""
    if nbins <= 0 or hi <= lo:
        raise ValueError("need nbins > 0 and hi > lo")
    w = (hi - lo) / nbins
    v = F.col(value_col).cast("double")
    bin_ = F.greatest(
        F.lit(0),
        F.least(F.lit(nbins - 1), F.floor((v - F.lit(lo)) / F.lit(w)).cast("int")),
    )
    return (
        df.where(v.isNotNull())
        .groupBy(*keys, bin_.alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )


def merge_histogram_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """quantileMerge's storage half: histogram states are additive."""
    return (
        a.unionByName(b).groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    keys: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    nbins: int = 128,
) -> DataFrame:
    """Read-time quantile estimates from a histogram state: for each q,
    the first bin whose cumulative count reaches ceil(q · total), with
    linear interpolation inside the bin.  Deterministic (integer
    cumulative counts, one float expression at the end), so the DuckDB
    twin reproduces it bit-for-bit.

    Output: ``(keys…, q, quantile)`` — one row per key per requested q.

    Plan shape: one window cumsum + one equi-join against the per-key
    totals + a combinable ``min_by`` — all at histogram cardinality
    (keys × nbins), never fact cardinality."""
    if not all(0.0 < x <= 1.0 for x in qs):
        raise ValueError("quantiles must be in (0, 1]")
    w = (hi - lo) / nbins
    cum = F.sum("cnt").over(Window.partitionBy(*keys).orderBy("bin"))
    cdf = hist.withColumn("cum", cum)
    totals = hist.groupBy(*keys).agg(F.sum("cnt").alias("total"))
    qlit = F.explode(F.array(*[F.lit(float(x)) for x in qs])).alias("q")
    hit = (
        cdf.join(totals, keys)
        .select(*keys, "bin", "cnt", "cum", "total", qlit)
        .withColumn("target", F.ceil(F.col("q") * F.col("total")))
        .where(F.col("cum") >= F.col("target"))
        .groupBy(*keys, "q")
        .agg(F.min_by(F.struct("bin", "cnt", "cum", "target"), "bin").alias("_h"))
    )
    below = (F.col("_h.cum") - F.col("_h.cnt")).cast("double")  # count strictly before bin
    est = F.lit(lo) + F.lit(w) * (
        F.col("_h.bin").cast("double")
        + (F.col("_h.target").cast("double") - below) / F.col("_h.cnt").cast("double")
    )
    return hit.select(*keys, "q", F.round(est, 6).alias("quantile"))
