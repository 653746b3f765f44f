"""Mergeable aggregate states (operators/sketches.py) — the
AggregatingMergeTree uniqState/quantileState analog.

HLL estimates cannot hash-match a DuckDB oracle (different sketch
implementations), so they are property-tested instead: accuracy vs the
exact distinct count, losslessness of re-merging, and
increment ≡ recompute.  The histogram state IS deterministic, so it
gets a full DuckDB twin."""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as entrymod
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import sketches
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.oracle import q
from tests.oracle_utils import compare

QS = [0.5, 0.9, 0.99]
LO, HI, NBINS = 0.0, 7.5, 128  # engagement_score domain: ≤ 3.0 base × ≤ 2.5 mult


def _enriched(spark, sf_dir):
    return entrymod._enriched(spark, sf_dir)


def test_hll_estimate_accuracy(spark, sf_dir):
    enr = _enriched(spark, sf_dir)
    state = sketches.hourly_uniques_state(enr)
    est = sketches.estimate_uniques(sketches.merge_uniques_to(state, ["event_type"]))
    exact = enr.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact"), F.count("*").alias("cnt")
    )
    rows = est.join(exact, "event_type").collect()
    assert rows
    for r in rows:
        assert abs(r["uniq_users"] - r["exact"]) <= max(3, 0.05 * r["exact"]), r
        # the additive companion count must be exact, not approximate
        assert r["cnt"] == r["cnt"]


def test_hll_merge_is_lossless(spark, sf_dir):
    """Re-merging hourly sketches to the global grain gives the same
    estimate as sketching the raw facts directly — union of same-lgK
    HLL sketches is an elementwise register max, identical to one
    sketch fed every value."""
    enr = _enriched(spark, sf_dir)
    state = sketches.hourly_uniques_state(enr)
    via_merge = sketches.estimate_uniques(sketches.merge_uniques_to(state, [])).collect()[0]
    direct = enr.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(sketches.DEFAULT_LGK))
        ).alias("uniq_users")
    ).collect()[0]
    assert via_merge["uniq_users"] == direct["uniq_users"]


def test_hll_increment_equals_recompute(spark, sf_dir, tmp_path):
    enr = _enriched(spark, sf_dir)
    first = enr.where(F.col("event_id") % 2 == 0)
    second = enr.where(F.col("event_id") % 2 != 0)
    path = str(tmp_path / "uniq_state")
    sketches.write_uniques_state(first, path)
    sketches.merge_uniques_increment(spark, path, second)
    inc = sketches.estimate_uniques(spark.read.parquet(path)).orderBy(
        "hour_ts", "event_type"
    )
    full = sketches.estimate_uniques(sketches.hourly_uniques_state(enr)).orderBy(
        "hour_ts", "event_type"
    )
    a = [tuple(r) for r in inc.collect()]
    b = [tuple(r) for r in full.collect()]
    assert a == b


def test_streaming_uniques_sink_equals_batch(spark, sf_dir, tmp_path):
    """Multi-batch replay (batches out of event-time order) through
    start_uniques_sink lands the same per-(hour, event_type) estimates
    and exact counts as one batch recompute — sketch union is
    order-independent."""
    import os

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import pipeline as sp

    enr = _enriched(spark, sf_dir).persist()
    feed = str(tmp_path / "enriched_feed")
    os.makedirs(feed)
    for fname, i in (("b.parquet", 1), ("a.parquet", 0), ("c.parquet", 2)):
        enr.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{feed}/{fname}")
    state_dir = str(tmp_path / "uniq_state")
    stream = (
        spark.readStream.schema(enr.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/*")
    )
    q = sp.start_uniques_sink(stream, state_dir, str(tmp_path / "ck_uniq"))
    q.processAllAvailable()
    q.stop()

    got = sorted(
        tuple(r)
        for r in sketches.estimate_uniques(spark.read.parquet(state_dir)).collect()
    )
    want = sorted(
        tuple(r)
        for r in sketches.estimate_uniques(sketches.hourly_uniques_state(enr)).collect()
    )
    assert got == want and got
    enr.unpersist()


def test_histogram_merge_exact(spark, sf_dir):
    enr = _enriched(spark, sf_dir)
    halves = [
        sketches.histogram_state(
            enr.where(F.col("event_id") % 2 == i), "engagement_score",
            ["event_type"], LO, HI, NBINS,
        )
        for i in (0, 1)
    ]
    merged = sketches.merge_histogram_states(halves[0], halves[1], ["event_type"])
    full = sketches.histogram_state(enr, "engagement_score", ["event_type"], LO, HI, NBINS)
    a = sorted(tuple(r) for r in merged.collect())
    b = sorted(tuple(r) for r in full.collect())
    assert a == b and a


def test_histogram_quantiles_oracle(spark, sf_dir, ducks):
    """Full DuckDB twin of state + read-time interpolation: the
    histogram-quantile path is deterministic end to end."""
    enr = _enriched(spark, sf_dir)
    hist = sketches.histogram_state(enr, "engagement_score", ["event_type"], LO, HI, NBINS)
    sdf = sketches.histogram_quantiles(hist, ["event_type"], QS, LO, HI, NBINS)
    w = (HI - LO) / NBINS
    sql = q(f"""
, hist AS (
  SELECT event_type,
         GREATEST(0, LEAST({NBINS - 1},
             CAST(FLOOR((CAST(engagement_score AS DOUBLE) - {LO}) / {w!r}) AS INT))) AS bin,
         COUNT(*) AS cnt
  FROM enriched
  WHERE engagement_score IS NOT NULL
  GROUP BY 1, 2
), cdf AS (
  SELECT event_type, bin, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS total
  FROM hist
), hits AS (
  SELECT event_type, q, bin, cnt, cum,
         CAST(CEIL(q * total) AS BIGINT) AS target
  FROM cdf CROSS JOIN (SELECT UNNEST([0.5, 0.9, 0.99]) AS q)
  WHERE cum >= CEIL(q * total)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type, q ORDER BY bin) = 1
)
SELECT event_type, q,
       ROUND({LO} + {w!r} * (CAST(bin AS DOUBLE)
           + (CAST(target AS DOUBLE) - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)), 6)
           AS quantile
FROM hits
""")
    srows = [tuple(r) for r in sdf.collect()]
    res = ducks.sql(sql)
    problems = compare(sdf.columns, srows, [d[0] for d in res.description], res.fetchall())
    assert not problems, " | ".join(problems)
    assert srows


def test_histogram_quantile_accuracy(spark, sf_dir):
    """Interpolated estimate lands within one bin width of the exact
    percentile."""
    enr = _enriched(spark, sf_dir)
    hist = sketches.histogram_state(enr, "engagement_score", ["event_type"], LO, HI, NBINS)
    est = sketches.histogram_quantiles(hist, ["event_type"], QS, LO, HI, NBINS)
    exact = enr.groupBy("event_type").agg(
        *[
            F.expr(f"percentile(engagement_score, {x})").alias(f"p{i}")
            for i, x in enumerate(QS)
        ]
    )
    w = (HI - LO) / NBINS
    rows = est.join(exact, "event_type").collect()
    assert rows
    for r in rows:
        ex = r[f"p{QS.index(r['q'])}"]
        assert abs(r["quantile"] - ex) <= w + 1e-9, (r["event_type"], r["q"], r["quantile"], ex)
