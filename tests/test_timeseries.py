"""Activity-trend similarity (operators/timeseries.py): the full
operator — grid, dense series, moments, correlation, ranking — must
be reproduced exactly by a numpy model over independently aggregated
(DuckDB) counts, and degenerate series must be excluded, not NaN'd."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import timeseries
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

QUERY = 7


def _numpy_model(ducks, query, k, step=86400):
    rows = ducks.execute(
        f"SELECT user_id, CAST(floor(epoch(ts) / {step}) AS BIGINT) AS b, count(*) "
        "FROM events GROUP BY 1, 2"
    ).fetchall()
    b0 = min(r[1] for r in rows)
    h = max(r[1] for r in rows) - b0 + 1
    mat = {}
    for u, b, c in rows:
        mat.setdefault(u, np.zeros(h))[b - b0] += c
    stats = {}
    for u, v in mat.items():
        mu, sd = v.mean(), v.std()
        if sd > 0:
            stats[u] = (v, mu, sd)
    qv, qmu, qsd = stats[query]
    out = []
    for u, (v, mu, sd) in stats.items():
        if u == query:
            continue
        corr = (float(np.dot(v, qv)) - h * mu * qmu) / (h * sd * qsd)
        out.append((u, round(corr, 6), int(mat[u].sum())))
    out.sort(key=lambda t: (-t[1], t[0]))
    return [(u, i + 1, c, n) for i, (u, c, n) in enumerate(out[:k])]


def test_similar_activity_matches_numpy_model(spark, sf_dir, ducks):
    events = load_table(spark, sf_dir, "events")
    got = [
        (r.entity, r.rnk, r.corr, r.n_events)
        for r in timeseries.similar_activity_topk(events, QUERY, k=10).collect()
    ]
    want = _numpy_model(ducks, QUERY, k=10)
    assert got == want and len(got) == 10


def test_constant_series_excluded_and_query_absent(spark, sf_dir, ducks):
    """An entity with IDENTICAL activity in every grid bucket has
    undefined correlation (σ = 0) and must be excluded from the
    ranking rather than surfacing as NaN; the query entity never
    ranks against itself."""
    events = load_table(spark, sf_dir, "events")
    b0, bmax = ducks.execute(
        "SELECT min(CAST(floor(epoch(ts)/86400) AS BIGINT)), "
        "max(CAST(floor(epoch(ts)/86400) AS BIGINT)) FROM events"
    ).fetchone()
    flat_id = 10**6
    flat = spark.range(b0, bmax + 1).select(
        (F.col("id") * 10**9).alias("event_id"),
        F.to_timestamp(F.from_unixtime(F.col("id") * 86400 + 43200)).alias("ts"),
        F.lit(flat_id).alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    ev2 = events.union(flat.select(*events.columns))
    res = timeseries.similar_activity_topk(ev2, QUERY, k=10**6).collect()
    ids = {r.entity for r in res}
    assert flat_id not in ids
    assert QUERY not in ids
    assert all(not math.isnan(r.corr) for r in res)

    # the flat entity really did land one event in every bucket
    ser = {
        r.entity: r.series
        for r in timeseries.activity_series(ev2).where(
            F.col("entity") == flat_id
        ).collect()
    }
    assert set(ser[flat_id]) == {1.0}


def test_bad_bucket_rejected(spark, sf_dir):
    import pytest

    events = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="bucket"):
        timeseries.similar_activity_topk(events, QUERY, bucket="week")


def test_absent_or_degenerate_query_entity_fails_loudly(spark, sf_dir):
    """A missing or zero-variance query entity must raise, not return
    an empty frame that reads as 'no similar entities'."""
    import pytest

    events = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="absent or has zero-variance"):
        timeseries.similar_activity_topk(events, 10**9)


def test_activity_anomalies_match_numpy_model(spark, sf_dir, ducks):
    """Every flagged (entity, bucket) — count, timestamp and 6dp
    z-score — must be reproduced exactly by a numpy model over
    independently aggregated DuckDB counts; zero-variance entities
    never flag; lowering the threshold only ADDS rows (monotone)."""
    events = load_table(spark, sf_dir, "events")
    step = 86400

    def numpy_flags(threshold):
        rows = ducks.execute(
            f"SELECT user_id, CAST(floor(epoch(ts) / {step}) AS BIGINT) AS b, count(*) "
            "FROM events GROUP BY 1, 2"
        ).fetchall()
        b0 = min(r[1] for r in rows)
        h = max(r[1] for r in rows) - b0 + 1
        mat = {}
        for u, b, c in rows:
            mat.setdefault(u, np.zeros(h))[b - b0] += c
        out = set()
        for u, v in mat.items():
            mu, sd = v.mean(), v.std()
            if sd == 0:
                continue
            for i, c in enumerate(v):
                z = (c - mu) / sd
                if abs(round(z, 6)) >= threshold:
                    out.add((u, i, (b0 + i) * step, int(c), round(z, 6)))
        return out

    for thr in (3.0, 2.0, 1.5):
        got = {
            (
                r.entity,
                r.bucket_idx,
                int(r.bucket_start.timestamp()),
                r.cnt,
                r.zscore,
            )
            for r in timeseries.activity_anomalies(events, threshold=thr).collect()
        }
        want = numpy_flags(thr)
        assert got == want, thr
        if thr <= 2.0:
            # the fixture's per-user grids top out under 3σ; the lower
            # thresholds must actually flag so the equality isn't vacuous
            assert got, thr
    assert numpy_flags(2.0) <= numpy_flags(1.5)
