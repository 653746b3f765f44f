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


def _unknown_range_df(spark):
    """Deterministic unknown-range fixture: values spanning 9 orders of
    magnitude, both signs, exact zeros — everything the fixed-bin
    state cannot take without domain knowledge."""
    import math
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(4000):
        g = "a" if i % 2 == 0 else "b"
        r = rnd.random()
        if r < 0.05:
            v = 0.0
        else:
            v = math.exp(rnd.uniform(-9.0, 11.0)) * (1 if rnd.random() < 0.8 else -1)
        rows.append((g, v))
    return rows, spark.createDataFrame(rows, "grp string, v double")


def test_log_histogram_quantile_relative_error_bound(spark):
    """Unknown-range column: every estimate must land within the
    DDSketch-style alpha relative-error bound of the exact rank-q
    element — with NO lo/hi given up front."""
    alpha = 0.01
    rows, df = _unknown_range_df(spark)
    state = sketches.log_histogram_state(df, "v", ["grp"], alpha=alpha)
    qs = [0.05, 0.5, 0.9, 0.99]
    est = {
        (r["grp"], r["q"]): r["quantile"]
        for r in sketches.log_histogram_quantiles(state, ["grp"], qs, alpha=alpha).collect()
    }
    import math

    for g in ("a", "b"):
        vals = sorted(v for gg, v in rows if gg == g)
        for q in qs:
            exact = vals[math.ceil(q * len(vals)) - 1]
            got = est[(g, q)]
            if abs(exact) < 1e-9:
                assert abs(got) < 1e-9, (g, q, got, exact)
            else:
                rel = abs(got - exact) / abs(exact)
                assert rel <= alpha + 1e-9, (g, q, got, exact, rel)


def test_log_histogram_merge_order_invariant(spark):
    """Bucket boundaries are absolute powers of gamma, so states from
    arbitrary splits merge by plain addition into the identical state
    — no re-binning, any order (the property the fixed-bin state
    could only offer within one declared range)."""
    _rows, df = _unknown_range_df(spark)
    parts = [
        sketches.log_histogram_state(
            df.where(F.abs(F.hash("v")) % 3 == i), "v", ["grp"]
        )
        for i in range(3)
    ]
    m_ab_c = sketches.merge_histogram_states(
        sketches.merge_histogram_states(parts[0], parts[1], ["grp"]), parts[2], ["grp"]
    )
    m_c_ba = sketches.merge_histogram_states(
        parts[2], sketches.merge_histogram_states(parts[1], parts[0], ["grp"]), ["grp"]
    )
    full = sketches.log_histogram_state(df, "v", ["grp"])
    a = sorted(tuple(r) for r in m_ab_c.collect())
    b = sorted(tuple(r) for r in m_c_ba.collect())
    c = sorted(tuple(r) for r in full.collect())
    assert a == b == c and a


def test_streaming_quantile_sink_equals_batch(spark, sf_dir, tmp_path):
    """Multi-batch replay (out of event-time order) through
    start_quantile_sink must land the identical log-bucketed state —
    and therefore identical quantile readouts — as one batch build:
    absolute buckets + additive merge are order-independent."""
    import os

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import pipeline as sp

    enr = _enriched(spark, sf_dir).persist()
    feed = str(tmp_path / "qfeed")
    os.makedirs(feed)
    for fname, i in (("b.parquet", 1), ("a.parquet", 0), ("c.parquet", 2)):
        enr.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{feed}/{fname}")
    state_dir = str(tmp_path / "q_state")
    stream = (
        spark.readStream.schema(enr.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/*")
    )
    q_ = sp.start_quantile_sink(stream, state_dir, str(tmp_path / "ck_q"))
    q_.processAllAvailable()
    q_.stop()

    got_state = sorted(
        (r["event_type"], r["bin"], r["cnt"])
        for r in spark.read.parquet(state_dir).collect()
    )
    want_state = sorted(
        tuple(r)
        for r in sketches.log_histogram_state(enr, "engagement_score", ["event_type"]).collect()
    )
    assert got_state == want_state and got_state

    got_q = sorted(
        tuple(r)
        for r in sketches.log_histogram_quantiles(
            spark.read.parquet(state_dir), ["event_type"], QS
        ).collect()
    )
    want_q = sorted(
        tuple(r)
        for r in sketches.log_histogram_quantiles(
            sketches.log_histogram_state(enr, "engagement_score", ["event_type"]),
            ["event_type"],
            QS,
        ).collect()
    )
    assert got_q == want_q and got_q
    enr.unpersist()


# --- topK state (parallel space-saving) -------------------------------------


def _true_counts(enr):
    return {
        (r["event_type"], r["content_id"]): r["c"]
        for r in enr.groupBy("event_type", "content_id").agg(F.count("*").alias("c")).collect()
    }


def test_topk_state_no_truncation_is_exact_any_segmentation(spark, sf_dir):
    """With m >= distinct items per group, merged states in any
    segmentation/order equal the exact groupBy counts (lb == ub ==
    true) with dmax == 0."""
    enr = _enriched(spark, sf_dir)
    m = 1 + enr.select("content_id").distinct().count()
    segs = [enr.where(F.col("event_id") % 3 == i) for i in range(3)]
    # states are stored artifacts in the AggregatingMergeTree pattern —
    # materialize each (as parquet would) before merging
    states = [
        sketches.topk_state(s, "content_id", ["event_type"], m).localCheckpoint()
        for s in segs
    ]
    merged = sketches.merge_topk_states(
        sketches.merge_topk_states(states[2], states[0], ["event_type"], m),
        states[1], ["event_type"], m,
    )
    truth = _true_counts(enr)
    rows = merged.collect()
    assert len(rows) == len(truth)
    for r in rows:
        t = truth[(r["event_type"], r["item"])]
        assert r["lb"] == r["ub"] == t and r["dmax"] == 0, r


def test_topk_bounds_hold_under_aggressive_truncation(spark, sf_dir):
    """With tiny m the state truncates hard; every retained item's
    bounds must bracket its true count, every item with true count >
    dmax must be retained, and the guaranteed flag must only mark items
    certainly in the true top k."""
    enr = _enriched(spark, sf_dir)
    m, k = 8, 3
    segs = [enr.where(F.col("event_id") % 4 == i) for i in range(4)]
    st = sketches.topk_state(segs[0], "content_id", ["event_type"], m).localCheckpoint()
    for s in segs[1:]:
        st = sketches.merge_topk_states(
            st, sketches.topk_state(s, "content_id", ["event_type"], m).localCheckpoint(),
            ["event_type"], m,
        ).localCheckpoint()
    truth = _true_counts(enr)
    by_group = {}
    for (et, item), c in truth.items():
        by_group.setdefault(et, {})[item] = c
    state_rows = st.collect()
    retained = {(r["event_type"], r["item"]) for r in state_rows}
    dmax_by_group = {r["event_type"]: r["dmax"] for r in state_rows}
    for r in state_rows:
        t = truth[(r["event_type"], r["item"])]
        assert r["lb"] <= t <= r["ub"], (r, t)
    for (et, item), c in truth.items():
        if c > dmax_by_group.get(et, 0):
            assert (et, item) in retained, (et, item, c, dmax_by_group.get(et))
    for r in sketches.topk_from_state(st, ["event_type"], k).collect():
        if r["guaranteed"]:
            grp = by_group[r["event_type"]]
            true_topk_floor = sorted(grp.values(), reverse=True)[: k][-1]
            assert truth[(r["event_type"], r["item"])] >= true_topk_floor, r


def test_topk_increment_matches_single_build(spark, sf_dir, tmp_path):
    """Stored-state fold (merge_topk_increment) over batches ==
    one-shot state over the union, when m is generous enough that no
    truncation occurs."""
    enr = _enriched(spark, sf_dir)
    m = 1 + enr.select("content_id").distinct().count()
    path = str(tmp_path / "topk_state")
    for i in range(3):
        sketches.merge_topk_increment(
            spark, path, enr.where(F.col("event_id") % 3 == i),
            "content_id", ["event_type"], m,
        )
    got = sorted(
        (r["event_type"], r["item"], r["lb"], r["ub"])
        for r in spark.read.parquet(path).collect()
    )
    want = sorted(
        (r["event_type"], r["item"], r["lb"], r["ub"])
        for r in sketches.topk_state(enr, "content_id", ["event_type"], m).collect()
    )
    assert got == want


def test_uniques_overlap_inclusion_exclusion_accuracy(spark, sf_dir):
    """HLL inclusion-exclusion overlap vs exact pairwise intersections:
    within 5% of |A|+|B| (the union-estimate error scale)."""
    enr = _enriched(spark, sf_dir)
    state = sketches.hourly_uniques_state(enr)
    got = {
        (r["a"], r["b"]): r
        for r in sketches.uniques_overlap(state, "event_type").collect()
    }
    sets = {
        r["event_type"]: set()
        for r in enr.select("event_type").distinct().collect()
    }
    for r in enr.select("event_type", "user_id").distinct().collect():
        sets[r["event_type"]].add(r["user_id"])
    assert got
    for (a, b), r in got.items():
        inter = len(sets[a] & sets[b])
        tol = max(5, 0.05 * (len(sets[a]) + len(sets[b])))
        assert abs(r["uniq_overlap"] - inter) <= tol, (a, b, r, inter)
        assert abs(r["uniq_union"] - len(sets[a] | sets[b])) <= tol


def test_streaming_topk_sink_equals_batch_state(spark, sf_dir, tmp_path):
    """Streamed topK maintenance ≡ one-shot state over the union (m
    generous so no truncation), and the guaranteed top-k readout equals
    the exact counts' top-k."""
    import os

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import pipeline as sp

    enr = _enriched(spark, sf_dir).persist()
    m = 1 + enr.select("content_id").distinct().count()
    feed = str(tmp_path / "topk_feed")
    os.makedirs(feed)
    for fname, i in (("a.parquet", 0), ("b.parquet", 1), ("c.parquet", 2)):
        enr.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{feed}/{fname}")
    stream = (
        spark.readStream.schema(enr.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/*")
    )
    state_dir = str(tmp_path / "topk_state_stream")
    q = sp.start_topk_sink(stream, state_dir, str(tmp_path / "ck_topk"), m=m)
    q.processAllAvailable()
    q.stop()

    got = sorted(
        (r["event_type"], r["item"], r["lb"], r["ub"])
        for r in spark.read.parquet(state_dir).collect()
    )
    want = sorted(
        (r["event_type"], r["item"], r["lb"], r["ub"])
        for r in sketches.topk_state(enr, "content_id", ["event_type"], m).collect()
    )
    assert got == want


def test_uniq_up_to_matches_duckdb(spark, sf_dir, ducks):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.sketches import uniq_up_to

    eng = entrymod._engagement(spark, sf_dir)
    for n in (3, 50, 10_000):
        sdf = eng.groupBy("event_type").agg(
            uniq_up_to(F.col("user_id"), n).alias("uniq_capped")
        )
        srows = [tuple(r) for r in sdf.collect()]
        res = ducks.sql(
            q(
                "SELECT event_type, "
                f"least(count(DISTINCT user_id), {n + 1})::BIGINT AS uniq_capped "
                "FROM engagement GROUP BY event_type"
            )
        )
        problems = compare(
            sdf.columns, srows, [d[0] for d in res.description], res.fetchall()
        )
        assert not problems, f"n={n}: " + " | ".join(problems)
        assert srows
    # the cap genuinely binds at n=3 on this fixture
    capped = dict(
        (r[0], r[1])
        for r in eng.groupBy("event_type")
        .agg(uniq_up_to(F.col("user_id"), 3).alias("u"))
        .collect()
    )
    assert all(v == 4 for v in capped.values())
