"""Warehouse physical-layout tests: monthly partition pruning + key
sort (the ClickHouse PARTITION BY toYYYYMM / ORDER BY analog)."""

from __future__ import annotations

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark import warehouse
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import cdc, enrich
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.plans.explain import plan_string
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


def _enriched(spark, sf_dir):
    events = cdc.unwrap_engagement(
        cdc_feed.engagement_cdc_json(load_table(spark, sf_dir, "events"))
    )
    dim = enrich.compact_dim_latest(
        cdc.unwrap_content(cdc_feed.content_cdc_json(load_table(spark, sf_dir, "part")))
    )
    return enrich.enrich_events(events, dim)


def test_month_partition_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "wh")
    enr = _enriched(spark, sf_dir)
    warehouse.write_warehouse(enr, path)

    sliced = warehouse.month_slice(spark, path, "202401")
    plan = plan_string(sliced)
    assert "PartitionFilters" in plan and "event_month" in plan, plan
    # every source event is in Jan 2024 → slice must equal the full table
    assert sliced.count() == enr.count()
    empty = warehouse.month_slice(spark, path, "209901")
    assert empty.count() == 0


def test_compaction_preserves_content_and_reduces_files(spark, sf_dir, tmp_path):
    """MergeTree-background-merge analog: many small files → few
    key-sorted files, identical logical content."""
    import glob

    path = str(tmp_path / "wh")
    enr = _enriched(spark, sf_dir)
    # simulate micro-batch append fragmentation: 20 files per month
    (
        enr.withColumn(warehouse.MONTH_COL, F.date_format("event_ts", "yyyyMM"))
        .repartition(20)
        .write.mode("overwrite")
        .partitionBy(warehouse.MONTH_COL)
        .parquet(path)
    )
    before_files = len(glob.glob(f"{path}/*/*.parquet"))
    before_rows = sorted(
        map(tuple, spark.read.parquet(path).select("event_id", "engagement_score").collect())
    )
    warehouse.compact_warehouse(spark, path)
    after_files = len(glob.glob(f"{path}/*/*.parquet"))
    after_rows = sorted(
        map(tuple, spark.read.parquet(path).select("event_id", "engagement_score").collect())
    )
    assert after_rows == before_rows
    assert after_files < before_files


def test_incremental_rollup_equals_full_recompute(spark, sf_dir, tmp_path):
    """SummingMergeTree insert-trigger analog: fold batches into the
    stored rollup; decimal partials make the result bit-identical to a
    full recompute regardless of batch boundaries."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import rollups

    path = str(tmp_path / "mv")
    enr = _enriched(spark, sf_dir)
    b1 = enr.where(F.col("event_id") % 3 == 0)
    b2 = enr.where(F.col("event_id") % 3 == 1)
    b3 = enr.where(F.col("event_id") % 3 == 2)
    warehouse.write_rollup(b1, path)
    warehouse.merge_rollup_increment(spark, path, b2)
    warehouse.merge_rollup_increment(spark, path, b3)
    from tests.oracle_utils import frame_rows

    got_df = warehouse.read_rollup(spark, path)
    want_df = rollups.hourly_rollup(enr).select(
        "hour_ts", "content_type", "event_type", "cnt", "total_score"
    )
    got = frame_rows(got_df.columns, [tuple(r) for r in got_df.collect()])
    want = frame_rows(want_df.columns, [tuple(r) for r in want_df.collect()])
    assert got == want


def test_key_sort_gives_rowgroup_stats(spark, sf_dir, tmp_path):
    """sortWithinPartitions(event_id) → parquet min/max stats act as a
    sparse index; a point lookup pushes the key filter to the scan."""
    path = str(tmp_path / "wh")
    warehouse.write_warehouse(_enriched(spark, sf_dir), path)
    lookup = warehouse.read_warehouse(spark, path).where(F.col("event_id") == 101)
    plan = plan_string(lookup)
    assert "PushedFilters" in plan and "EqualTo(event_id,101)" in plan
    assert lookup.count() == 1


def test_schema_evolution_merge_on_read(spark, sf_dir, tmp_path):
    """Downstream schema drift: a later month written with an extra
    column must be readable together with old months via mergeSchema —
    old rows surface the new column as null, no rewrite of history."""
    import pyspark.sql.functions as F

    wh = str(tmp_path / "wh_evolve")
    base = spark.range(10).select(
        F.col("id").alias("event_id"),
        F.lit("202401").alias("event_month"),
        (F.col("id") * 1.5).alias("score"),
    )
    base.write.partitionBy("event_month").parquet(wh)
    evolved = spark.range(10, 15).select(
        F.col("id").alias("event_id"),
        F.lit("202402").alias("event_month"),
        (F.col("id") * 1.5).alias("score"),
        F.lit("web").alias("platform"),  # new column appears in Feb
    )
    evolved.write.mode("append").partitionBy("event_month").parquet(wh)

    merged = spark.read.option("mergeSchema", "true").parquet(wh)
    assert "platform" in merged.columns
    assert merged.count() == 15
    jan = merged.where(F.col("event_month") == "202401")
    assert jan.where(F.col("platform").isNull()).count() == jan.count()
    feb = merged.where(F.col("event_month") == "202402")
    assert feb.where(F.col("platform") == "web").count() == 5


def _month_table(spark, wh):
    """Three months of synthetic enriched-shaped rows, written
    monthly-partitioned (Jan/Feb/Mar 2024, 100 rows each)."""
    df = spark.range(300).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 37).alias("user_id"),
        (F.col("id") % 11).alias("content_id"),
        F.lit("video").alias("content_type"),
        F.when(F.col("id") % 2 == 0, "play").otherwise("click").alias("event_type"),
        (F.col("id") % 7 * 0.5).alias("engagement_score"),
        F.to_timestamp(
            F.concat(
                F.lit("2024-0"),
                (F.col("id") % 3 + 1).cast("string"),
                F.lit("-"),
                F.lpad((F.col("id") % 27 + 1).cast("string"), 2, "0"),
                F.lit(" 10:00:00"),
            )
        ).alias("event_ts"),
    )
    warehouse.write_warehouse(df, wh)
    return df


def test_ttl_drops_whole_months_without_touching_survivors(spark, tmp_path):
    """TTL analog: months fully behind the cutoff vanish as whole
    partitions (no rewrite — surviving partition bytes are untouched),
    the boundary month is filtered in place, and the result equals a
    plain filter of the original table."""
    import glob
    import os

    wh = str(tmp_path / "wh_ttl")
    df = _month_table(spark, wh)
    cutoff = "2024-02-15 00:00:00"
    mar_files = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(f"{wh}/{warehouse.MONTH_COL}=202403/*.parquet")
    }

    res = warehouse.apply_ttl(spark, wh, cutoff)
    assert res["dropped_months"] == ["202401"]
    assert res["rewritten_month"] == "202402"

    got = sorted(
        r["event_id"] for r in spark.read.parquet(wh).select("event_id").collect()
    )
    want = sorted(
        r["event_id"]
        for r in df.where(F.col("event_ts") >= F.lit(cutoff)).select("event_id").collect()
    )
    assert got == want and res["rows_expired"] == 300 - len(want)
    # March bytes untouched: same files, same mtimes
    after = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(f"{wh}/{warehouse.MONTH_COL}=202403/*.parquet")
    }
    assert after == mar_files
    assert warehouse.list_month_partitions(wh) == ["202402", "202403"]


def test_ttl_group_by_preserves_aggregates_exactly_once(spark, tmp_path):
    """The ``TTL … GROUP BY`` analog: expired facts persist as per-run
    rollup partitions, so expired-rollup + rollup(survivors)
    reconstructs the full-history aggregate exactly — across TWO
    successive cutoffs, and bit-stable under a crash-retry replay of a
    run (the same cutoff re-applied is an idempotent partition
    rewrite, never a double fold)."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import rollups
    from tests.oracle_utils import frame_rows

    wh = str(tmp_path / "wh_ttl2")
    mv = str(tmp_path / "mv_ttl2")
    df = _month_table(spark, wh)
    warehouse.apply_ttl(spark, wh, "2024-02-01 00:00:00", rollup_path=mv)
    warehouse.apply_ttl(spark, wh, "2024-03-01 00:00:00", rollup_path=mv)
    # crash-retry replay of the second run
    warehouse.apply_ttl(spark, wh, "2024-03-01 00:00:00", rollup_path=mv)

    survivors = rollups.hourly_rollup(
        spark.read.parquet(wh).drop(warehouse.MONTH_COL)
    ).select("hour_ts", "content_type", "event_type", "cnt", "total_score")
    combined = (
        warehouse.read_ttl_rollup(spark, mv)
        .unionByName(survivors)
        .groupBy("hour_ts", "content_type", "event_type")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.round(F.sum("total_score"), 2).alias("total_score"),
        )
    )
    want_df = rollups.hourly_rollup(df).select(combined.columns)
    got = frame_rows(combined.columns, [tuple(r) for r in combined.collect()])
    want = frame_rows(want_df.columns, [tuple(r) for r in want_df.collect()])
    assert got == want


def test_ttl_past_everything_empties_the_table(spark, tmp_path):
    wh = str(tmp_path / "wh_ttl3")
    _month_table(spark, wh)
    res = warehouse.apply_ttl(spark, wh, "2030-01-01 00:00:00")
    assert warehouse.list_month_partitions(wh) == []
    assert res["rows_expired"] == 300


def test_zorder_key_matches_morton_reference(spark):
    """zorder_key must be the exact Morton interleave: bit b of column
    i at position b*ncols+i — checked against a Python reference over
    a deterministic grid."""
    def morton(vals, bits=16):
        out = 0
        for b in range(bits):
            for i, v in enumerate(vals):
                out |= ((v >> b) & 1) << (b * len(vals) + i)
        return out

    df = spark.range(256).selectExpr(
        "cast(id % 16 as long) AS x", "cast(id div 16 as long) AS y", "id"
    )
    got = {
        r["id"]: r["z"]
        for r in df.withColumn("z", warehouse.zorder_key("x", "y")).collect()
    }
    for i in range(256):
        assert got[i] == morton([i % 16, i // 16])

    import pytest as _pytest

    with _pytest.raises(ValueError):
        warehouse.zorder_key("a", "b", "c", "d", bits=16)


def test_zorder_compaction_clusters_both_dims(spark, sf_dir, tmp_path):
    """Z-ordered layout must tighten per-file min/max envelopes in BOTH
    clustering dimensions vs the flat event_id sort — the property
    that makes multi-column data skipping work.  Measured as the mean
    normalized (user_id span x content_id span) bounding box over
    equal row chunks; content equality with the unsorted table is also
    asserted."""
    path = str(tmp_path / "whz")
    enr = _enriched(spark, sf_dir)
    (
        enr.withColumn(warehouse.MONTH_COL, F.date_format("event_ts", "yyyyMM"))
        .repartition(20)
        .write.mode("overwrite")
        .partitionBy(warehouse.MONTH_COL)
        .parquet(path)
    )
    before_rows = sorted(
        map(tuple, spark.read.parquet(path).select("event_id", "user_id", "content_id").collect())
    )
    warehouse.compact_warehouse(spark, path, zorder_by=["user_id", "content_id"])
    after = spark.read.parquet(path)
    after_rows = sorted(
        map(tuple, after.select("event_id", "user_id", "content_id").collect())
    )
    assert after_rows == before_rows

    def mean_bbox(rows, chunk=64):
        spans = []
        for lo in range(0, len(rows), chunk):
            part = rows[lo : lo + chunk]
            us = [r[0] for r in part]
            cs = [r[1] for r in part]
            spans.append((max(us) - min(us)) * (max(cs) - min(cs)))
        return sum(spans) / len(spans)

    # one month, in stored (file) order vs event_id order
    month = after.where(F.col(warehouse.MONTH_COL) == after.select(F.max(warehouse.MONTH_COL)).first()[0])
    stored = [(r["user_id"], r["content_id"]) for r in month.select("user_id", "content_id").collect()]
    flat = [
        (r["user_id"], r["content_id"])
        for r in month.orderBy("event_id").select("user_id", "content_id").collect()
    ]
    assert mean_bbox(stored) < 0.5 * mean_bbox(flat), (mean_bbox(stored), mean_bbox(flat))


# --- projections (alternate pre-aggregated copies + routing) ----------------


def test_projection_routing_picks_smallest_and_matches_facts(spark, sf_dir, tmp_path):
    """The router must answer a covered grouping from the smallest
    qualifying projection and produce EXACTLY the fact-scan answer;
    an uncovered grouping falls back to facts."""
    wh = str(tmp_path / "wh_proj")
    proot = str(tmp_path / "projections")
    enr = _enriched(spark, sf_dir)
    warehouse.write_warehouse(enr, wh)
    warehouse.define_projection(spark, wh, proot, "by_hour_type", ["hour_ts", "event_type", "content_type"])
    warehouse.define_projection(spark, wh, proot, "by_type", ["event_type"])

    # covered by both → the 5-row by_type projection wins over the finer one
    df, src = warehouse.routed_aggregate(spark, wh, proot, ["event_type"])
    assert src == "by_type"
    got = sorted(map(tuple, df.collect()))
    facts, fsrc = warehouse.routed_aggregate(spark, wh, str(tmp_path / "empty_proj"), ["event_type"])
    assert fsrc == "facts"
    assert got == sorted(map(tuple, facts.collect()))

    # coarser-than-projection grouping re-aggregates the finer partials
    df2, src2 = warehouse.routed_aggregate(spark, wh, proot, ["content_type"])
    assert src2 == "by_hour_type"
    facts2, _ = warehouse.routed_aggregate(spark, wh, str(tmp_path / "empty_proj"), ["content_type"])
    nsort = lambda rows: sorted(rows, key=lambda t: tuple((v is None, v) for v in t))
    assert nsort(map(tuple, df2.collect())) == nsort(map(tuple, facts2.collect()))

    # not covered by any projection → facts
    _, src3 = warehouse.routed_aggregate(spark, wh, proot, ["user_id"])
    assert src3 == "facts"


def test_projection_refresh_equals_rebuild(spark, sf_dir, tmp_path):
    """Insert-time projection maintenance: additive DECIMAL folds over
    batches must be bit-identical to rebuilding the projection from the
    full fact history."""
    import pyspark.sql.functions as F

    wh = str(tmp_path / "wh_proj2")
    proot = str(tmp_path / "projections2")
    enr = _enriched(spark, sf_dir)
    b1 = enr.where(F.col("event_id") % 2 == 0)
    b2 = enr.where(F.col("event_id") % 2 == 1)
    warehouse.write_warehouse(b1, wh)
    warehouse.define_projection(spark, wh, proot, "by_type", ["event_type", "content_type"])
    warehouse.refresh_projections(spark, proot, b2)

    got, src = warehouse.routed_aggregate(spark, wh, proot, ["event_type", "content_type"])
    assert src == "by_type"
    warehouse.write_warehouse(enr, wh)  # full history
    want, _ = warehouse.routed_aggregate(spark, wh, str(tmp_path / "noproj"), ["event_type", "content_type"])
    nsort = lambda rows: sorted(rows, key=lambda t: tuple((v is None, v) for v in t))
    assert nsort(map(tuple, got.collect())) == nsort(map(tuple, want.collect()))


def test_streaming_projection_sink_equals_batch_rebuild(spark, sf_dir, tmp_path):
    """Streaming projection maintenance: after a multi-batch replay the
    projection partials must be bit-identical to a one-shot rebuild
    over the full history, and routing must still pick them up."""
    import os

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import pipeline as sp

    enr = _enriched(spark, sf_dir).persist()
    wh = str(tmp_path / "wh_pstream")
    proot = str(tmp_path / "proj_stream")
    # bootstrap: define projections over the FIRST batch only
    b0 = enr.where(F.col("event_id") % 3 == 0)
    warehouse.write_warehouse(b0, wh)
    warehouse.define_projection(spark, wh, proot, "by_type", ["event_type", "content_type"])

    feed = str(tmp_path / "proj_feed")
    os.makedirs(feed)
    for fname, i in (("b.parquet", 1), ("c.parquet", 2)):
        enr.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{feed}/{fname}")
    stream = (
        spark.readStream.schema(enr.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/*")
    )
    q = sp.start_projection_sink(stream, proot, str(tmp_path / "ck_proj"))
    q.processAllAvailable()
    q.stop()

    got, src = warehouse.routed_aggregate(spark, wh, proot, ["event_type", "content_type"])
    assert src == "by_type"
    whf = str(tmp_path / "wh_full")
    warehouse.write_warehouse(enr, whf)
    want, _ = warehouse.routed_aggregate(spark, whf, str(tmp_path / "noproj"), ["event_type", "content_type"])
    nsort = lambda rows: sorted(rows, key=lambda t: tuple((v is None, v) for v in t))
    assert nsort(map(tuple, got.collect())) == nsort(map(tuple, want.collect()))


def test_projection_refresh_is_bucket_scoped(spark, sf_dir, tmp_path):
    """Partition-scoped projection maintenance: a refresh whose delta
    hashes into few pbuckets must leave every OTHER bucket's files
    byte-untouched (mtime+size identical — the TTL survivor test's
    criterion), while the routed answer still equals a full rebuild."""
    import glob
    import os

    import pyspark.sql.functions as F

    wh = str(tmp_path / "wh_pscope")
    proot = str(tmp_path / "proj_pscope")
    enr = _enriched(spark, sf_dir).persist()
    one_user = enr.select("user_id").first()[0]
    base = enr.where(F.col("user_id") != one_user)
    delta = enr.where(F.col("user_id") == one_user)
    warehouse.write_warehouse(base, wh)
    warehouse.define_projection(spark, wh, proot, "by_user", ["user_id"])

    def snap():
        return {
            p: (os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(f"{proot}/by_user/pbucket=*/*.parquet")
        }

    before = snap()
    warehouse.refresh_projections(spark, proot, delta)
    after = snap()

    touched_bucket = delta.select(warehouse._pbucket(["user_id"]).alias("b")).first()[0]
    untouched_before = {p: v for p, v in before.items() if f"pbucket={touched_bucket}/" not in p}
    untouched_after = {p: v for p, v in after.items() if f"pbucket={touched_bucket}/" not in p}
    assert untouched_before and untouched_before == untouched_after

    warehouse.write_warehouse(enr, wh)
    got, src = warehouse.routed_aggregate(spark, wh, proot, ["user_id"])
    assert src == "by_user"
    want, _ = warehouse.routed_aggregate(spark, wh, str(tmp_path / "noproj"), ["user_id"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    enr.unpersist()


def test_projection_uniq_users_routes_and_matches_facts(spark, sf_dir, tmp_path):
    """Aggregate-spec projections (r4 verdict task #6): a projection
    carrying the uniqState HLL sketch must answer a distinct-users
    question identically to the fact scan — across incremental
    refreshes (sketch union is lossless) — and the router must skip
    cheaper projections that lack the requested aggregate."""
    import pyspark.sql.functions as F

    wh = str(tmp_path / "wh_uniqproj")
    proot = str(tmp_path / "proj_uniq")
    enr = _enriched(spark, sf_dir)
    b1 = enr.where(F.col("event_id") % 2 == 0)
    b2 = enr.where(F.col("event_id") % 2 == 1)
    warehouse.write_warehouse(b1, wh)
    # a SMALLER count/sum-only projection on the same keys: must lose
    # the route when uniq_users is requested despite being cheaper
    warehouse.define_projection(spark, wh, proot, "by_type_plain", ["event_type"])
    warehouse.define_projection(
        spark, wh, proot, "by_type_uniq", ["event_type", "content_type"],
        aggs=("cnt", "sum_score", "uniq_users"),
    )
    warehouse.refresh_projections(spark, proot, b2)
    warehouse.write_warehouse(enr, wh)  # full history for the facts route

    got, src = warehouse.routed_aggregate(
        spark, wh, proot, ["event_type"], aggs=("cnt", "uniq_users")
    )
    assert src == "by_type_uniq"
    want, fsrc = warehouse.routed_aggregate(
        spark, wh, str(tmp_path / "noproj"), ["event_type"], aggs=("cnt", "uniq_users")
    )
    assert fsrc == "facts"
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.columns == ["event_type", "cnt", "uniq_users"]

    # count/sum requests still prefer the smaller plain projection
    _, src2 = warehouse.routed_aggregate(spark, wh, proot, ["event_type"])
    assert src2 == "by_type_plain"

    # unknown aggregate fails loudly
    import pytest

    with pytest.raises(ValueError, match="unknown projection aggregates"):
        warehouse.routed_aggregate(spark, wh, proot, ["event_type"], aggs=("median",))


def test_bloom_filter_skip_index_analog(spark, tmp_path):
    """ClickHouse bloom_filter skip-index analog: bloom-enabled columns
    must actually serialize filters into the parquet files (bytes grow
    vs the identical bloom-less write) and lookups stay correct with
    the predicate pushed to the scan."""
    import glob
    import os

    wh_plain = str(tmp_path / "wh_nobloom")
    wh_bloom = str(tmp_path / "wh_bloom")
    df = _month_table(spark, wh_plain)  # writes plain
    warehouse.write_warehouse(df, wh_bloom, bloom_cols=["user_id", "content_id"])

    size = lambda p: sum(os.path.getsize(f) for f in glob.glob(f"{p}/*/*.parquet"))
    assert size(wh_bloom) > size(wh_plain), "bloom filters were not written"

    lookup = warehouse.read_warehouse(spark, wh_bloom).where(F.col("user_id") == 5)
    plan = plan_string(lookup)
    assert "PushedFilters" in plan and "EqualTo(user_id,5)" in plan
    want = df.where(F.col("user_id") == 5).count()
    assert lookup.count() == want and want > 0


def test_sample_by_deterministic_nested_and_pushed(spark, sf_dir, tmp_path, ducks):
    """SAMPLE BY analog: the stored sampling key must reproduce the
    portable hash exactly (DuckDB recomputation over the written
    parquet), sample reads must be deterministic and NESTED
    (0.1 ⊂ 0.25 ⊂ full), the cut predicate must reach the parquet
    scan, scaled count estimates must land near truth, and a table
    stored without a key must refuse loudly."""
    import pytest

    path = str(tmp_path / "wh_sample")
    enr = _enriched(spark, sf_dir)
    warehouse.write_warehouse(enr, path, sample_by="user_id")

    # stored key ≡ independent DuckDB recomputation of the same hash
    mism = ducks.execute(f"""
        SELECT count(*) FROM '{path}/*/*.parquet'
        WHERE _skey <> ('0x' || substr(md5('smp:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 10000
    """).fetchone()[0]
    assert mism == 0

    s10 = {r.event_id for r in warehouse.sample_scan(spark, path, 0.10).collect()}
    s10_again = {r.event_id for r in warehouse.sample_scan(spark, path, 0.10).collect()}
    s25 = {r.event_id for r in warehouse.sample_scan(spark, path, 0.25).collect()}
    full = warehouse.read_warehouse(spark, path).count()
    assert s10 == s10_again and s10
    assert s10 < s25 and len(s25) < full

    # all-or-nothing per sampling entity: a user is fully in or out
    by_user = (
        warehouse.sample_scan(spark, path, 0.25)
        .select("user_id")
        .distinct()
        .join(
            warehouse.read_warehouse(spark, path).groupBy("user_id").count(),
            "user_id",
        )
        .collect()
    )
    sampled_users = {r.user_id for r in by_user}
    total_in_sample = sum(r["count"] for r in by_user)
    assert total_in_sample == len(s25)
    assert sampled_users < {
        r.user_id for r in warehouse.read_warehouse(spark, path).select("user_id").distinct().collect()
    }

    plan = plan_string(warehouse.sample_scan(spark, path, 0.10))
    assert "PushedFilters" in plan and "_skey" in plan

    est = {
        r.event_type: r.est_count
        for r in warehouse.sampled_counts(spark, path, 0.25, ["event_type"]).collect()
    }
    truth = {
        r.event_type: r["count"]
        for r in warehouse.read_warehouse(spark, path).groupBy("event_type").count().collect()
    }
    for t, c in est.items():
        assert abs(c - truth[t]) / truth[t] < 0.5, (t, c, truth[t])

    nokey = str(tmp_path / "wh_nokey")
    warehouse.write_warehouse(enr, nokey)
    with pytest.raises(ValueError, match="sampling key"):
        warehouse.sample_scan(spark, nokey, 0.1)
    with pytest.raises(ValueError, match="fraction"):
        warehouse.sample_scan(spark, path, 0.0)


def test_sample_null_keys_and_resolution_guard(spark, tmp_path):
    """NULL sampling keys hash a sentinel — SAMPLE 1.0 must equal the
    full table even with NULL keys — and sub-resolution fractions
    refuse loudly; estimates scale by the EFFECTIVE cut, not the raw
    request."""
    import pytest

    rows = [(i, "2024-01-05 10:00:00", None if i % 4 == 0 else i % 7, "view")
            for i in range(400)]
    enr = spark.createDataFrame(
        rows, "event_id long, event_ts string, user_id long, event_type string"
    ).withColumn("event_ts", F.to_timestamp("event_ts"))
    path = str(tmp_path / "wh_null")
    warehouse.write_warehouse(enr, path, sample_by="user_id")

    assert warehouse.sample_scan(spark, path, 1.0).count() == 400
    # all-or-nothing holds for the NULL group too (one sentinel key)
    nulls_in = warehouse.sample_scan(spark, path, 0.5).where(
        F.col("user_id").isNull()
    ).count()
    assert nulls_in in (0, 100)

    with pytest.raises(ValueError, match="resolution"):
        warehouse.sample_scan(spark, path, 0.00004)

    # effective-fraction scaling: 0.00015 rounds to cut=2 (eff 2e-4)
    est = warehouse.sampled_counts(spark, path, 0.00015, ["event_type"])
    # scale factor must be 1/0.0002, not 1/0.00015 — verify via the
    # identity total: rows_in_sample / effective == est
    n_in = warehouse.sample_scan(spark, path, 0.00015).count()
    got_total = sum(r.est_count for r in est.collect())
    assert got_total == round(n_in / 0.0002)
