"""Serving lookup API (§3.3): getters must return the operator-computed
values and their predicates must prune/push into the scans."""

from __future__ import annotations

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark import serving
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import rollups
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.plans.explain import plan_string

import __spark_entry__ as entrymod


def test_serving_lookups_match_operators_and_prune(spark, sf_dir, tmp_path):
    enriched = entrymod._enriched(spark, sf_dir)
    base = str(tmp_path / "serving")
    serving.materialize_serving_tables(enriched, base)

    # pick a real (user, content) pair
    some = rollups.latest_event(enriched).select("user_id", "content_id").first()
    uid, cid = some["user_id"], some["content_id"]

    lb = serving.get_user_leaderboard(spark, base, uid)
    want_lb = (
        rollups.user_leaderboard(enriched)
        .where(F.col("user_id") == uid)
        .where(F.col("rnk") <= 10)
    )
    assert sorted(map(tuple, lb.select(*want_lb.columns).collect())) == sorted(
        map(tuple, want_lb.collect())
    )
    # per-user read prunes to the user's bucket partition
    lb_plan = plan_string(lb)
    assert "user_bucket" in lb_plan and "PartitionFilters" in lb_plan

    le = serving.get_latest_event(spark, base, uid, cid)
    assert le.count() == 1
    le_plan = plan_string(le)
    assert "PushedFilters" in le_plan and f"EqualTo(user_id,{uid})" in le_plan

    ec = serving.get_event_counter(spark, base, "view").collect()
    want_ec = rollups.event_counters(enriched).where(F.col("event_type") == "view").collect()
    assert [tuple(r) for r in ec] == [tuple(r) for r in want_ec]

    tr = serving.get_trending(spark, base)
    assert tr.count() > 0


def test_incremental_leaderboard_equals_full_recompute(spark, sf_dir, tmp_path):
    """Partition-scoped incremental maintenance: materialize from the
    first half of the stream, fold the second half in as an increment —
    the table must be bit-identical to a full recompute, and untouched
    user buckets must keep their original files."""
    import os

    enriched = entrymod._enriched(spark, sf_dir).persist()
    first = enriched.where(F.col("event_id") % 2 == 0)
    second = enriched.where(F.col("event_id") % 2 == 1)

    base_inc = str(tmp_path / "inc")
    serving.materialize_serving_tables(first, base_inc)
    # restrict the increment to a small user set so most buckets are untouched
    small = second.where(F.col("user_id") % 97 == 0)
    lb_dir = f"{base_inc}/user_leaderboard"
    untouched_bucket_files = {
        d: sorted(os.listdir(f"{lb_dir}/{d}"))
        for d in os.listdir(lb_dir)
        if d.startswith("user_bucket=")
    }
    serving.merge_leaderboard_increment(spark, base_inc, small)

    base_full = str(tmp_path / "full")
    serving.materialize_serving_tables(first.unionByName(small), base_full)

    got = spark.read.parquet(f"{base_inc}/user_leaderboard").select(
        "user_id", "content_id", "total_score", "rnk"
    )
    want = spark.read.parquet(f"{base_full}/user_leaderboard").select(
        "user_id", "content_id", "total_score", "rnk"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    touched = {
        f"user_bucket={int(r[0]) % serving.N_BUCKETS}"
        for r in small.select("user_id").distinct().collect()
    }
    for d, files in untouched_bucket_files.items():
        if d not in touched:
            assert sorted(os.listdir(f"{lb_dir}/{d}")) == files, f"{d} was rewritten"
    enriched.unpersist()


def test_streaming_serving_sink_equals_batch_recompute(spark, sf_dir, tmp_path):
    """r3 verdict #3: the streaming serving sink must maintain all four
    tables incrementally, and after a multi-batch replay with
    out-of-(event-time)-order batches the tables must equal a batch
    recompute over the same rows — decimal/latest-wins/additive merges
    are order-independent."""
    import os

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import pipeline as sp

    enriched = entrymod._enriched(spark, sf_dir).persist()
    feed = str(tmp_path / "enriched_feed")
    os.makedirs(feed)
    # three event-id splits written as separate files, NOT in event-time
    # order: the file stream delivers them as separate micro-batches
    for fname, i in (("b.parquet", 1), ("a.parquet", 0), ("c.parquet", 2)):
        enriched.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{feed}/{fname}")

    base_stream = str(tmp_path / "serving_stream")
    stream = (
        spark.readStream.schema(enriched.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/*")
    )
    q = sp.start_serving_sink(stream, base_stream, str(tmp_path / "ck_serve"))
    q.processAllAvailable()
    q.stop()

    base_batch = str(tmp_path / "serving_batch")
    serving.materialize_serving_tables(enriched, base_batch)

    def rows(base, table, cols):
        return sorted(
            map(tuple, spark.read.parquet(f"{base}/{table}").select(*cols).collect())
        )

    assert rows(base_stream, "user_leaderboard", ["user_id", "content_id", "total_score", "rnk"]) \
        == rows(base_batch, "user_leaderboard", ["user_id", "content_id", "total_score", "rnk"])
    assert rows(base_stream, "latest_event", ["user_id", "content_id", "event_id"]) \
        == rows(base_batch, "latest_event", ["user_id", "content_id", "event_id"])
    assert rows(base_stream, "event_counters", ["event_type", "cnt"]) \
        == rows(base_batch, "event_counters", ["event_type", "cnt"])
    tcols = ["minute_bucket", "content_id", "total_score"]
    tstream = sorted(map(tuple, serving.get_trending(spark, base_stream).select(*tcols).collect()))
    tbatch = sorted(map(tuple, serving.get_trending(spark, base_batch).select(*tcols).collect()))
    assert tstream == tbatch and len(tstream) > 0
    # and the read-time trending view matches the batch operator
    want_tr = sorted(
        map(tuple, rollups.trending_recent(enriched).select(*tcols).collect())
    )
    assert tstream == want_tr

    # epoch guard: a re-delivered epoch is a no-op (restart idempotence)
    assert sp._epoch_already_applied(base_stream, 0)
    assert sp._epoch_already_applied(base_stream, 2)
    assert not sp._epoch_already_applied(base_stream, 3)
    enriched.unpersist()


def test_incremental_trending_equals_full_recompute_and_prunes(spark, sf_dir, tmp_path):
    """merge_trending_increment over three arbitrary batch splits must
    land bit-identical to minute_topk over the full stream (decimal
    partials are order-independent), and the per-minute lookup must
    prune to a single bucket partition."""
    enriched = entrymod._enriched(spark, sf_dir).cache()
    base = str(tmp_path / "servingt")
    splits = [
        enriched.where(F.col("event_id") % 3 == i) for i in range(3)
    ]
    for b in (splits[1], splits[0], splits[2]):  # out of order on purpose
        serving.merge_trending_increment(spark, base, b)

    full = rollups.minute_topk(enriched, k=5)
    some_bucket = full.select(F.max("minute_bucket")).first()[0]
    want = sorted(
        map(
            tuple,
            full.where(F.col("minute_bucket") == some_bucket)
            .select("minute_bucket", "content_id", "total_score", "rnk")
            .collect(),
        )
    )
    got_df = serving.get_minute_topk(spark, base, some_bucket, k=5)
    got = sorted(
        map(tuple, got_df.select("minute_bucket", "content_id", "total_score", "rnk").collect())
    )
    assert got == want

    plan = plan_string(got_df)
    assert "PartitionFilters" in plan and "minute_bucket" in plan
    enriched.unpersist()
