"""Custom stateful operator test: per-user running scores with TTL
(the Redis ZINCRBY leaderboard analog, applyInPandasWithState)."""

from __future__ import annotations

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import cdc, enrich
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import pipeline as sp
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming.stateful import (
    running_user_scores,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


def test_running_scores_accumulate_across_batches(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").limit(300)
    part = load_table(spark, sf_dir, "part")
    feed_dir = str(tmp_path / "feed")

    # two micro-batches: split the feed into two files written separately
    feed = cdc_feed.engagement_cdc_json(events).collect()
    half = len(feed) // 2
    import os

    os.makedirs(feed_dir)
    with open(f"{feed_dir}/b1.txt", "w") as f:
        f.write("\n".join(r["value"] for r in feed[:half]) + "\n")

    dim_dir = str(tmp_path / "dim")
    enrich.compact_dim_latest(cdc.unwrap_content(cdc_feed.content_cdc_json(part))).write.mode(
        "overwrite"
    ).parquet(dim_dir)

    enriched = sp.enriched_event_stream(spark, sp.read_json_lines_stream(spark, feed_dir), dim_dir)
    scores = running_user_scores(enriched, ttl_ms=0)  # TTL off: let processAllAvailable settle
    q = (
        scores.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_scores")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    with open(f"{feed_dir}/b2.txt", "w") as f:
        f.write("\n".join(r["value"] for r in feed[half:]) + "\n")
    q.processAllAvailable()
    q.stop()

    # scores are positive so the running total is monotone: the final
    # state per (user, content) is the max emitted value
    got_df = spark.sql(
        "SELECT user_id, content_id, max(total_score) AS total_score"
        " FROM user_scores GROUP BY 1, 2"
    )
    got = {(r["user_id"], r["content_id"]): r["total_score"] for r in got_df.collect()}

    batch = enrich.enrich_events(
        cdc.unwrap_engagement(spark.createDataFrame(feed)),
        enrich.compact_dim_latest(cdc.unwrap_content(cdc_feed.content_cdc_json(part))),
    )
    want_rows = (
        batch.groupBy("user_id", "content_id")
        .agg(F.round(F.sum("engagement_score"), 2).alias("s"))
        .collect()
    )
    want = {(r["user_id"], r["content_id"]): r["s"] for r in want_rows}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])


def test_latest_event_state_transform_with_state(spark, sf_dir, tmp_path):
    """transformWithStateInPandas latest-event KV (A8, Redis SETEX
    analog): across two micro-batches — the second replaying a mix of
    NEWER and stale rows — the final emitted value per (user, content)
    equals the batch latest-wins compaction.  Requires RocksDB (the
    API mandates it); skip-guards on builds without it."""
    import os

    import pytest as _pytest

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark import session as S
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming.stateful import (
        latest_event_state,
    )

    if not S._rocksdb_available(spark):
        _pytest.skip("build lacks RocksDBStateStoreProvider (transformWithState needs it)")
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        _pytest.skip(
            "transformWithStateInPandas needs google.protobuf for its "
            "Python driver worker; not installed in this container"
        )

    events = load_table(spark, sf_dir, "events").limit(300)
    part = load_table(spark, sf_dir, "part")
    dim = enrich.compact_dim_latest(cdc.unwrap_content(cdc_feed.content_cdc_json(part)))
    enriched = enrich.enrich_events(
        cdc.unwrap_engagement(cdc_feed.engagement_cdc_json(events)), dim
    ).persist()

    feed = str(tmp_path / "enr_feed")
    os.makedirs(feed)
    # batch 1: even event_ids; batch 2: odd event_ids PLUS a stale
    # replay of the even rows (at-least-once re-delivery) — the stored
    # latest must not regress to the replayed older rows
    enriched.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{feed}/b1.parquet")
    q_src = (
        spark.readStream.schema(enriched.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/*")
    )
    out = latest_event_state(q_src, ttl_ms=0)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("latest_kv")
        .option("checkpointLocation", str(tmp_path / "ck_tws"))
        .start()
    )
    q.processAllAvailable()
    enriched.where(F.col("event_id") % 2 != 0).unionByName(
        enriched.where(F.col("event_id") % 2 == 0)
    ).coalesce(1).write.parquet(f"{feed}/b2.parquet")
    q.processAllAvailable()
    q.stop()

    # last emission per key wins (update mode); order by micro-batch
    # arrival — use the max (ts, id) seen, which equals the final state
    got_df = spark.sql(
        "SELECT user_id, content_id,"
        " max_by(event_id, struct(event_ts_us, event_id)) AS event_id"
        " FROM latest_kv GROUP BY 1, 2"
    )
    got = {(r["user_id"], r["content_id"]): r["event_id"] for r in got_df.collect()}
    want_rows = (
        enriched.groupBy("user_id", "content_id")
        .agg(
            F.max_by(
                "event_id", F.struct(F.unix_micros("event_ts"), F.col("event_id"))
            ).alias("event_id")
        )
        .collect()
    )
    want = {(r["user_id"], r["content_id"]): r["event_id"] for r in want_rows}
    assert got == want and got
    enriched.unpersist()


def test_rocksdb_state_store_pinned_when_available(spark):
    """Round-2 verdict #5: streaming state must be disk-backed where the
    build ships RocksDB (this container does); skip-guards on builds
    without it."""
    import pytest as _pytest

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark import session as S

    if not S._rocksdb_available(spark):
        _pytest.skip("build lacks RocksDBStateStoreProvider")
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == S.ROCKSDB_PROVIDER
    )
