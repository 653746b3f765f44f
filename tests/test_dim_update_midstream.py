"""T4 semantics: the dimension is re-read per micro-batch, so a dim
update lands on events processed *after* it — the micro-batch-granular
analog of Flink mutating broadcast state mid-stream (SURVEY.md §7.3)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import pipeline as sp


def _event(eid: int, content_id: int, ts: str) -> str:
    return (
        '{"payload": {"op": "c", "after": {"id": "%d", "user_id": "1", '
        '"content_id": "%d", "event_type": "view", "device": "web", '
        '"duration_ms": 2000, "event_ts": "%s"}, '
        '"source": {"ts_ms": 1, "db": "d", "table": "t"}}}' % (eid, content_id, ts)
    )


def test_dim_update_applies_from_next_microbatch(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    dim_dir = str(tmp_path / "dim")

    # dim v1: content 7 is a 60-second podcast
    spark.createDataFrame(
        [(7, "slug", "t", "podcast", 60, 1)],
        "id long, slug string, title string, content_type string, "
        "length_seconds long, source_ts_ms long",
    ).write.mode("overwrite").parquet(dim_dir)

    wh_dir = str(tmp_path / "wh")
    sink = sp.start_enriched_warehouse_pipeline(
        spark, sp.read_json_lines_stream(spark, feed_dir), dim_dir, wh_dir, str(tmp_path / "ckpt")
    )

    with open(f"{feed_dir}/b1.txt", "w") as f:
        f.write(_event(1, 7, "2024-01-01T10:00:00") + "\n")
    sink.processAllAvailable()

    # dim update between micro-batches: now a 600-second video
    spark.createDataFrame(
        [(7, "slug", "t", "video", 600, 2)],
        "id long, slug string, title string, content_type string, "
        "length_seconds long, source_ts_ms long",
    ).write.mode("overwrite").parquet(dim_dir)

    with open(f"{feed_dir}/b2.txt", "w") as f:
        f.write(_event(2, 7, "2024-01-01T10:01:00") + "\n")
    sink.processAllAvailable()
    sink.stop()

    rows = {
        r["event_id"]: (r["content_type"], r["length_seconds"], r["engagement_pct"])
        for r in spark.read.parquet(wh_dir).collect()
    }
    # event 1 saw dim v1 (2s of 60s = 3.33%); event 2 saw dim v2 (0.33%)
    assert rows[1] == ("podcast", 60, 3.33)
    assert rows[2] == ("video", 600, 0.33)
