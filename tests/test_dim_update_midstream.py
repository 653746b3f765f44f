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


def _content(cid: int, ctype: str, secs, ts_ms: int, op: str = "c") -> str:
    if op == "d":
        return (
            '{"payload": {"op": "d", "before": {"id": "%d"}, '
            '"source": {"ts_ms": %d, "db": "d", "table": "c"}}}' % (cid, ts_ms)
        )
    return (
        '{"payload": {"op": "%s", "after": {"id": "%d", "slug": "s", "title": "t", '
        '"content_type": "%s", "length_seconds": %d, "publish_ts": "2024-01-01T00:00:00"}, '
        '"source": {"ts_ms": %d, "db": "d", "table": "c"}}}' % (op, cid, ctype, secs, ts_ms)
    )


def test_full_system_dim_stream_warehouse_and_outbox(spark, tmp_path):
    """The whole live topology at once: the dimension maintained by its
    OWN CDC stream, the event stream enriched against it per
    micro-batch into the MERGE warehouse, and the JSON outbox running
    off the same normalized stream — upserts, an update, and a delete
    all land with micro-batch granularity."""
    cfeed = str(tmp_path / "cfeed"); os.makedirs(cfeed)
    efeed = str(tmp_path / "efeed"); os.makedirs(efeed)
    dim_dir = str(tmp_path / "dim")
    wh_dir = str(tmp_path / "wh")
    out_dir = str(tmp_path / "outbox")

    qdim = sp.maintain_dim_table(
        spark, sp.read_json_lines_stream(spark, cfeed), dim_dir, str(tmp_path / "ck_dim")
    )
    # phase 1: two contents arrive, then events against them
    with open(f"{cfeed}/c1.txt", "w") as f:
        f.write(_content(7, "podcast", 60, 1) + "\n" + _content(8, "video", 600, 2) + "\n")
    qdim.processAllAvailable()

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.cdc import (
        enriched_columns,
        unwrap_engagement,
    )

    estream = sp.read_json_lines_stream(spark, efeed)
    qwh = sp.start_enriched_warehouse_pipeline(
        spark, estream, dim_dir, wh_dir, str(tmp_path / "ck_wh")
    )
    # outbox rides the normalized stream (dim-less here — the mutable
    # dim is exercised by the warehouse branch; outbox contract is the
    # null-dropping JSON projection)
    plain = enriched_columns(
        unwrap_engagement(sp.read_json_lines_stream(spark, efeed))
        .withColumn("content_type", F.lit(None).cast("string"))
        .withColumn("length_seconds", F.lit(None).cast("long"))
    )
    qout = sp.start_outbox_sink(plain, out_dir, str(tmp_path / "ck_out"))
    with open(f"{efeed}/e1.txt", "w") as f:
        f.write(_event(1, 7, "2024-01-01T10:00:00") + "\n")
        f.write(_event(2, 8, "2024-01-01T10:00:10") + "\n")
    qwh.processAllAvailable(); qout.processAllAvailable()

    # phase 2: content 7 updated, content 8 DELETED; new events follow
    with open(f"{cfeed}/c2.txt", "w") as f:
        f.write(_content(7, "video", 300, 3, op="u") + "\n" + _content(8, "", 0, 4, op="d") + "\n")
    qdim.processAllAvailable()
    with open(f"{efeed}/e2.txt", "w") as f:
        f.write(_event(3, 7, "2024-01-01T10:02:00") + "\n")
        f.write(_event(4, 8, "2024-01-01T10:02:10") + "\n")
    qwh.processAllAvailable(); qout.processAllAvailable()
    qdim.stop(); qwh.stop(); qout.stop()

    rows = {
        r["event_id"]: (r["content_type"], r["length_seconds"])
        for r in spark.read.parquet(wh_dir).collect()
    }
    assert rows[1] == ("podcast", 60)      # phase-1 dim
    assert rows[2] == ("video", 600)
    assert rows[3] == ("video", 300)       # updated dim
    assert rows[4] == (None, None)         # deleted dim → enrichment miss, event kept
    payloads = spark.read.text(out_dir).count()
    assert payloads == 4
    # null-dropping outbox: null dim fields are absent keys, score present
    import json as _json

    by_id = {}
    for r in spark.read.text(out_dir).collect():
        d = _json.loads(r["value"])
        by_id[d["event_id"]] = d
    assert set(by_id) == {1, 2, 3, 4}
    assert all("content_type" not in d and "length_seconds" not in d for d in by_id.values())
    assert all(d["engagement_score"] > 0 for d in by_id.values())
