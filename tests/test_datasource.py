"""``cdc_replay`` Python DataSource connector semantics (SURVEY.md
§2.1 S1/S2 connector machinery): batch partitioned scans, streaming
offset tracking + restart resume, rate limiting, append-only contract
enforcement, and the writer's stage→commit→replay-idempotent protocol.
"""

from __future__ import annotations

import os

import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import cdc
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_datasource as ds
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


def _feed_values(spark, sf_dir, limit=200):
    ev = load_table(spark, sf_dir, "events").limit(limit)
    return cdc_feed.engagement_cdc_json(ev).selectExpr("value")


def _write_file(feed_dir: str, name: str, lines: list[str]) -> None:
    os.makedirs(feed_dir, exist_ok=True)
    with open(os.path.join(feed_dir, name), "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")


def test_batch_read_matches_text_source(spark, sf_dir, tmp_path):
    feed_dir = str(tmp_path / "feed")
    vals = [r["value"] for r in _feed_values(spark, sf_dir).collect()]
    _write_file(feed_dir, "batch-00000.jsonl", vals[:100])
    _write_file(feed_dir, "batch-00001.jsonl", vals[100:])

    ds.register(spark)
    got = spark.read.format("cdc_replay").option("path", feed_dir).load()
    assert got.schema.simpleString() == "struct<value:string,_source_file:string,_line:int>"
    assert sorted(r["value"] for r in got.collect()) == sorted(vals)
    # provenance columns locate every row in its feed file
    assert got.where("_source_file = 'batch-00000.jsonl'").count() == 100


def test_stream_pipeline_matches_batch_unwrap(spark, sf_dir, tmp_path):
    """The connector feeds the standard unwrap path and lands exactly
    the batch-unwrap rows — the contract ``read_json_lines_stream``
    carries, now through real offsets."""
    feed_dir = str(tmp_path / "feed")
    vals = [r["value"] for r in _feed_values(spark, sf_dir).collect()]
    half = len(vals) // 2
    _write_file(feed_dir, "batch-00000.jsonl", vals[:half])
    _write_file(feed_dir, "batch-00001.jsonl", vals[half:])

    out_dir = str(tmp_path / "out")
    stream = ds.read_cdc_stream(spark, feed_dir)
    q = (
        cdc.unwrap_engagement(stream.select("value"))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out_dir).select("event_id", "event_type").collect()
    want = (
        cdc.unwrap_engagement(_feed_values(spark, sf_dir))
        .select("event_id", "event_type")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_restart_resumes_from_committed_offsets(spark, sf_dir, tmp_path):
    """Stop after two files, append a third, restart on the SAME
    checkpoint: the resumed query reads only the new file — no
    duplicates, nothing skipped (the Kafka group-offset resume)."""
    feed_dir = str(tmp_path / "feed")
    vals = [r["value"] for r in _feed_values(spark, sf_dir).collect()]
    _write_file(feed_dir, "batch-00000.jsonl", vals[:60])
    _write_file(feed_dir, "batch-00001.jsonl", vals[60:120])

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_until_drained():
        q = (
            ds.read_cdc_stream(spark, feed_dir)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_until_drained()
    assert spark.read.parquet(out_dir).count() == 120

    _write_file(feed_dir, "batch-00002.jsonl", vals[120:150])
    run_until_drained()

    got = [r["value"] for r in spark.read.parquet(out_dir).collect()]
    assert sorted(got) == sorted(vals[:150])  # each row exactly once


def test_max_files_per_trigger_paces_micro_batches(spark, sf_dir, tmp_path):
    feed_dir = str(tmp_path / "feed")
    vals = [r["value"] for r in _feed_values(spark, sf_dir).collect()]
    for i in range(3):
        _write_file(feed_dir, f"batch-{i:05d}.jsonl", vals[i * 20 : (i + 1) * 20])

    batch_sizes = []

    def sink(df, epoch_id):
        n = df.count()
        if n:
            batch_sizes.append(n)

    q = (
        ds.read_cdc_stream(spark, feed_dir, max_files_per_trigger=1)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sum(batch_sizes) == 60
    assert len(batch_sizes) == 3 and all(n == 20 for n in batch_sizes)


def test_out_of_order_file_fails_loudly(spark, sf_dir, tmp_path):
    """A file sorting below the committed high-water mark is an
    out-of-band rewrite — the query errors instead of silently
    skipping or double-reading (the same fail-loud posture as the CC
    non-convergence guard)."""
    feed_dir = str(tmp_path / "feed")
    vals = [r["value"] for r in _feed_values(spark, sf_dir).collect()]
    _write_file(feed_dir, "batch-00005.jsonl", vals[:30])

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        ds.read_cdc_stream(spark, feed_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    _write_file(feed_dir, "batch-00001.jsonl", vals[30:40])  # sorts BEFORE the mark
    q = (
        ds.read_cdc_stream(spark, feed_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    with pytest.raises(Exception, match="append-only sorted-name contract"):
        q.processAllAvailable()
        q.stop()


def test_stream_writer_publishes_values_and_manifests(spark, sf_dir, tmp_path):
    """End-to-end writer: staged part files land published with a batch
    manifest; payload round-trips byte-identically."""
    feed_dir, out_dir = str(tmp_path / "feed"), str(tmp_path / "outbox")
    vals = [r["value"] for r in _feed_values(spark, sf_dir).collect()]
    _write_file(feed_dir, "batch-00000.jsonl", vals[:50])

    q = (
        ds.read_cdc_stream(spark, feed_dir)
        .select("value")
        .writeStream.format("cdc_replay")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    published = ds._list_feed_files(out_dir)
    assert published, "no files published"
    got = []
    for name in published:
        with open(os.path.join(out_dir, name), encoding="utf-8") as fh:
            got.extend(line.rstrip("\n") for line in fh if line.strip())
    assert sorted(got) == sorted(vals[:50])
    assert any(f.startswith("_batch-") for f in os.listdir(out_dir))
    assert not os.listdir(os.path.join(out_dir, "_staging"))  # nothing left staged


def test_writer_commit_is_replay_idempotent(tmp_path):
    """Driver-side commit protocol: a replayed epoch (same batch id)
    discards its stage instead of double-publishing — the connector
    twin of the serving sink's epoch markers."""
    out_dir = str(tmp_path / "outbox")
    w = ds.CDCReplayStreamWriter({"path": out_dir})

    def stage(name: str, text: str) -> ds._StagedFiles:
        with open(os.path.join(out_dir, "_staging", name), "w", encoding="utf-8") as fh:
            fh.write(text)
        return ds._StagedFiles([name])

    w.commit([stage("part-a.jsonl", "x\n")], batch_id=7)
    first = ds._list_feed_files(out_dir)
    assert first == ["0000000007-part-a.jsonl"]

    # failure after commit, retry of epoch 7 with a fresh stage
    w.commit([stage("part-b.jsonl", "y\n")], batch_id=7)
    assert ds._list_feed_files(out_dir) == first  # nothing double-published
    assert not os.listdir(os.path.join(out_dir, "_staging"))

    # abort cleans the stage too
    msg = stage("part-c.jsonl", "z\n")
    w.abort([msg], batch_id=8)
    assert not os.listdir(os.path.join(out_dir, "_staging"))


def test_connector_carries_full_topology(spark, tmp_path):
    """Both CDC feeds consumed through the cdc_replay SOURCE, outbox
    produced through the cdc_replay WRITER: the connector carries the
    whole live topology (dim maintenance + per-micro-batch enrichment
    into the MERGE warehouse + null-dropping outbox), equivalent to
    the text-source twin in test_dim_update_midstream."""
    import json

    import pyspark.sql.functions as F

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.cdc import (
        enriched_columns,
        unwrap_engagement,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import pipeline as sp

    def _event(eid, content_id, ts):
        return (
            '{"payload": {"op": "c", "after": {"id": "%d", "user_id": "1", '
            '"content_id": "%d", "event_type": "view", "device": "web", '
            '"duration_ms": 2000, "event_ts": "%s"}, '
            '"source": {"ts_ms": 1, "db": "d", "table": "t"}}}' % (eid, content_id, ts)
        )

    def _content(cid, ctype, secs, ts_ms):
        return (
            '{"payload": {"op": "c", "after": {"id": "%d", "slug": "s", "title": "t", '
            '"content_type": "%s", "length_seconds": %d, "publish_ts": "2024-01-01T00:00:00"}, '
            '"source": {"ts_ms": %d, "db": "d", "table": "c"}}}' % (cid, ctype, secs, ts_ms)
        )

    cfeed, efeed = str(tmp_path / "cfeed"), str(tmp_path / "efeed")
    dim_dir, wh_dir, out_dir = (
        str(tmp_path / "dim"), str(tmp_path / "wh"), str(tmp_path / "outbox")
    )

    _write_file(cfeed, "c-00000.jsonl", [_content(7, "podcast", 60, 1)])
    qdim = sp.maintain_dim_table(
        spark, ds.read_cdc_stream(spark, cfeed), dim_dir, str(tmp_path / "ck_dim")
    )
    qdim.processAllAvailable()

    qwh = sp.start_enriched_warehouse_pipeline(
        spark, ds.read_cdc_stream(spark, efeed), dim_dir, wh_dir, str(tmp_path / "ck_wh")
    )
    plain = enriched_columns(
        unwrap_engagement(ds.read_cdc_stream(spark, efeed))
        .withColumn("content_type", F.lit(None).cast("string"))
        .withColumn("length_seconds", F.lit(None).cast("long"))
    )
    payload = plain.select(
        F.to_json(
            F.struct(
                "event_id", "user_id", "content_id", "event_type", "device",
                "duration_ms", "engagement_score", "content_type", "length_seconds",
            )
        ).alias("value")
    )
    qout = (
        payload.writeStream.format("cdc_replay")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck_out"))
        .start()
    )

    _write_file(efeed, "e-00000.jsonl", [_event(1, 7, "2024-01-01T10:00:00")])
    qwh.processAllAvailable(); qout.processAllAvailable()
    _write_file(cfeed, "c-00001.jsonl", [_content(7, "video", 600, 2)])
    qdim.processAllAvailable()
    _write_file(efeed, "e-00001.jsonl", [_event(2, 7, "2024-01-01T10:01:00")])
    qwh.processAllAvailable(); qout.processAllAvailable()
    qdim.stop(); qwh.stop(); qout.stop()

    rows = {
        r["event_id"]: (r["content_type"], r["length_seconds"])
        for r in spark.read.parquet(wh_dir).collect()
    }
    assert rows == {1: ("podcast", 60), 2: ("video", 600)}  # per-batch dim visibility

    got = []
    for name in ds._list_feed_files(out_dir):
        with open(os.path.join(out_dir, name), encoding="utf-8") as fh:
            got.extend(json.loads(line) for line in fh if line.strip())
    assert {d["event_id"] for d in got} == {1, 2}
    assert all("content_type" not in d for d in got)  # null-dropping outbox


def test_restart_with_rate_limit_never_duplicates(spark, tmp_path):
    """Regression: a fresh reader after restart starts with no
    rate-limit high-water mark; if its first capped latestOffset
    answered below the checkpointed start, the offset log would
    REGRESS and re-deliver files.  The floor is seeded from the
    replayed commit/planned batches, so a rate-limited restart resumes
    exactly-once."""
    feed_dir = str(tmp_path / "feed")
    for i in range(4):
        _write_file(feed_dir, f"b-{i:05d}.jsonl", [f"row{i}"])

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        q = (
            ds.read_cdc_stream(spark, feed_dir, max_files_per_trigger=1)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run()
    for i in range(4, 6):
        _write_file(feed_dir, f"b-{i:05d}.jsonl", [f"row{i}"])
    run()

    vals = sorted(r["value"] for r in spark.read.parquet(out_dir).collect())
    assert vals == [f"row{i}" for i in range(6)]


def test_writer_commit_crash_window_finishes_renames(tmp_path):
    """The manifest is the commit point: with a manifest present but
    renames unfinished (crash mid-publish), the replayed epoch must
    FINISH the recorded renames exactly-once and discard its own
    re-staged files — never publish the batch twice."""
    out_dir = str(tmp_path / "outbox")
    w = ds.CDCReplayStreamWriter({"path": out_dir})

    def stage(name: str, text: str) -> ds._StagedFiles:
        with open(os.path.join(out_dir, "_staging", name), "w", encoding="utf-8") as fh:
            fh.write(text)
        return ds._StagedFiles([name])

    # simulate the crash: manifest written, renames NOT performed
    m1 = stage("part-a.jsonl", "x\n")
    m2 = stage("part-b.jsonl", "y\n")
    with open(os.path.join(out_dir, "_batch-3"), "w", encoding="utf-8") as fh:
        fh.write(
            "part-a.jsonl\t0000000003-part-a.jsonl\n"
            "part-b.jsonl\t0000000003-part-b.jsonl"
        )
    # replayed epoch arrives with freshly staged (different) files
    w.commit([stage("part-c.jsonl", "x\n"), stage("part-d.jsonl", "y\n")], batch_id=3)
    assert ds._list_feed_files(out_dir) == [
        "0000000003-part-a.jsonl",
        "0000000003-part-b.jsonl",
    ]
    assert not os.listdir(os.path.join(out_dir, "_staging"))
    with open(os.path.join(out_dir, "0000000003-part-a.jsonl"), encoding="utf-8") as fh:
        assert fh.read() == "x\n"


def test_latest_offset_rejects_pruned_feed(tmp_path):
    """Files deleted below the committed mark must raise the
    descriptive retention error, not an IndexError."""
    import pytest

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    for i in range(4):
        with open(os.path.join(feed, f"{i:04d}.jsonl"), "w", encoding="utf-8") as fh:
            fh.write("{}\n")
    r = ds.CDCReplayStreamReader({"path": feed})
    r.commit({"n": 4, "last": "0003.jsonl"})  # checkpointed high-water mark
    os.remove(os.path.join(feed, "0002.jsonl"))
    os.remove(os.path.join(feed, "0003.jsonl"))
    with pytest.raises(RuntimeError, match="lost files below"):
        r.latestOffset()
