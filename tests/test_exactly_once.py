"""Crash-window exactly-once for the additive streaming sinks.

``foreachBatch`` is at-least-once: a crash between a merge's data
commit and the sink's global epoch marker (pipeline._record_epoch)
re-delivers that micro-batch past the marker check.  The additive
merges are NOT idempotent, so each stamps ``last_epoch`` inside its
committed data and must no-op per table/bucket on replay — the funnel
sink's pattern (serving.merge_funnel_increment) generalized to the
serving, uniques, topk and projection sinks (r4 verdict task #1).

These tests inject exactly that window: apply a batch with an epoch,
never record any marker, replay the same batch with the same epoch,
and assert the replayed state is identical to a single apply and to a
batch recompute.  Two of them also inject a PARTIAL commit (only some
bucket partitions / projections landed before the crash) and assert
the replay applies exactly the missing remainder.
"""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

import __spark_entry__ as entrymod
from real_time_cdc_analytics_pipeline_with_clickhouse_spark import serving, warehouse
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import sketches


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def _halves(spark, sf_dir):
    enr = entrymod._enriched(spark, sf_dir)
    return enr, enr.where(F.col("event_id") % 2 == 0), enr.where(F.col("event_id") % 2 == 1)


def test_serving_increment_epoch_replay_is_noop(spark, sf_dir, tmp_path):
    """Re-delivering an applied epoch into all four serving tables must
    change nothing, and the surviving state must equal the one-shot
    batch recompute."""
    enr, b1, b2 = _halves(spark, sf_dir)
    enr.persist()
    base = str(tmp_path / "serve_eo")
    serving.apply_serving_increment(spark, base, b1, epoch=0)
    serving.apply_serving_increment(spark, base, b2, epoch=1)
    # the crash window: epoch 1's tables committed, marker never written,
    # the restarted query re-runs epoch 1
    serving.apply_serving_increment(spark, base, b2, epoch=1)

    batch = str(tmp_path / "serve_batch")
    serving.materialize_serving_tables(enr, batch)
    lb_cols = ["user_id", "content_id", "total_score", "rnk"]
    assert _rows(spark.read.parquet(f"{base}/user_leaderboard"), lb_cols) == _rows(
        spark.read.parquet(f"{batch}/user_leaderboard"), lb_cols
    )
    ec_cols = ["event_type", "cnt"]
    assert _rows(spark.read.parquet(f"{base}/event_counters"), ec_cols) == _rows(
        spark.read.parquet(f"{batch}/event_counters"), ec_cols
    )
    le_cols = ["user_id", "content_id", "event_id"]
    assert _rows(spark.read.parquet(f"{base}/latest_event"), le_cols) == _rows(
        spark.read.parquet(f"{batch}/latest_event"), le_cols
    )
    tr_cols = ["minute_bucket", "content_id", "total_score"]
    assert _rows(serving.get_trending(spark, base), tr_cols) == _rows(
        serving.get_trending(spark, batch), tr_cols
    )
    enr.unpersist()


def test_leaderboard_partial_commit_then_replay(spark, sf_dir, tmp_path):
    """Dynamic partition overwrite commits per bucket, so a crash can
    land only SOME of an epoch's buckets.  Simulated by applying the
    epoch restricted to half the touched buckets (delta rows for a
    bucket only ever write that bucket's partition); the full replay
    must skip the stamped half and apply exactly the missing half."""
    enr, b1, b2 = _halves(spark, sf_dir)
    enr.persist()
    base = str(tmp_path / "lb_partial")
    serving.merge_leaderboard_increment(spark, base, b1, epoch=0)
    # crash mid-epoch-1: only even-numbered buckets' partitions committed
    committed_half = b2.where(F.pmod(F.col("user_id"), F.lit(serving.N_BUCKETS)) % 2 == 0)
    serving.merge_leaderboard_increment(spark, base, committed_half, epoch=1)
    # restart: the sink re-delivers the FULL epoch-1 batch
    serving.merge_leaderboard_increment(spark, base, b2, epoch=1)

    batch = str(tmp_path / "lb_batch")
    serving.merge_leaderboard_increment(spark, batch, enr)
    cols = ["user_id", "content_id", "total_score", "rnk"]
    assert _rows(spark.read.parquet(f"{base}/user_leaderboard"), cols) == _rows(
        spark.read.parquet(f"{batch}/user_leaderboard"), cols
    )
    enr.unpersist()


def test_uniques_increment_epoch_replay_is_noop(spark, sf_dir, tmp_path):
    """The additive cnt companion of the HLL state must not
    double-count a re-delivered epoch."""
    enr, b1, b2 = _halves(spark, sf_dir)
    path = str(tmp_path / "uniq_eo")
    sketches.merge_uniques_increment(spark, path, b1, epoch=0)
    sketches.merge_uniques_increment(spark, path, b2, epoch=1)
    sketches.merge_uniques_increment(spark, path, b2, epoch=1)  # replay
    got = _rows(
        sketches.estimate_uniques(spark.read.parquet(path)),
        ["hour_ts", "event_type", "cnt", "uniq_users"],
    )
    want = _rows(
        sketches.estimate_uniques(sketches.hourly_uniques_state(enr)),
        ["hour_ts", "event_type", "cnt", "uniq_users"],
    )
    assert got == want and got


def test_topk_increment_epoch_replay_is_noop(spark, sf_dir, tmp_path):
    """The space-saving bounds are additive; a re-delivered epoch must
    not inflate them."""
    enr, b1, b2 = _halves(spark, sf_dir)
    path = str(tmp_path / "topk_eo")
    m = 64
    cols = ["event_type", "rank", "item", "lb", "ub", "guaranteed"]
    sketches.merge_topk_increment(spark, path, b1, "content_id", ["event_type"], m, epoch=0)
    sketches.merge_topk_increment(spark, path, b2, "content_id", ["event_type"], m, epoch=1)
    want = _rows(
        sketches.topk_from_state(spark.read.parquet(path), ["event_type"], 5), cols
    )
    sketches.merge_topk_increment(spark, path, b2, "content_id", ["event_type"], m, epoch=1)
    got = _rows(
        sketches.topk_from_state(spark.read.parquet(path), ["event_type"], 5), cols
    )
    assert got == want and got
    # and the fold's count lower bounds stay exact vs a direct groupBy
    # (the merge widens only ub when truncation occurred)
    exact = {
        (r["event_type"], r["content_id"]): r["n"]
        for r in enr.groupBy("event_type", "content_id").agg(F.count("*").alias("n")).collect()
    }
    for et, _rank, item, lb, ub, _g in got:
        assert lb <= exact[(et, item)] <= ub


def test_log_histogram_increment_epoch_replay_is_noop(spark, sf_dir, tmp_path):
    """The log-bucketed quantile state is additive; a re-delivered
    epoch must not double-count any bucket."""
    enr, b1, b2 = _halves(spark, sf_dir)
    path = str(tmp_path / "logq_eo")
    args = ("engagement_score", ["event_type"])
    sketches.merge_log_histogram_increment(spark, path, b1, *args, epoch=0)
    sketches.merge_log_histogram_increment(spark, path, b2, *args, epoch=1)
    sketches.merge_log_histogram_increment(spark, path, b2, *args, epoch=1)  # replay
    got = sorted(
        (r["event_type"], r["bin"], r["cnt"]) for r in spark.read.parquet(path).collect()
    )
    want = sorted(
        tuple(r)
        for r in sketches.log_histogram_state(enr, "engagement_score", ["event_type"]).collect()
    )
    assert got == want and got


def test_projection_partial_commit_then_replay(spark, sf_dir, tmp_path):
    """Projections commit independently, so a crash can leave one
    refreshed and another not.  Simulated by rolling one projection's
    table back to its pre-epoch bytes after a full refresh; the replay
    must skip the stamped projection and apply only the rolled-back
    one — final state equals a rebuild over the full history."""
    enr, b1, b2 = _halves(spark, sf_dir)
    enr.persist()
    wh = str(tmp_path / "wh_eo")
    proot = str(tmp_path / "proj_eo")
    warehouse.write_warehouse(b1, wh)
    warehouse.define_projection(spark, wh, proot, "by_type", ["event_type", "content_type"])
    warehouse.define_projection(spark, wh, proot, "by_hour", ["hour_ts"])

    pre = str(tmp_path / "by_hour_pre")
    shutil.copytree(f"{proot}/by_hour", pre)
    warehouse.refresh_projections(spark, proot, b2, epoch=1)
    # crash window: by_type committed epoch 1, by_hour did not
    shutil.rmtree(f"{proot}/by_hour")
    shutil.copytree(pre, f"{proot}/by_hour")
    warehouse.refresh_projections(spark, proot, b2, epoch=1)  # replay

    whf = str(tmp_path / "wh_full")
    warehouse.write_warehouse(enr, whf)
    nsort = lambda rows: sorted(rows, key=lambda t: tuple((v is None, v) for v in t))
    for keys in (["event_type", "content_type"], ["hour_ts"]):
        got, src = warehouse.routed_aggregate(spark, wh, proot, keys)
        assert src != "facts"
        want, _ = warehouse.routed_aggregate(spark, whf, str(tmp_path / "noproj"), keys)
        assert nsort(map(tuple, got.collect())) == nsort(map(tuple, want.collect()))
    enr.unpersist()
