"""Serving-side lookup API (SURVEY.md §3.3).

The reference's consumers read Redis point keys and sorted sets:
``GET engagement:{user}:{content}``, ``ZREVRANGE user_engagement:{user}``,
``ZREVRANGE top_content:bucket:{minute}``, ``GET event_counters:{type}``
(ESJ:412-441).  Here the same lookups are partition-pruned /
filter-pushed point reads over materialized serving tables — each
getter's predicate reaches the parquet scan, so a lookup touches one
partition directory (leaderboards) or a few row groups, not the table.

All four tables are maintained INCREMENTALLY (partition-scoped decimal
/ latest-wins / additive merges — ``apply_serving_increment`` is what
``start_serving_sink`` runs per micro-batch); a full refresh is the
same increment applied once to a cleared base, so there is exactly one
maintenance code path.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .operators import rollups
from .warehouse import _stage_swap, buckets_already_stamped as _buckets_already_stamped
from .warehouse import stamped as _stamped

TABLES = ["user_leaderboard", "latest_event", "event_counters", "trending_state"]


def materialize_serving_tables(enriched: DataFrame, base_dir: str) -> None:
    """Full refresh of the serving tables = clear state, then fold the
    whole frame in through the SAME incremental merge path a streaming
    ``foreachBatch`` uses (r3 verdict: the convenience entry point must
    not be a second, O(history)-per-batch, code path).  The increments
    applied to an empty base ARE a full recompute: decimal partials,
    latest-wins, and additive counters are all order-independent.

    Layout: the leaderboard and latest-event tables are partitioned by
    a user bucket (1024 buckets): per-user reads prune to one
    directory — the layout analog of Redis key sharding — without
    creating millions of tiny single-user partitions; trending state
    is partitioned by minute bucket."""
    for t in TABLES:
        shutil.rmtree(os.path.join(base_dir, t), ignore_errors=True)
    apply_serving_increment(enriched.sparkSession, base_dir, enriched)


def apply_serving_increment(
    spark: SparkSession, base_dir: str, batch: DataFrame, epoch: int | None = None
) -> None:
    """Fold one micro-batch of enriched events into all four serving
    tables (K2).  Each merge is partition-scoped: only the buckets the
    batch touches are read or rewritten.

    ``epoch`` (streaming callers): the additive merges (leaderboard,
    trending, counters) stamp every committed row with it and skip
    buckets already stamped >= epoch on re-delivery — so a crash
    anywhere between the four table commits and the sink's global
    epoch marker replays safely, each table/bucket applying each epoch
    exactly once (the funnel sink's pattern generalized).  The
    latest-event merge needs no stamp: latest-wins is idempotent, a
    re-delivered event loses the (event_ts, event_id) tiebreak against
    the stored copy of itself."""
    batch.persist()
    try:
        merge_leaderboard_increment(spark, base_dir, batch, epoch=epoch)
        merge_trending_increment(spark, base_dir, batch, epoch=epoch)
        merge_latest_event_increment(spark, base_dir, batch)
        merge_event_counters_increment(spark, base_dir, batch, epoch=epoch)
    finally:
        batch.unpersist()


N_BUCKETS = 1024


def _leaderboard_state(enriched: DataFrame) -> DataFrame:
    """(user, content) → exact decimal score partials + bucket + rank.

    Scores are stored as DECIMAL so increments merge exactly — an
    incrementally maintained table stays bit-identical to a full
    recompute regardless of batch arrival order."""
    agg = enriched.groupBy("user_id", "content_id").agg(
        F.sum(F.col("engagement_score").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("score_dec"),
        F.max("event_ts").alias("last_ts"),
    )
    return _rank_state(agg)


def _rank_state(agg: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("score_dec").desc(), F.col("content_id"))
    return (
        agg.withColumn("total_score", F.col("score_dec").cast("double"))
        .withColumn("rnk", F.row_number().over(w))
        .withColumn("user_bucket", F.pmod(F.col("user_id"), F.lit(N_BUCKETS)))
    )


def merge_leaderboard_increment(
    spark: SparkSession, base_dir: str, new_enriched: DataFrame, epoch: int | None = None
) -> None:
    """Fold a micro-batch into the stored leaderboard incrementally —
    the warehouse's partition-scoped MERGE pattern generalized from
    time partitions to key-space buckets:

    1. decimal score deltas per (user, content) from the batch only;
    2. the affected ``user_bucket`` set (≤ N_BUCKETS, a bounded
       collect) prunes the read — untouched buckets are never read or
       written;
    3. merge = additive decimal sum, then re-rank ONLY the affected
       buckets' users;
    4. dynamic partition overwrite commits just those buckets.

    Exactness: decimal addition is associative/commutative, so any
    batch arrival order lands bit-identical to a full recompute
    (tested).  Exactly-once under ``epoch``: addition is NOT
    idempotent, so committed rows carry a per-bucket ``last_epoch``
    stamp and a re-delivered epoch skips the buckets it already
    reached (funnel-sink pattern — each bucket applies each epoch
    exactly once, even through the commit-vs-marker crash window).
    """
    delta = new_enriched.groupBy("user_id", "content_id").agg(
        F.sum(F.col("engagement_score").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("score_dec"),
        F.max("event_ts").alias("last_ts"),
    ).withColumn("user_bucket", F.pmod(F.col("user_id"), F.lit(N_BUCKETS)))
    delta.persist()
    try:
        buckets = [r[0] for r in delta.select("user_bucket").distinct().collect()]
        if not buckets:
            return
        path = f"{base_dir}/user_leaderboard"
        if _partitioned_table_exists(path, "user_bucket"):
            stored = _stamped(
                spark.read.parquet(path).where(F.col("user_bucket").isin(buckets))
            )
            if epoch is not None:
                done = _buckets_already_stamped(stored, "user_bucket", epoch)
                if done:
                    buckets = [b for b in buckets if b not in done]
                    if not buckets:
                        return
                    stored = stored.where(F.col("user_bucket").isin(buckets))
            current = stored.select(
                "user_id", "content_id", "score_dec", "last_ts", "user_bucket"
            )
            merged = (
                current.unionByName(delta.where(F.col("user_bucket").isin(buckets)))
                .groupBy("user_id", "content_id", "user_bucket")
                .agg(
                    F.sum("score_dec").cast("decimal(28,2)").alias("score_dec"),
                    F.max("last_ts").alias("last_ts"),
                )
            )
        else:  # first batch bootstraps the table
            merged = delta
        ranked = _rank_state(merged.drop("user_bucket")).withColumn(
            "last_epoch", F.lit(-1 if epoch is None else int(epoch)).cast("long")
        )
        _stage_swap(ranked, path, partition_by="user_bucket")
    finally:
        delta.unpersist()


def _partitioned_table_exists(path: str, partition_col: str) -> bool:
    return os.path.isdir(path) and any(
        f.startswith(partition_col + "=") for f in os.listdir(path)
    )


def merge_latest_event_increment(spark: SparkSession, base_dir: str, new_enriched: DataFrame) -> None:
    """Fold a micro-batch into the stored latest-event table (the Redis
    ``SETEX engagement:{user}:{content}`` analog) — latest-wins per
    (user, content) via ``max_by`` on (event_ts, event_id), bucket-
    partition-scoped like the leaderboard.  Latest-wins is idempotent
    under replay: a re-delivered event loses the tiebreak against the
    stored copy of itself."""
    delta = rollups.latest_event(new_enriched).withColumn(
        "user_bucket", F.pmod(F.col("user_id"), F.lit(N_BUCKETS))
    )
    delta.persist()
    try:
        buckets = [r[0] for r in delta.select("user_bucket").distinct().collect()]
        if not buckets:
            return
        path = f"{base_dir}/latest_event"
        if _partitioned_table_exists(path, "user_bucket"):
            current = (
                spark.read.parquet(path)
                .where(F.col("user_bucket").isin(buckets))
                .drop("user_bucket")
            )
            merged = rollups.latest_event(
                current.unionByName(delta.drop("user_bucket"), allowMissingColumns=False)
            ).withColumn("user_bucket", F.pmod(F.col("user_id"), F.lit(N_BUCKETS)))
        else:
            merged = delta
        _stage_swap(merged, path, partition_by="user_bucket")
    finally:
        delta.unpersist()


def merge_event_counters_increment(
    spark: SparkSession, base_dir: str, new_enriched: DataFrame, epoch: int | None = None
) -> None:
    """Fold a micro-batch into the global per-event-type counters (the
    Redis ``INCR event_counters:{type}`` analog) — an additive merge of
    a ≤|event-type-domain|-row table, the one serving table small
    enough that partition scoping would be overhead.  The table is
    unpartitioned (one atomic whole-table swap per merge), so the
    exactly-once stamp is table-level: committed rows carry
    ``last_epoch`` and a re-delivered epoch is a no-op."""
    path = f"{base_dir}/event_counters"
    delta = new_enriched.groupBy("event_type").agg(
        F.count("*").alias("cnt"), F.max("event_ts").alias("last_ts")
    )
    exists = os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path))
    if exists:
        stored = _stamped(spark.read.parquet(path))
        if epoch is not None:
            if stored.agg(F.max("last_epoch")).first()[0] >= epoch:
                return
        merged = (
            stored.select("event_type", "cnt", "last_ts")
            .unionByName(delta)
            .groupBy("event_type")
            .agg(F.sum("cnt").alias("cnt"), F.max("last_ts").alias("last_ts"))
        )
    else:
        merged = delta
    merged = merged.withColumn(
        "last_epoch", F.lit(-1 if epoch is None else int(epoch)).cast("long")
    )
    _stage_swap(merged, path)


def get_user_leaderboard(spark: SparkSession, base_dir: str, user_id: int, k: int = 10) -> DataFrame:
    """ZREVRANGE user_engagement:{user} 0 k — ranked contents."""
    return (
        spark.read.parquet(f"{base_dir}/user_leaderboard")
        .where((F.col("user_bucket") == user_id % N_BUCKETS) & (F.col("user_id") == user_id))
        .where(F.col("rnk") <= k)
        .orderBy("rnk")
        .drop("user_bucket", "score_dec", "last_epoch", "last_ts")
    )


def get_latest_event(spark: SparkSession, base_dir: str, user_id: int, content_id: int) -> DataFrame:
    """GET engagement:{user}:{content} — the last enriched event.
    The bucket predicate prunes to one partition directory; the key
    predicates push into the row-group scan."""
    return (
        spark.read.parquet(f"{base_dir}/latest_event")
        .where(F.col("user_bucket") == user_id % N_BUCKETS)
        .where((F.col("user_id") == user_id) & (F.col("content_id") == content_id))
        .drop("user_bucket")
    )


def get_event_counter(spark: SparkSession, base_dir: str, event_type: str) -> DataFrame:
    """GET event_counters:{type}."""
    return (
        spark.read.parquet(f"{base_dir}/event_counters")
        .where(F.col("event_type") == event_type)
        .drop("last_epoch", "last_ts")
    )


def get_trending(spark: SparkSession, base_dir: str, k: int = 5, minutes: int = 15) -> DataFrame:
    """ZREVRANGE top_content:bucket:{latest minutes} — trending view.

    Ranks the stored per-minute decimal partials at read time (the
    reference also ranks lazily, via ZREVRANGE): anchor = the latest
    stored minute bucket, retention = the trailing ``minutes`` buckets,
    top-``k`` per bucket.  Identical rows to
    ``rollups.trending_recent`` over the full history — decimal
    partials are order-independent, so however the increments arrived,
    the read-time ranking sees the same sums."""
    from pyspark.sql import Window

    state = spark.read.parquet(f"{base_dir}/trending_state").select(
        F.col("minute_bucket").cast("string").alias("minute_bucket"),
        "content_id",
        F.col("score_dec").cast("double").alias("total_score"),
    )
    mx = state.agg(F.max("minute_bucket").alias("_mx"))
    recent = state.join(F.broadcast(mx)).where(
        F.to_timestamp("minute_bucket", "yyyyMMddHHmm")
        >= F.to_timestamp("_mx", "yyyyMMddHHmm") - F.expr(f"INTERVAL {minutes} MINUTES")
    ).drop("_mx")
    w = Window.partitionBy("minute_bucket").orderBy(
        F.col("total_score").desc(), F.col("content_id")
    )
    return (
        recent.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .orderBy("minute_bucket", "rnk")
    )


def merge_trending_increment(
    spark: SparkSession, base_dir: str, new_enriched: DataFrame, epoch: int | None = None
) -> None:
    """Fold a micro-batch into the stored per-minute trending partials
    incrementally — the leaderboard's partition-scoped MERGE pattern
    applied to TIME partitions:

    1. decimal score deltas per (minute_bucket, content_id) from the
       batch only;
    2. the touched minute buckets (bounded by the watermark — a
       handful per batch, collected as a short list) prune the read;
    3. merge = additive decimal sum over just those buckets;
    4. dynamic partition overwrite commits only them.

    The stored table is ``trending_state`` partitioned by
    minute_bucket: partial DECIMAL sums, rank-free (ranking is a
    per-bucket read-time window over ≤ content-cardinality rows —
    cheap, and storing it would force re-ranking untouched buckets
    whenever k changes).  Decimal addition is order-independent, so
    any batch split lands bit-identical to a full recompute (tested);
    under ``epoch`` the same per-bucket ``last_epoch`` stamps as the
    leaderboard make re-delivery exactly-once through the
    commit-vs-marker crash window.
    """
    delta = new_enriched.groupBy(
        F.date_format("event_ts", "yyyyMMddHHmm").alias("minute_bucket"),
        "content_id",
    ).agg(
        F.sum(F.col("engagement_score").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("score_dec")
    )
    delta.persist()
    try:
        buckets = [r[0] for r in delta.select("minute_bucket").distinct().collect()]
        if not buckets:
            return
        path = f"{base_dir}/trending_state"
        if _partitioned_table_exists(path, "minute_bucket"):
            stored = _stamped(
                spark.read.parquet(path)
                .withColumn("minute_bucket", F.col("minute_bucket").cast("string"))
                .where(F.col("minute_bucket").isin(buckets))
            )
            if epoch is not None:
                done = _buckets_already_stamped(stored, "minute_bucket", epoch)
                if done:
                    buckets = [b for b in buckets if b not in done]
                    if not buckets:
                        return
                    stored = stored.where(F.col("minute_bucket").isin(buckets))
            current = stored.select("minute_bucket", "content_id", "score_dec")
            merged = (
                current.unionByName(delta.where(F.col("minute_bucket").isin(buckets)))
                .groupBy("minute_bucket", "content_id")
                .agg(F.sum("score_dec").cast("decimal(28,2)").alias("score_dec"))
            )
        else:
            merged = delta
        merged = merged.withColumn(
            "last_epoch", F.lit(-1 if epoch is None else int(epoch)).cast("long")
        )
        _stage_swap(merged, path, partition_by="minute_bucket")
    finally:
        delta.unpersist()


def get_minute_topk(spark: SparkSession, base_dir: str, minute_bucket: str, k: int = 5) -> DataFrame:
    """ZREVRANGE top_content:bucket:{minute} — rank one bucket's
    partials at read time; the bucket predicate prunes the scan to a
    single partition directory."""
    from pyspark.sql import Window

    w = Window.partitionBy("minute_bucket").orderBy(
        F.col("total_score").desc(), F.col("content_id")
    )
    return (
        spark.read.parquet(f"{base_dir}/trending_state")
        .where(F.col("minute_bucket") == minute_bucket)
        .select(
            F.col("minute_bucket").cast("string").alias("minute_bucket"),
            "content_id",
            F.col("score_dec").cast("double").alias("total_score"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def _read_funnel_watermark(meta_dir: str) -> int | None:
    p = os.path.join(meta_dir, "_WATERMARK_US")
    if os.path.exists(p):
        with open(p) as fh:
            raw = fh.read().strip()
            return int(raw) if raw else None
    return None


def _write_funnel_watermark(meta_dir: str, wm_us: int) -> None:
    os.makedirs(meta_dir, exist_ok=True)
    p = os.path.join(meta_dir, "_WATERMARK_US")
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(wm_us))
    os.replace(tmp, p)


def merge_funnel_increment(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    steps,
    window_s: int | None = 86400,
    epoch: int | None = None,
) -> None:
    """Fold one EVENT-TIME-ORDERED micro-batch into the stored
    per-user mergeable funnel states (operators/behavioral.py): the
    batch becomes a single segment summary and composes onto each
    user's running state, so per-batch cost is O(batch users ∪ their
    buckets) — never O(event history).

    Ordering contract — ENFORCED, not assumed: a persisted event-time
    watermark (max ``event_ts`` ever applied) rejects a batch whose
    min event_ts is below it with a descriptive error, because
    composing an out-of-order batch as strictly-later would SILENTLY
    fabricate conversions (a late click composes as if it followed an
    earlier view).  Out-of-order producers should keep day-partitioned
    summaries via ``funnel_segment_states`` over the warehouse and
    fold at read time — the algebra is identical.  Boundary ties
    (batch min == watermark) are accepted; a tie straddling the batch
    boundary composes only old→new, the same unspecified-tie caveat
    ClickHouse's own windowFunnel carries.

    Exactly-once — bucket-level, because state composition is NOT
    idempotent (re-composing the same batch can promote levels using
    its own events twice): every stored row carries ``last_epoch``,
    and on re-delivery of ``epoch`` (crash between the per-partition
    dynamic-overwrite commits and the sink's global epoch marker)
    buckets already stamped >= epoch are skipped while the rest
    compose — each bucket applies each epoch exactly once.

    Same bucket-scoped MERGE mechanics as the leaderboard: affected
    ``user_bucket`` partitions only, dynamic-partition-overwrite
    commit."""
    from .operators.behavioral import funnel_segment_states, merge_funnel_states

    meta_dir = state_dir + "_meta"
    span = batch.agg(
        F.unix_micros(F.min("event_ts")).alias("lo"),
        F.unix_micros(F.max("event_ts")).alias("hi"),
    ).first()
    if span["lo"] is None:
        return
    wm = _read_funnel_watermark(meta_dir)

    def _require_in_order() -> None:
        # deferred until we know the batch will actually compose: a
        # fully-applied replayed epoch legitimately sits BELOW the
        # watermark it advanced, and must no-op via the bucket stamps
        # rather than trip this guard
        if wm is not None and span["lo"] < wm:
            raise ValueError(
                f"out-of-order batch for funnel state at {state_dir}: batch min "
                f"event time {span['lo']}us is before the applied watermark {wm}us; "
                "funnel composition requires event-time-ordered batches — use "
                "day-partitioned funnel_segment_states over the warehouse for "
                "out-of-order history"
            )

    stamp = -1 if epoch is None else int(epoch)
    bs = funnel_segment_states(batch, steps, window_s, segment=F.lit(1)).withColumn(
        "user_bucket", F.pmod(F.col("user_id"), F.lit(N_BUCKETS))
    )
    bs.persist()
    try:
        buckets = [r[0] for r in bs.select("user_bucket").distinct().collect()]
        if not buckets:
            return
        if _partitioned_table_exists(state_dir, "user_bucket"):
            stored = spark.read.parquet(state_dir).where(
                F.col("user_bucket").isin(buckets)
            )
            if epoch is not None:
                done = [
                    r[0]
                    for r in stored.groupBy("user_bucket")
                    .agg(F.max("last_epoch").alias("e"))
                    .where(F.col("e") >= epoch)
                    .select("user_bucket")
                    .collect()
                ]
                if done:
                    buckets = [b for b in buckets if b not in set(done)]
                    if not buckets:
                        _write_funnel_watermark(meta_dir, max(wm or 0, span["hi"]))
                        return
                    stored = stored.where(F.col("user_bucket").isin(buckets))
                    bs_live = bs.where(F.col("user_bucket").isin(buckets))
                else:
                    bs_live = bs
            else:
                bs_live = bs
            _require_in_order()
            current = stored.select(
                "user_id",
                F.lit(0).cast("long").alias("segment_us"),  # earlier than the batch
                "state",
                "user_bucket",
            )
            union = current.unionByName(bs_live.select(*current.columns))
        else:
            _require_in_order()
            union = bs
        merged = (
            merge_funnel_states(
                union.select("user_id", "segment_us", "state"), steps, window_s
            )
            .withColumn("user_bucket", F.pmod(F.col("user_id"), F.lit(N_BUCKETS)))
            .withColumn("last_epoch", F.lit(stamp).cast("long"))
        )
        _stage_swap(merged, state_dir, partition_by="user_bucket")
        _write_funnel_watermark(meta_dir, max(wm or 0, span["hi"]))
    finally:
        bs.unpersist()


# Redis key TTLs the reference sets on each serving write
# (EnhancedEngagementStreamingJob.java:420-441): leaderboard keys 86400 s,
# trending minute buckets 15*60 s, counters 3600 s.
SERVING_TTLS_S = {
    "user_leaderboard": 86_400,
    "latest_event": 86_400,
    "trending_state": 15 * 60,
    "event_counters": 3_600,
}


def expire_serving_state(
    spark: SparkSession, base_dir: str, now: str, ttls: dict | None = None
) -> dict:
    """The Redis ``EXPIRE`` analog for the serving tables: a key whose
    LAST write is older than its TTL disappears, exactly as the
    reference's per-write ``jedis.expire`` calls make it (each table
    tracks ``last_ts`` = max event_ts folded into the key —
    re-touching a key renews it, Redis semantics).

    Scale shape (the ``apply_ttl`` discipline): trending minute
    buckets wholly behind the cutoff drop as WHOLE partition
    directories — an unlink, nothing read; the bucketed key tables
    rewrite ONLY buckets that actually contain an expired key (found
    via a per-bucket min(last_ts) aggregate — bounded rows); the
    counters table is domain-sized.  Returns per-table expired-row /
    dropped-partition counts.  A later increment for an expired key
    simply bootstraps it again, exactly like INCR/SET on an expired
    Redis key."""
    import shutil

    ttls = {**SERVING_TTLS_S, **(ttls or {})}
    now_c = F.to_timestamp(F.lit(now))
    report: dict = {}

    # trending: partition drop (minute_bucket is the directory key)
    tdir = f"{base_dir}/trending_state"
    dropped = []
    if os.path.isdir(tdir):
        import datetime

        cutoff = (
            datetime.datetime.strptime(now, "%Y-%m-%d %H:%M:%S")
            - datetime.timedelta(seconds=ttls["trending_state"])
        ).strftime("%Y%m%d%H%M")
        for d in sorted(os.listdir(tdir)):
            if d.startswith("minute_bucket=") and d.split("=", 1)[1] < cutoff:
                shutil.rmtree(os.path.join(tdir, d))
                dropped.append(d.split("=", 1)[1])
    report["trending_dropped_buckets"] = dropped

    # bucketed key tables: rewrite only buckets holding an expired key
    for table, ts_col in (("user_leaderboard", "last_ts"), ("latest_event", "event_ts")):
        path = f"{base_dir}/{table}"
        report[f"{table}_expired"] = 0
        if not _partitioned_table_exists(path, "user_bucket"):
            continue
        cutoff_ts = now_c - F.expr(f"INTERVAL {ttls[table]} SECONDS")
        stored = spark.read.parquet(path)
        stale = [
            r[0]
            for r in stored.groupBy("user_bucket")
            .agg(F.min(ts_col).alias("_mn"))
            .where(F.col("_mn") < cutoff_ts)
            .select("user_bucket")
            .collect()
        ]
        if not stale:
            continue
        touched = stored.where(F.col("user_bucket").isin(stale))
        survivors = touched.where(F.col(ts_col) >= cutoff_ts)
        report[f"{table}_expired"] = touched.count() - survivors.count()
        if table == "user_leaderboard":
            # re-rank survivors (ranks must stay dense per user)
            survivors = _rank_state(
                survivors.select("user_id", "content_id", "score_dec", "last_ts")
            ).withColumn("last_epoch", F.lit(-1).cast("long"))
        survivors.persist()
        live = {r[0] for r in survivors.select("user_bucket").distinct().collect()}
        if live:
            _stage_swap(survivors, path, partition_by="user_bucket")
        survivors.unpersist()
        # a bucket whose EVERY key expired has no survivor rows, so the
        # dynamic overwrite never touches its partition — unlink it
        # (an empty parquet dir cannot carry schema, so a fully-expired
        # table ends as deleted partitions — the Redis "key gone" state)
        for b in stale:
            if b not in live:
                shutil.rmtree(os.path.join(path, f"user_bucket={b}"), ignore_errors=True)

    # counters: domain-sized table, whole-row expiry
    cpath = f"{base_dir}/event_counters"
    report["event_counters_expired"] = 0
    if os.path.isdir(cpath) and any(f.endswith(".parquet") for f in os.listdir(cpath)):
        cutoff_ts = now_c - F.expr(f"INTERVAL {ttls['event_counters']} SECONDS")
        stored = spark.read.parquet(cpath)
        survivors = stored.where(F.col("last_ts") >= cutoff_ts)
        n_live = survivors.count()
        n_exp = stored.count() - n_live
        report["event_counters_expired"] = n_exp
        if n_exp and n_live:
            _stage_swap(survivors, cpath)
        elif n_exp:  # every counter expired — the table IS gone
            shutil.rmtree(cpath, ignore_errors=True)
    return report


def get_funnel_levels(spark: SparkSession, state_dir: str, steps) -> DataFrame:
    """Read the funnel level per user out of the maintained state."""
    from .operators.behavioral import funnel_levels_from_states

    return funnel_levels_from_states(spark.read.parquet(state_dir), steps)
