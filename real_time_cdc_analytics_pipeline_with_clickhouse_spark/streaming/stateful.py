"""Custom stateful streaming operator via ``applyInPandasWithState``.

The Redis serving layer of the reference keeps per-user cumulative
engagement scores with a 24 h TTL (``ZINCRBY user_engagement:{user}``,
ESJ:417-421 + TTL ESJ:420).  In Spark that is a keyed stateful
operator: state = running per-content totals for the user, updated per
micro-batch, expired by a processing-time timeout — the idiomatic
Structured Streaming analog of Flink keyed state + state TTL (T5).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

OUTPUT_SCHEMA = "user_id long, content_id long, total_score double"
STATE_SCHEMA = "content_ids array<long>, totals array<double>"

DEFAULT_TTL_MS = 24 * 3600 * 1000  # ESJ:420 — 24h leaderboard TTL


def _update_user_scores_factory(ttl_ms: int):
    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # TTL expiry — drop the leaderboard state, emit nothing
            state.remove()
            return
        # vectorized merge: prior state + all batch rows concat into one
        # frame, groupby-sum (no per-row Python loop)
        parts = []
        if state.exists:
            content_ids, totals = state.get
            parts.append(pd.DataFrame({"content_id": content_ids, "s": totals}))
        for pdf in pdfs:
            rows = pdf[["content_id", "engagement_score"]].dropna(subset=["content_id"])
            parts.append(
                pd.DataFrame(
                    {
                        "content_id": rows["content_id"].astype("int64"),
                        "s": rows["engagement_score"].astype("float64"),
                    }
                )
            )
        acc = (
            pd.concat(parts, ignore_index=True).groupby("content_id")["s"].sum().sort_index()
            if parts
            else pd.Series(dtype="float64")
        )
        keys = acc.index.astype("int64").tolist()
        state.update((keys, acc.to_list()))
        if ttl_ms > 0:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(keys),
                "content_id": keys,
                "total_score": acc.round(2).to_list(),
            }
        )

    return update


LATEST_TTL_MS = 3600 * 1000  # ESJ:415 — 1h SETEX on the latest-event key

LATEST_OUTPUT_SCHEMA = (
    "user_id long, content_id long, event_id long, event_ts_us long, engagement_score double"
)
_LATEST_STATE_SCHEMA = "event_id long, event_ts_us long, engagement_score double"


def _import_tws():
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    return StatefulProcessor


def make_latest_event_processor(ttl_ms: int = LATEST_TTL_MS):
    """A8 as a ``transformWithStateInPandas`` StatefulProcessor — the
    Redis ``SETEX engagement:{user}:{content}`` analog (ESJ:412-415)
    on Spark 4's arbitrary-state API.

    Differences from the ``applyInPandasWithState`` leaderboard above
    (deliberately exercising the NEWER surface):

    - state TTL is declared on the state itself
      (``getValueState(..., ttlDurationMs=...)``) — the store expires
      the value like Redis SETEX, no timeout-branch bookkeeping in
      user code and no cleanup micro-batch churn;
    - latest-wins by (event_ts, event_id) across batches: late
      re-deliveries with older timestamps do NOT clobber the stored
      latest (the same tiebreak as the batch ``latest_event_kv``).

    The state store must be RocksDB (transformWithState requires it;
    session.py pins the provider when the build ships it), and the
    API's Python driver worker needs ``google.protobuf`` — absent in
    this container, so the pytest skip-guards (the same
    environment-gated pattern as the Kafka connector and Delta)."""
    StatefulProcessor = _import_tws()

    class LatestEventProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._latest = handle.getValueState(
                "latest", _LATEST_STATE_SCHEMA, ttlDurationMs=ttl_ms if ttl_ms > 0 else None
            )

        def handleInputRows(self, key, rows, timerValues):
            user_id, content_id = key
            best = None  # (event_ts_us, event_id, score)
            if self._latest.exists():
                ev_id, ts_us, score = self._latest.get()
                best = (ts_us, ev_id, score)
            for pdf in rows:
                sub = pdf.dropna(subset=["event_ts_us", "event_id"])
                if len(sub) == 0:
                    continue
                # vectorized in-batch latest: max over the (ts, id) order
                idx = (
                    sub[["event_ts_us", "event_id"]]
                    .astype("int64")
                    .sort_values(["event_ts_us", "event_id"])
                    .index[-1]
                )
                cand = (
                    int(sub.loc[idx, "event_ts_us"]),
                    int(sub.loc[idx, "event_id"]),
                    float(sub.loc[idx, "engagement_score"]),
                )
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
            if best is None:
                return
            ts_us, ev_id, score = best
            self._latest.update((ev_id, ts_us, score))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "content_id": [content_id],
                    "event_id": [ev_id],
                    "event_ts_us": [ts_us],
                    "engagement_score": [score],
                }
            )

        def close(self) -> None:
            pass

    return LatestEventProcessor()


def latest_event_state(enriched, ttl_ms: int = LATEST_TTL_MS):
    """Per-(user, content) latest-event KV maintained by
    ``transformWithStateInPandas`` — emits the refreshed latest row for
    every key touched by the micro-batch (update mode), exactly the
    value the Redis key would hold after the batch's SETEX calls."""
    import pyspark.sql.functions as F

    src = enriched.select(
        "user_id",
        "content_id",
        "event_id",
        F.unix_micros("event_ts").alias("event_ts_us"),
        "engagement_score",
    )
    return src.groupBy("user_id", "content_id").transformWithStateInPandas(
        statefulProcessor=make_latest_event_processor(ttl_ms),
        outputStructType=LATEST_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )


def running_user_scores(enriched, ttl_ms: int = DEFAULT_TTL_MS):
    """Per-user running (content → cumulative score) leaderboard state.

    Emits the full refreshed leaderboard for every user seen in the
    micro-batch (update mode), exactly what the Redis ZSET would hold
    after the batch's ZINCRBYs.

    ``ttl_ms > 0`` enables the TTL (processing-time timeout — note the
    engine then keeps scheduling cleanup micro-batches, so
    ``processAllAvailable`` never settles; fine under a real trigger,
    pass ``ttl_ms=0`` in drive-to-completion tests)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms > 0 else GroupStateTimeout.NoTimeout
    )
    return (
        enriched.select("user_id", "content_id", "engagement_score")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_scores_factory(ttl_ms),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            timeout,
        )
    )
