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
