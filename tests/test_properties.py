"""Property-based tests (hypothesis): engine semantics vs independent
Python models, beyond the fixed fixtures."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.scalar import (
    engagement_score,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.enrich import (
    compact_dim_latest,
)

# (key, op, source_ts, length) — at most one op per (key, ts) so the
# latest-wins tiebreak is well-defined (matches arrival-order overwrite
# in the reference's broadcast map, ESJ:310-318)
_ops = st.lists(
    st.tuples(
        st.integers(0, 4),
        st.sampled_from(["c", "u", "d"]),
        st.integers(0, 20),
        st.integers(1, 999),
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(seq=_ops)
def test_dim_compaction_matches_fold_model(spark, seq):
    # keep one op per (key, ts)
    uniq = {}
    for key, op, ts, length in seq:
        uniq[(key, ts)] = (key, op, ts, length)
    rows = [
        (str(k), None if op == "d" else f"t{k}", None if op == "d" else f"T{k}",
         None if op == "d" else "podcast", None if op == "d" else length,
         op == "d", ts)
        for (k, op, ts, length) in uniq.values()
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "id string, slug string, title string, content_type string, "
              "length_seconds long, is_delete boolean, source_ts_ms long"
    ).withColumn("id", F.col("id").cast("long"))
    got = {r["id"]: r["length_seconds"] for r in compact_dim_latest(df).collect()}

    # model: per key, winner = max (ts, is_delete); delete removes key
    model = {}
    for (k, op, ts, length) in uniq.values():
        cur = model.get(k)
        if cur is None or (ts, op == "d") >= cur[0]:
            model[k] = ((ts, op == "d"), None if op == "d" else length)
    want = {k: v for k, (rank, v) in model.items() if v is not None}
    assert got == want


_events = st.lists(
    st.tuples(
        st.sampled_from(["view", "click", "signup", "purchase", "error", "VIEW", "x"]),
        st.one_of(st.none(), st.integers(-5, 5_000_000)),
    ),
    min_size=1,
    max_size=50,
)

_BASE = {"view": 1.0, "signup": 0.5, "purchase": 3.0, "click": 0.2}


def _model_score(event_type: str, duration_ms) -> float:
    base = _BASE.get(event_type.lower(), 1.0)
    mult = 1.0
    if duration_ms is not None and duration_ms > 0:
        mult = min(2.5, math.log(duration_ms / 1000.0 + 1))
    x = base * mult
    return float(Decimal(repr(x)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))


@settings(max_examples=12, deadline=None)
@given(events=_events)
def test_engagement_score_matches_model(spark, events):
    df = spark.createDataFrame(
        [(i, t, d) for i, (t, d) in enumerate(events)],
        "i long, event_type string, duration_ms long",
    )
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i", engagement_score(F.col("event_type"), F.col("duration_ms")).alias("s")
        ).collect()
    }
    for i, (t, d) in enumerate(events):
        assert got[i] == _model_score(t, d), (t, d, got[i], _model_score(t, d))


_pii_text = st.lists(
    st.one_of(
        st.text(alphabet="abcdefghij XYZ.,-@", min_size=0, max_size=12),
        st.sampled_from(
            [
                "bob@example.com",
                "a.b-c_d@sub.domain.io",
                "555-0134",
                "call 555-9999 now",
                "10.20.30.40",
                "192.168.1.255",
                "not@tld",
                "555-12",
                "1.2.3",
            ]
        ),
    ),
    min_size=0,
    max_size=8,
).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(_pii_text, min_size=1, max_size=6))
def test_pii_redaction_idempotent_and_clean(spark, texts):
    """For arbitrary text with embedded PII fragments: (1) no PII
    pattern survives redaction, (2) redaction is idempotent — the
    placeholders contain no redactable substring."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import quality

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = quality.pii_redact(docs, keep_text=True)
    residue = once.where(
        (F.regexp_count("redacted", F.lit(quality.EMAIL_RE)) > 0)
        | (F.regexp_count("redacted", F.lit(quality.PHONE_RE)) > 0)
        | (F.regexp_count("redacted", F.lit(quality.IP_RE)) > 0)
    ).count()
    assert residue == 0
    twice = quality.pii_redact(
        once.select("doc_id", F.col("redacted").alias("text")), keep_text=True
    )
    pairs = once.select("doc_id", "redacted").join(
        twice.select("doc_id", F.col("redacted").alias("re2")), "doc_id"
    )
    assert pairs.where(F.col("redacted") != F.col("re2")).count() == 0


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(st.text(alphabet="abc d.!", min_size=0, max_size=30), min_size=1, max_size=6))
def test_quality_metric_bounds(spark, texts):
    """All ratio metrics live in [0,1] (or null), token counts are
    non-negative, and every input doc comes back exactly once."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import quality

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = quality.quality_signals(docs).collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(len(texts)))
    for r in rows:
        assert r["n_tokens"] >= 0
        for m in ("distinct_ratio", "top_token_frac", "dup_bigram_frac"):
            v = r[m]
            assert v is None or 0.0 <= v <= 1.0, (m, v)
        assert r["mean_word_len"] is None or r["mean_word_len"] > 0
