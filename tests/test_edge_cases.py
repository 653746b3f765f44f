"""Edge-case robustness: empty inputs and degenerate documents must
flow through every operator without errors."""

from __future__ import annotations

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    cdc,
    dedup,
    enrich,
    rollups,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


def test_empty_event_stream(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").where(F.lit(False))
    dim = enrich.compact_dim_latest(
        cdc.unwrap_content(cdc_feed.content_cdc_json(load_table(spark, sf_dir, "part")))
    )
    enriched = enrich.enrich_events(
        cdc.unwrap_engagement(cdc_feed.engagement_cdc_json(events)), dim
    )
    assert enriched.count() == 0
    assert rollups.hourly_rollup(enriched).count() == 0
    assert rollups.minute_topk(enriched).count() == 0
    assert rollups.latest_event(enriched).count() == 0


def test_degenerate_documents(spark):
    """Empty text, punctuation-only, single word, sub-shingle-length —
    the guards (empty-shingle arrays, token filters) must hold."""
    docs = spark.createDataFrame(
        [
            (1, "", "en", "s", 0),
            (2, "!!! ??? ...", "en", "s", 11),
            (3, "word", "en", "s", 4),
            (4, "two words", "en", "s", 9),
            (5, "exactly three words", "en", "s", 19),
            (6, "exactly three words", "en", "s", 19),  # dup of 5
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # shingle-based ops: docs 1-4 contribute nothing; 5/6 pair up
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in pairs] == [(5, 6, 1.0)]
    cands = dedup.minhash_lsh_pairs(docs).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in cands] == [(5, 6)]
    # simhash drops empty-token docs, keeps the rest
    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprints(docs).collect()}
    assert 1 not in fps and 2 not in fps  # no alphanumeric tokens
    assert fps[5] == fps[6]
    # exact dedup sees the duplicate pair (and the empty/punct pair,
    # which both normalize to "")
    groups = {r["keeper"]: r["n_dups"] for r in dedup.exact_dedup_groups(docs).collect()}
    assert groups == {1: 2, 5: 2}


def test_dim_with_all_deleted_keys(spark):
    changes = spark.createDataFrame(
        [
            (1, "s", "t", "podcast", 60, False, 100),
            (1, None, None, None, None, True, 200),
        ],
        "id long, slug string, title string, content_type string, "
        "length_seconds long, is_delete boolean, source_ts_ms long",
    )
    assert enrich.compact_dim_latest(changes).count() == 0


def test_quality_signals_keeps_tokenless_docs(spark):
    """A document with no tokens must surface as n_tokens=0 /
    quality_ok=false, not vanish from the quality report."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import quality

    docs = spark.createDataFrame(
        [
            (1, "", "en", "s", 0),
            (2, "!!! ... ###", "en", "s", 11),
            (3, "real words here make a documentworth keeping around ok", "en", "s", 54),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r["doc_id"]: r for r in quality.quality_signals(docs).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_tokens"] == 0 and rows[1]["quality_ok"] is False
    assert rows[2]["n_tokens"] == 0 and rows[2]["quality_ok"] is False
    assert rows[3]["n_tokens"] > 0


def test_pii_redact_leaves_no_pattern_behind(spark):
    """Redaction property: after the replace chain, none of the PII
    regexes match the redacted text — including adversarial placements
    (string edges, adjacency, multiples)."""
    import pyspark.sql.functions as F

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import quality

    texts = [
        "a@b.co starts it and ends with x.y@example.org",
        "call 555-1234 or 555-9999 from 10.0.0.1",
        "mixed a.b-c_d@sub.domain.io 192.168.1.255 555-0000 tail",
        "no pii at all",
        "555-123 (too short) 1.2.3 (not an ip) not@tld (no dot)",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = quality.pii_redact(docs, keep_text=True)
    residue = out.where(
        (F.regexp_count("redacted", F.lit(quality.EMAIL_RE)) > 0)
        | (F.regexp_count("redacted", F.lit(quality.PHONE_RE)) > 0)
        | (F.regexp_count("redacted", F.lit(quality.IP_RE)) > 0)
    ).collect()
    assert not residue, residue
    got = {r["doc_id"]: r for r in out.collect()}
    assert (got[0]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (2, 2, 1)
    assert got[3]["has_pii"] is False and got[4]["has_pii"] is False


def test_dedup_latest_null_version_group_keeps_concrete_row(spark):
    """A key whose every row has a NULL version (the lenient timestamp
    parser emits NULLs by design) must still dedup to one CONCRETE row
    — bare-column max_by would ignore all of them and emit an all-NULL
    payload (round-2 ADVICE)."""
    from datetime import datetime

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import rollups

    t1, t2 = datetime(2024, 1, 1, 10, 0, 0), datetime(2024, 1, 1, 11, 0, 0)
    df = spark.createDataFrame(
        [
            ("e1", None, "payload-a"),
            ("e1", None, "payload-b"),
            ("e2", t1, "old"),
            ("e2", t2, "new"),
            ("e3", None, "null-loses"),
            ("e3", t1, "concrete-wins"),
        ],
        "event_id string, event_ts timestamp, payload string",
    )
    got = {r["event_id"]: r for r in rollups.dedup_latest_event_version(df).collect()}
    assert got["e1"]["payload"] in ("payload-a", "payload-b")  # concrete, not NULL
    assert got["e2"]["payload"] == "new"
    assert got["e3"]["payload"] == "concrete-wins"  # NULL sorts below any value
