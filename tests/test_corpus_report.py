"""corpus_report (operators/corpus.py): the per-(source, lang)
dataset-card summary, recomputed end-to-end by DuckDB."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    corpus,
    dedup,
)


def test_report_matches_duckdb_twin(spark, sf_dir, ducks, tmp_path):
    docs = dedup.with_exact_duplicates(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    got = {
        (r.source, r.lang): (
            r.n_docs,
            r.n_tokens,
            r.n_distinct,
            r.dup_rate,
            r.mean_tokens,
            r.p50_tokens,
            r.p95_tokens,
        )
        for r in corpus.corpus_report(docs).collect()
    }
    docs.write.mode("overwrite").parquet(str(tmp_path / "docs_report"))
    sql = f"""
WITH d AS (
  SELECT source, lang,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS digest,
         len(list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                         x -> x <> '')) AS n_toks
  FROM '{tmp_path}/docs_report/*.parquet'
)
SELECT source, lang, count(*), sum(n_toks), count(DISTINCT digest),
       round(1.0 - count(DISTINCT digest)::DOUBLE / count(*), 6),
       round(avg(n_toks), 2),
       quantile_cont(n_toks, 0.5), quantile_cont(n_toks, 0.95)
FROM d GROUP BY 1, 2
"""
    want = {(r[0], r[1]): tuple(r[2:]) for r in ducks.execute(sql).fetchall()}
    assert set(got) == set(want) and got
    for key, g in got.items():
        w = want[key]
        assert (g[0], g[1], g[2]) == (w[0], w[1], w[2]), key
        assert g[3] == pytest.approx(w[3], abs=1e-6), key  # dup_rate
        assert g[4] == pytest.approx(w[4], abs=1e-2), key  # mean
        assert g[5] == pytest.approx(w[5], rel=1e-9), key  # p50
        assert g[6] == pytest.approx(w[6], rel=1e-9), key  # p95


def test_duplicates_show_up_only_in_dup_rate(spark, sf_dir):
    """Planted exact duplicates raise dup_rate for their groups and
    leave distinct counts equal to the clean corpus's doc counts."""
    clean = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dup = dedup.with_exact_duplicates(clean)
    rc = {(r.source, r.lang): r for r in corpus.corpus_report(clean).collect()}
    rd = {(r.source, r.lang): r for r in corpus.corpus_report(dup).collect()}
    assert set(rc) == set(rd)
    planted = clean.where(F.col("doc_id") % 10 == 0).count()
    assert planted > 0
    extra = sum(rd[k].n_docs - rc[k].n_docs for k in rc)
    assert extra == planted
    for k in rc:
        # every clean fixture doc is distinct, so distincts are stable
        assert rd[k].n_distinct == rc[k].n_distinct == rc[k].n_docs
        if rd[k].n_docs > rc[k].n_docs:
            assert rd[k].dup_rate > 0.0
    # the report never exceeds the bounded group domain
    assert len(rd) <= 20 * 5 + 5


def test_incremental_card_equals_one_shot_and_tracks_exact(spark, sf_dir, tmp_path):
    """Three incremental folds ≡ one bootstrap fold EXACTLY (HLL
    registers merge by max); estimates track the exact report —
    counts/means equal, dup_rate within sketch error, quantiles
    within the log-histogram bound."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        sketches,
    )

    docs = dedup.with_exact_duplicates(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).persist()
    inc, one = str(tmp_path / "inc"), str(tmp_path / "one")
    corpus.merge_corpus_card_increment(spark, f"{one}/card", docs)
    sketches.merge_log_histogram_increment(
        spark, f"{one}/lenhist", corpus._report_projection(docs), "n_toks",
        ["source", "lang"],
    )
    for i in range(3):
        b = docs.where(F.col("doc_id") % 3 == i)
        corpus.merge_corpus_card_increment(spark, f"{inc}/card", b, epoch=i)
        sketches.merge_log_histogram_increment(
            spark, f"{inc}/lenhist", corpus._report_projection(b), "n_toks",
            ["source", "lang"], epoch=i,
        )
    gi = {
        (r.source, r.lang): r
        for r in corpus.read_corpus_card(spark, inc).collect()
    }
    go = {
        (r.source, r.lang): r
        for r in corpus.read_corpus_card(spark, one).collect()
    }
    assert set(gi) == set(go) and gi
    for k in gi:
        assert tuple(gi[k]) == tuple(go[k]), k  # exact, incl. HLL estimates

    exact = {(r.source, r.lang): r for r in corpus.corpus_report(docs).collect()}
    # the log-histogram guarantees alpha relative error of the exact
    # RANK-q element (quantile_disc), not the interpolated percentile
    # the one-shot report uses — with ~5-doc groups the two quantile
    # definitions diverge far beyond sketch error, so compare each
    # against its own contract
    import math

    toks = {}
    for row in corpus._report_projection(docs).collect():
        toks.setdefault((row.source, row.lang), []).append(row.n_toks)
    for k, r in gi.items():
        e = exact[k]
        assert (r.n_docs, r.n_tokens, r.mean_tokens) == (
            e.n_docs, e.n_tokens, e.mean_tokens,
        ), k
        assert r.dup_rate == pytest.approx(e.dup_rate, abs=0.05), k
        vals = sorted(toks[k])
        for got_q, q in ((r.p50_tokens, 0.5), (r.p95_tokens, 0.95)):
            rank_elem = vals[math.ceil(q * len(vals)) - 1]
            assert got_q == pytest.approx(rank_elem, rel=0.011), (k, q)
    docs.unpersist()


def test_streaming_report_sink_equals_batch_fold(spark, sf_dir, tmp_path):
    import os

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        sketches,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import (
        pipeline as sp,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    feed = str(tmp_path / "rfeed")
    os.makedirs(feed)
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{feed}/f{i}.parquet")
    base = str(tmp_path / "live_card")
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/*.parquet")
    )
    q = sp.start_corpus_report_sink(stream, base, str(tmp_path / "ck_card"))
    q.processAllAvailable()
    q.stop()

    ref = str(tmp_path / "ref_card")
    corpus.merge_corpus_card_increment(spark, f"{ref}/card", docs)
    sketches.merge_log_histogram_increment(
        spark, f"{ref}/lenhist", corpus._report_projection(docs), "n_toks",
        ["source", "lang"],
    )
    gs = sorted(map(tuple, corpus.read_corpus_card(spark, base).collect()))
    gr = sorted(map(tuple, corpus.read_corpus_card(spark, ref).collect()))
    assert gs == gr and gs

    # crash-window replay of the final epoch: both state tables carry
    # its stamp, so the re-fold no-ops
    last = docs.where(F.col("doc_id") % 3 == 2)
    corpus.merge_corpus_card_increment(spark, f"{base}/card", last, epoch=2)
    sketches.merge_log_histogram_increment(
        spark, f"{base}/lenhist", corpus._report_projection(last), "n_toks",
        ["source", "lang"], epoch=2,
    )
    again = sorted(map(tuple, corpus.read_corpus_card(spark, base).collect()))
    assert again == gs
    docs.unpersist()


def test_plan_is_one_aggregation_no_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = corpus.corpus_report(docs)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker
    # one scan feeds everything — the projection is computed map-side
    assert plan.count("Scan parquet") == 1
