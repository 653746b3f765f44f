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


def test_plan_is_one_aggregation_no_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = corpus.corpus_report(docs)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker
    # one scan feeds everything — the projection is computed map-side
    assert plan.count("Scan parquet") == 1
