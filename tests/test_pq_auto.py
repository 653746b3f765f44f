"""``passage_topk(use_pq="auto")`` (round-9 verdict task 5): the
serving tier self-selects from the vector manifest's cell-occupancy
stats — float below the ADC lookup-table amortization point (round 8
measured the PQ path 35% slower at sf0.1 occupancy), PQ above it, and
always float when the index stores no PQ codes."""

from __future__ import annotations

import pyspark.sql.functions as F

import real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.ivf_index as ivf
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    passage,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


def _docs(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )


def _q(spark, docs):
    return spark.createDataFrame(
        [(0, docs.orderBy("doc_id").first().text[:150])], "query_id long, text string"
    )


def _spy(monkeypatch, calls):
    orig_pq, orig_float = ivf.ivf_index_topk_pq, ivf.ivf_index_topk

    def spy_pq(*a, **k):
        calls.append("pq")
        return orig_pq(*a, **k)

    def spy_float(*a, **k):
        calls.append("float")
        return orig_float(*a, **k)

    monkeypatch.setattr(ivf, "ivf_index_topk_pq", spy_pq)
    monkeypatch.setattr(ivf, "ivf_index_topk", spy_float)


def test_auto_tier_selection(spark, sf_dir, tmp_path, monkeypatch):
    docs = _docs(spark, sf_dir)
    q = _q(spark, docs)
    idx = str(tmp_path / "pq")
    passage.build_passage_index(docs, idx, n_centroids=4, seed=7, pq_m=8)
    want = sorted(
        map(tuple, passage.passage_topk(spark, q, idx, k=5, n_probe=4).collect())
    )

    calls: list[str] = []
    _spy(monkeypatch, calls)

    # small deployment: occupancy below the amortization point → float
    got = sorted(
        map(
            tuple,
            passage.passage_topk(
                spark, q, idx, k=5, n_probe=4, use_pq="auto"
            ).collect(),
        )
    )
    assert calls == ["float"]
    assert got == want and got

    # above the (patched) breakeven: auto routes to the ADC tier
    calls.clear()
    monkeypatch.setattr(passage, "PQ_AUTO_MIN_PROBED_ROWS", 1)
    pq_rows = passage.passage_topk(
        spark, q, idx, k=5, n_probe=4, use_pq="auto"
    ).collect()
    assert calls == ["pq"]
    assert pq_rows

    # an index WITHOUT stored PQ codes stays float even above breakeven
    idx2 = str(tmp_path / "nopq")
    passage.build_passage_index(docs, idx2, n_centroids=4, seed=7)
    calls.clear()
    passage.passage_topk(spark, q, idx2, k=5, n_probe=4, use_pq="auto").collect()
    assert calls == ["float"]
