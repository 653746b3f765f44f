"""Fleet-wide physical-plan audit: no query may plan a cartesian or
nested-loop join except the documented scalar/bounded broadcasts.

At 100 TB an accidental CartesianProduct or a BroadcastNestedLoopJoin
against an unbounded side is a job-killer; this guard catches one the
moment a query regresses, across the WHOLE registry rather than the
few hand-picked plans in test_plans.py.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.plans.explain import plan_string

QUERIES = entrymod.queries()

# Queries whose BroadcastNestedLoopJoin is a deliberate 1-row-or-bounded
# broadcast, reviewed for scale:
#   trending_recent      — scalar max minute-bucket retention bound (1 row)
#   tfidf_top_terms      — scalar corpus count n_docs (1 row)
#   ann_bruteforce_topk  — the query SET broadcast against the corpus
#                          (exact-baseline semantics; corpus never shuffles)
#   bm25_topk            — scalar corpus stats (n_docs, avgdl): 1-row
#                          aggregate broadcast against the candidate set
#   hybrid_rrf           — inherits bm25_topk's stats row plus the
#                          1-vector query broadcast of its exact-cosine
#                          leg (ann_bruteforce_topk's reviewed shape)
# (ann_quantized_topk left the driver registry in round 10; its plan is
# still audited via ann_bruteforce_topk's identical shape and its
# oracle twin in test_consolidated.py.)
BNLJ_ALLOWED = {
    "trending_recent",
    "tfidf_top_terms",
    "ann_bruteforce_topk",
    "bm25_topk",
    "hybrid_rrf",
}

# streaming_replay_rollup runs an actual stream; its batch twin
# (hourly_rollup) is audited instead.
SKIP = {"streaming_replay_rollup"}


@pytest.mark.parametrize("name", sorted(set(QUERIES) - SKIP))
def test_no_unintended_cartesian_or_bnlj(name, spark, sf_dir):
    plan = plan_string(QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a BroadcastNestedLoopJoin (not on the reviewed allow-list)"
        )


def test_trending_anchor_reuses_rollup_exchange(spark, sf_dir):
    """Perf regression guard: trending_recent's max-bucket anchor must
    read the rollup's own shuffle (ReusedExchange / AQE stage reuse),
    not re-parse the CDC feed a second time."""
    df = QUERIES["trending_recent"](spark, sf_dir)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed or "(reused)" in executed, (
        "anchor branch no longer reuses the rollup exchange"
    )


def test_aqe_splits_skewed_join(spark):
    """T10 skew lever, demonstrated live: a 90%-one-key join with
    thresholds scaled to the fixture must plan skew=true splits in the
    final adaptive SortMergeJoin — the same mechanism that rescues a
    hot-key shuffle at 100 TB (there with the default 256 MB
    thresholds)."""
    import pyspark.sql.functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        facts = spark.range(200000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("v"),
        )
        dims = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        agg = facts.join(dims, "k").groupBy().count()
        assert agg.collect()[0][0] == 200000
        executed = agg._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, "AQE did not split the skewed partition"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_topk_state_aggregates_map_side(spark, sf_dir):
    """The topK state's one fact shuffle must be a partial (map-side)
    hash aggregate — the count collapses before the exchange, so the
    shuffle carries (keys × items) rows, not facts."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import sketches

    enr = entrymod._enriched(spark, sf_dir)
    plan = plan_string(sketches.topk_state(enr, "content_id", ["event_type"], 16))
    assert "partial_count" in plan or "partial_" in plan.lower(), plan


def test_routed_aggregate_scans_projection_not_facts(spark, sf_dir, tmp_path):
    """When a projection covers the grouping, the physical plan must
    read the projection parquet and never touch the fact table — the
    whole point of the feature at 100 TB."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark import warehouse

    wh = str(tmp_path / "wh_audit")
    proot = str(tmp_path / "proj_audit")
    warehouse.write_warehouse(entrymod._enriched(spark, sf_dir), wh)
    warehouse.define_projection(spark, wh, proot, "by_type", ["event_type"])
    df, src = warehouse.routed_aggregate(spark, wh, proot, ["event_type"])
    assert src == "by_type"
    plan = plan_string(df)
    assert "proj_audit" in plan and "wh_audit" not in plan, plan


# Shuffle-count budgets for the heaviest headline queries: at 100 TB
# every extra Exchange is a full re-shuffle of the working set, so a
# regression that sneaks one in (a lost ReusedExchange, a broken
# broadcast, an accidental repartition) should fail loudly here even
# when the sf0.1 wall-clock hides it.  Budgets are the CURRENT plan's
# exchange count, reviewed as the intended shape — not aspirational.
SHUFFLE_BUDGET = {
    "hourly_rollup": 3,       # feed repartition + agg + dim-compaction window
    "dedup_latest": 3,
    "trending_recent": 6,     # minute agg + topk window + retention anchor (reused) + dims
    "dedup_minhash_lsh": 4,
    "dedup_ngram_jaccard": 11,  # shingle build + df-cap + self-join + jaccard aggs
    "tfidf_top_terms": 10,
    "quality_signals": 2,
    "funnel_levels": 2,       # seq-build agg + dim window
}

@pytest.mark.parametrize("name", sorted(SHUFFLE_BUDGET))
def test_shuffle_count_within_budget(name, spark, sf_dir):
    import re

    plan = plan_string(QUERIES[name](spark, sf_dir))
    # formatted-plan node headers: "(N) Exchange" = a real shuffle;
    # BroadcastExchange nodes are deliberate and excluded
    n = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n <= SHUFFLE_BUDGET[name], (
        f"{name}: {n} exchanges, budget {SHUFFLE_BUDGET[name]} — a shuffle crept in"
    )


def test_decontam_plans_no_cartesian_and_broadcast_benchmark(spark, sf_dir):
    """The cross-corpus decontamination family must candidate-join on
    the band key (never a cartesian), and the benchmark side of the
    fit-per-call flow must be a broadcast — the 100 TB training side
    may not shuffle to meet an eval-set-sized table."""
    import pyspark.sql.functions as F

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import decontam
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    bench = docs.where(F.col("doc_id") < 20)
    train = docs.where(F.col("doc_id") >= 100)
    for df in [
        decontam.fuzzy_decontaminate(train, bench),
        decontam.excise_contaminated_spans(train, bench),
    ]:
        plan = plan_string(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan  # the benchmark side broadcasts


def test_bpe_encode_python_only_on_vocab_side(spark, sf_dir):
    """bpe_encode_ids must run Python exactly once — the Arrow-batched
    UDF over the DISTINCT-word table — never per corpus row: one
    ArrowEvalPython node in the plan, and no row-at-a-time
    BatchEvalPython anywhere."""
    import pyspark.sql.functions as F

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import bpe
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    merges = bpe.train_bpe(docs, n_merges=3)
    import re

    plan = plan_string(bpe.bpe_encode_ids(docs, merges))
    # formatted plans print each node twice (tree + detail) — count
    # unique node entries
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1, plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
