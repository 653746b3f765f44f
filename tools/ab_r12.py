"""Session-interleaved A/B harness for the round-12 optimization
changes: each arm toggled by monkeypatch inside ONE session, arms
alternating (A,B,A,B,...), min-of-N each — the only comparison this
host's ±2x cross-session swings allow (round-11 lesson).

Usage: python tools/ab_r12.py <case> [reps]
  cases: cc | cv | upsert
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.session import get_spark
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

SF = "/root/testdata/sf0.1"


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def run_arms(spark, arms: dict, reps: int) -> None:
    best: dict[str, list[float]] = {k: [] for k in arms}
    for i in range(reps):
        for name, fn in arms.items():
            spark.sparkContext.setJobDescription(f"ab12:{name}#{i}")
            t0 = time.time()
            fn()
            best[name].append(round(time.time() - t0, 3))
    for name, xs in best.items():
        print(f"{name:28s} min={min(xs):7.3f}  samples={xs}")


# --- the round-11 (pre-change) connected_components, verbatim ---------
def cc_eager(pairs: DataFrame, max_iter: int = 25, fallback_to_star: bool = True) -> DataFrame:
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.dedup import (
        _iteration_shuffle,
        connected_components_star,
    )

    und = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    und = und.localCheckpoint(eager=True)
    spark = pairs.sparkSession
    with _iteration_shuffle(spark, und.count()):
        labels = (
            und.groupBy("src")
            .agg(F.min("dst").alias("_mn"))
            .select(
                F.col("src").alias("doc_id"),
                F.least("src", "_mn").alias("label"),
            )
        ).localCheckpoint(eager=True)
        prev_sum = labels.agg(F.sum("label")).first()[0]
        for _ in range(max_iter - 1):
            prop = und.withColumnRenamed("src", "doc_id").join(labels, "doc_id").select(
                F.col("dst").alias("doc_id"), "label"
            )
            labels = (
                labels.unionByName(prop).groupBy("doc_id").agg(F.min("label").alias("label"))
            ).localCheckpoint(eager=True)
            cur_sum = labels.agg(F.sum("label")).first()[0]
            if cur_sum == prev_sum:
                return labels
            prev_sum = cur_sum
    if fallback_to_star:
        return connected_components_star(pairs)
    raise RuntimeError("did not converge")


def case_cc(spark, reps):
    """dedup_clusters: lazy-checkpoint fused convergence probe (new)
    vs eager checkpoint + separate sum job per round (r11)."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import dedup

    docs = dedup.with_exact_duplicates(load_table(spark, SF, "documents"))
    new_cc = dedup.connected_components

    def arm_new():
        dedup.connected_components = new_cc
        noop(dedup.dedup_clusters(docs))

    def arm_old():
        dedup.connected_components = cc_eager
        try:
            noop(dedup.dedup_clusters(docs))
        finally:
            dedup.connected_components = new_cc

    run_arms(spark, {"cc_lazy_fused": arm_new, "cc_eager_r11": arm_old}, reps)


# --- the round-11 (pre-change) content_versions, verbatim -------------
def cv_union(part: DataFrame) -> DataFrame:
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources.cdc_feed import (
        DIM_TS_BASE_MS,
    )

    pk = F.col("p_partkey")
    ctype = (
        F.when(pk % 3 == 0, "podcast").when(pk % 3 == 1, "newsletter").otherwise("video")
    )
    base = part.select(
        pk.cast("string").alias("id"),
        F.lower(F.regexp_replace(F.col("p_name"), " ", "-")).alias("slug"),
        F.col("p_name").alias("title"),
        ctype.alias("content_type"),
        (F.col("p_size").cast("long") * 60).alias("length_seconds"),
        F.lit("2024-01-01T00:00:00").alias("publish_ts"),
        F.lit("c").alias("op"),
        (F.lit(DIM_TS_BASE_MS) + pk * 10 + 1).alias("source_ts_ms"),
        pk.alias("_key"),
    )
    v2 = (
        base.where(F.col("_key") % 3 == 0)
        .withColumn("length_seconds", F.col("length_seconds") + 30)
        .withColumn("op", F.lit("u"))
        .withColumn("source_ts_ms", F.col("source_ts_ms") + 1)
    )
    v3 = (
        base.where(F.col("_key") % 17 == 0)
        .withColumn("op", F.lit("d"))
        .withColumn("source_ts_ms", F.col("source_ts_ms") + 2)
    )
    return base.unionAll(v2).unionAll(v3)


def case_cv(spark, reps):
    """content feed → unwrap → dim compaction: single-scan inline (new)
    vs three-branch union (r11)."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import cdc, enrich
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed

    part = load_table(spark, SF, "part")
    new_cv = cdc_feed.content_versions

    def build():
        return enrich.compact_dim_latest(cdc.unwrap_content(cdc_feed.content_cdc_json(part)))

    def arm_new():
        cdc_feed.content_versions = new_cv
        noop(build())

    def arm_old():
        cdc_feed.content_versions = cv_union
        try:
            noop(build())
        finally:
            cdc_feed.content_versions = new_cv

    run_arms(spark, {"cv_single_scan": arm_new, "cv_union_r11": arm_old}, reps)




# --- the round-11 (pre-change) minhash_signatures, verbatim -----------
def sigs_agg(documents, n=3, k=None, hash_mode="md5"):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import dedup

    k = k or dedup.N_MINHASH
    exploded = dedup._doc_shingles(documents, n).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    return exploded.groupBy("doc_id").agg(*dedup._minhash_aggs(k, hash_mode))


def case_minhash(spark, reps):
    """minhash_lsh_pairs + dedup_clusters: array map-side sigs (new)
    vs explode+groupBy agg sigs (r11)."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import dedup

    docs = dedup.with_exact_duplicates(load_table(spark, SF, "documents"))
    new_sigs = dedup.minhash_signatures

    def with_old(fn):
        dedup.minhash_signatures = sigs_agg
        try:
            fn()
        finally:
            dedup.minhash_signatures = new_sigs

    arms = {
        "lsh_pairs_array": lambda: noop(dedup.minhash_lsh_pairs(docs)),
        "lsh_pairs_agg_r11": lambda: with_old(lambda: noop(dedup.minhash_lsh_pairs(docs))),
        "clusters_array": lambda: noop(dedup.dedup_clusters(docs)),
        "clusters_agg_r11": lambda: with_old(lambda: noop(dedup.dedup_clusters(docs))),
    }
    run_arms(spark, arms, reps)


def case_sigs(spark, reps):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import dedup

    docs = dedup.with_exact_duplicates(load_table(spark, SF, "documents"))
    arms = {
        "sigs_array": lambda: noop(dedup.minhash_signatures(docs)),
        "sigs_agg_r11": lambda: noop(sigs_agg(docs)),
    }
    run_arms(spark, arms, reps)


def case_ngram(spark, reps):
    """NEGATIVE RESULT (kept for the record): replacing the ngram
    pair self-join with per-shingle collect_list + in-array pair
    expansion (bounded by max_df=100, exchange-reusing the window's
    shingle partitioning) measured 2x SLOWER at 10x (19.6 vs 10.2 s
    min-of-4) and a wash at sf0.1 (1.79 vs 1.89) - the nested
    higher-order-function expansion allocates ~df^2/2 structs per
    group outside WholeStageCodegen, losing to the sort-merge join
    it replaced.  Same lesson as the array-minhash attempt."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import dedup

    def ngram_pairs_grouped(documents, n=3, threshold=0.5, max_df=dedup.MAX_SHINGLE_DF):
        exploded = dedup._doc_shingles(documents, n).select(
            "doc_id", F.explode("sh").alias("shingle")
        )
        w = Window.partitionBy("shingle")
        kept = (
            exploded.withColumn("_df", F.count("*").over(w))
            .where(F.col("_df") <= max_df)
            .drop("_df")
        )
        sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
        grp = kept.groupBy("shingle").agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        ds = F.col("ds")
        pair_arr = F.flatten(F.transform(
            ds, lambda x, i: F.transform(
                F.slice(ds, i + F.lit(2), F.size(ds)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            )))
        common = (
            grp.select(F.explode(pair_arr).alias("p"))
            .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
            .agg(F.count("*").alias("n_common"))
        )
        sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
        sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
        j = (
            common.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard", F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        )
        return j.where(F.col("jaccard") >= threshold)

    docs = dedup.with_exact_duplicates(load_table(spark, SF, "documents"))
    arms = {
        "ngram_grouped": lambda: noop(ngram_pairs_grouped(docs)),
        "ngram_selfjoin": lambda: noop(dedup.ngram_jaccard_pairs(docs, threshold=0.5)),
    }
    run_arms(spark, arms, reps)


def main():
    case = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-r12")
    spark.sparkContext.setLogLevel("ERROR")
    globals()[f"case_{case}"](spark, reps)
    spark.stop()


if __name__ == "__main__":
    main()
