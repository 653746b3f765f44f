"""Round-11 component profiler: attributes headline-query time to
pipeline stages by timing nested sub-plans with the noop sink
(guide §1.4), min-of-N each, interleaved.

Usage: python tools/profile_r11.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.session import get_spark
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    cdc,
    dedup,
    enrich,
    rollups,
    behavioral,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark import oracle as _oracle
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

ROLLUP_FIELDS = ("id", "content_id", "event_type", "duration_ms", "event_ts")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile-r11")
    spark.sparkContext.setLogLevel("ERROR")

    def events():
        return load_table(spark, sf, "events")

    def dim():
        return enrich.compact_dim_latest(
            cdc.unwrap_content(cdc_feed.content_cdc_json(load_table(spark, sf, "part")))
        )

    def docs_dup():
        return dedup.with_exact_duplicates(load_table(spark, sf, "documents"))

    probes = {
        # --- CDC slice decomposition ---
        "feed_json_rollup_fields": lambda: cdc_feed.engagement_cdc_json(
            events(), ROLLUP_FIELDS
        ),
        "feed_json_full_fields": lambda: cdc_feed.engagement_cdc_json(events()),
        "feed_plus_unwrap": lambda: cdc.unwrap_engagement(
            cdc_feed.engagement_cdc_json(events(), ROLLUP_FIELDS)
        ),
        "dim_only": dim,
        "feed_unwrap_enrich": lambda: enrich.enrich_events(
            cdc.unwrap_engagement(cdc_feed.engagement_cdc_json(events(), ROLLUP_FIELDS)),
            dim(),
        ),
        "hourly_rollup_full": lambda: rollups.hourly_rollup(
            enrich.enrich_events(
                cdc.unwrap_engagement(
                    cdc_feed.engagement_cdc_json(events(), ROLLUP_FIELDS)
                ),
                dim(),
            )
        ),
        "trending_full": lambda: rollups.trending_recent(
            enrich.enrich_events(
                cdc.unwrap_engagement(
                    cdc_feed.engagement_cdc_json(events(), ROLLUP_FIELDS)
                ),
                dim(),
            )
        ),
        # --- funnel ---
        "funnel_parse_full_fields": lambda: cdc.unwrap_engagement(
            cdc_feed.engagement_cdc_json(events())
        ),
        "funnel_full": lambda: behavioral.funnel_levels(
            cdc.unwrap_engagement(cdc_feed.engagement_cdc_json(events())),
            ("view", "click", "purchase"),
            window_s=_oracle.FUNNEL_WINDOW_S,
        ),
        # --- dedup family ---
        "shingles_exploded": lambda: dedup._doc_shingles(docs_dup()).select(
            "doc_id", F.explode("sh").alias("shingle")
        ),
        "minhash_sigs": lambda: dedup.minhash_signatures(docs_dup()),
        "minhash_lsh_pairs": lambda: dedup.minhash_lsh_pairs(docs_dup()),
        "ngram_jaccard_full": lambda: dedup.ngram_jaccard_pairs(
            docs_dup(), threshold=0.5
        ),
        # --- relational scan parallelism ---
        "pricing_summary_asis": lambda: __import__(
            "real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.relational",
            fromlist=["pricing_summary"],
        ).pricing_summary(load_table(spark, sf, "lineitem")),
        "pricing_summary_repart": lambda: __import__(
            "real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.relational",
            fromlist=["pricing_summary"],
        ).pricing_summary(
            load_table(spark, sf, "lineitem").repartition(
                spark.sparkContext.defaultParallelism
            )
        ),
        "lineitem_scan_only": lambda: load_table(spark, sf, "lineitem"),
    }

    # warmup
    spark.range(1000).selectExpr("sum(id)").write.mode("overwrite").format(
        "noop"
    ).save()

    results: dict[str, float] = {}
    for _ in range(reps):
        for name, build in probes.items():
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            build().write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 3)
            results[name] = min(results.get(name, dt), dt)
    spark.sparkContext.setJobDescription(None)
    for name, dt in results.items():
        print(f"{name:35s} {dt:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
