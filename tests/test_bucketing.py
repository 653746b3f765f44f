"""Bucketed co-located join: the scale lever for repeated big-big
joins (SURVEY.md §4 / README scale notes) — bucketing both fact tables
on the join key removes the shuffle entirely."""

from __future__ import annotations

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.plans.explain import plan_string
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    (
        li.write.format("parquet").mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        od.write.format("parquet").mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("od_bucketed")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_bucketed").join(
            spark.table("od_bucketed"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = plan_string(joined)
        assert "Exchange" not in plan, "bucketed join still shuffles:\n" + plan
        # and it still computes the right thing
        n = joined.count()
        plain = li.join(od, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS od_bucketed")
