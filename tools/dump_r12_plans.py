"""Dump `.explain("formatted")` for every headline bench query into
plans/r12/<query>_<tag>.txt — the optimization round's before/after
plan evidence.

Usage: python tools/dump_r12_plans.py <tag>     (tag = before | after)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from bench import BENCH_QUERIES
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.plans.explain import (
    plan_string,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out_dir = "/root/repo/plans/r12"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-r12-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        similarity as _SIM,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import (
        load_table as _LT,
    )

    queries["ann_quantized_topk"] = lambda sp, s: _SIM.quantized_topk(
        _LT(sp, s, "embeddings"), _SIM.default_queries(_LT(sp, s, "embeddings"))
    )
    for name in BENCH_QUERIES:
        df = queries[name](spark, sf)
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan_string(df))
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
