"""Idle-host re-band of the CDC wire-parse probe (round-10 verdict #6).

Replays bench.py's `_cdc_events_per_sec_wire` methodology exactly —
materialize the JSON wire once (untimed), then time
scan→parse→enrich→score→rollup with the noop sink — but min-of-5
instead of min-of-3, on an otherwise idle host, to decide whether the
round-10 ~99-114k/s level vs rounds 8-9's 128-152k/s is host drift or
a real regression on the (untouched) envelope-parse path.

Usage: python tools/wire_reband.py [sf_dir] [reps]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    cdc,
    enrich,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    rollups as RU,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.session import get_spark
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.sources import cdc_feed
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("wire-reband")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf, "events")
    n_events = ev.count()
    wire_dir = tempfile.mkdtemp(prefix="graft_wire_reband_")
    try:
        cdc_feed.engagement_cdc_json(ev).write.mode("overwrite").text(f"{wire_dir}/e")
        cdc_feed.content_cdc_json(load_table(spark, sf, "part")).write.mode(
            "overwrite"
        ).text(f"{wire_dir}/c")
        wire_slice = RU.hourly_rollup(
            enrich.enrich_events(
                cdc.unwrap_engagement(spark.read.text(f"{wire_dir}/e")),
                enrich.compact_dim_latest(
                    cdc.unwrap_content(spark.read.text(f"{wire_dir}/c"))
                ),
            )
        )
        samples = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"wire-reband#{i}")
            t0 = time.time()
            wire_slice.write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 3))
        best = min(samples)
        print(f"samples_sec={samples}")
        print(f"min_sec={best}  events={n_events}  events_per_sec={n_events / best:,.1f}")
    finally:
        shutil.rmtree(wire_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
