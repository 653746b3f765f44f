"""Spark 4 surface demonstrations: VARIANT for semi-structured JSON
(the modern successor to get_json_object chains for P15-style payloads)
and Python UDTFs (the row-expanding UDF family).

Both are API-surface coverage, self-checked by round-trip equality —
the engine's hot paths stay on native expressions."""

from __future__ import annotations

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


def test_variant_roundtrips_structured_payload(spark, sf_dir):
    """Build a nested JSON payload from typed columns, parse it to
    VARIANT, and extract every field back: values must round-trip
    exactly (including array indexing and nested paths)."""
    ev = load_table(spark, sf_dir, "events").limit(500)
    payload = F.to_json(
        F.struct(
            F.col("value").alias("val"),
            F.array("event_id", "user_id").alias("ids"),
            F.struct(F.col("event_type").alias("t")).alias("meta"),
        )
    )
    v = ev.select("event_id", "user_id", "event_type", "value", F.parse_json(payload).alias("v"))
    out = v.select(
        "event_id",
        (F.try_variant_get("v", "$.val", "double") == F.col("value")).alias("val_ok"),
        (F.try_variant_get("v", "$.ids[0]", "long") == F.col("event_id")).alias("id0_ok"),
        (F.try_variant_get("v", "$.ids[1]", "long") == F.col("user_id")).alias("id1_ok"),
        (F.try_variant_get("v", "$.meta.t", "string") == F.col("event_type")).alias("t_ok"),
        F.try_variant_get("v", "$.missing", "long").isNull().alias("missing_null"),
    )
    bad = out.where(
        ~F.col("val_ok") | ~F.col("id0_ok") | ~F.col("id1_ok") | ~F.col("t_ok")
        | ~F.col("missing_null")
    ).count()
    assert bad == 0
    # props (P15) through the variant path agrees with get_json_object
    props = ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_json"),
        F.try_variant_get(F.parse_json("props"), "$.k", "long").alias("k_variant"),
    )
    assert props.where(F.col("k_json") != F.col("k_variant")).count() == 0


def test_udtf_token_positions_match_posexplode(spark, sf_dir):
    """A row-expanding Python UDTF must agree with the native
    posexplode tokenization (UDTF = API surface; posexplode = the hot
    path)."""
    from pyspark.sql.functions import lit, udtf

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.text import (
        tokens,
    )

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            import re

            norm = re.sub(r"[^a-z0-9]+", " ", (text or "").lower()).strip()
            if not norm:
                return
            for i, t in enumerate(norm.split(" ")):
                yield i, t

    spark.udtf.register("tokenize_udtf", Tokenize)
    docs = load_table(spark, sf_dir, "documents").limit(50)
    docs.createOrReplaceTempView("_udtf_docs")
    got = spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM _udtf_docs d, LATERAL tokenize_udtf(d.text) t"
    )
    want = docs.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
