"""Session-interleaved A/B harness for the round-11 continuation
changes: each arm is toggled by monkeypatch inside ONE session and the
arms alternate (A,B,A,B,...), min-of-N each — the only comparison this
host's ±2x cross-session swings allow.

Usage: python tools/ab_r11b.py <case> [reps]
  cases: decode | lshbuild | psgbuild | shingles
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.session import get_spark
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

SF = "/root/testdata/sf0.1"


def blow10x_docs(spark):
    docs = load_table(spark, SF, "documents")
    d = tempfile.mkdtemp(prefix="ab_docs10x_")
    (
        docs.crossJoin(spark.range(10).select(F.col("id").alias("_rep")))
        .select(
            (F.col("doc_id") * 10 + F.col("_rep")).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        .write.mode("overwrite")
        .parquet(f"{d}/documents.parquet")
    )
    return d


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def run_arms(spark, arms: dict, reps: int) -> None:
    best: dict[str, list[float]] = {k: [] for k in arms}
    for i in range(reps):
        for name, fn in arms.items():
            spark.sparkContext.setJobDescription(f"ab:{name}#{i}")
            t0 = time.time()
            fn()
            best[name].append(round(time.time() - t0, 3))
    for name, xs in best.items():
        print(f"{name:28s} min={min(xs):7.3f}  samples={xs}")


def case_decode(spark, reps):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        asset_embed as AE,
        multimodal as MM,
    )

    d = blow10x_docs(spark)
    assets = MM.assets_from_documents(
        spark.read.parquet(f"{d}/documents.parquet")
    )

    # decode runs in the WORKERS, so the old arm patches _codec inside
    # the worker process (this function is defined in __main__ and
    # pickled by value); the new arm goes through the module untouched.
    def old_batches(it):
        import pandas as pd

        from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
            asset_embed as AEw,
            multimodal as MMw,
        )

        def probe_import_per_call(name: str):
            # pre-round-11 behavior: re-attempt the (absent) codec
            # import on EVERY decode call — full sys.path search each
            try:
                if name == "pil":
                    from PIL import Image

                    return Image
                import soundfile

                return soundfile
            except ImportError:
                return None

        orig = MMw._codec
        MMw._codec = probe_import_per_call
        try:
            for pdf in it:
                ids, mods, fps, vecs = [], [], [], []
                for aid, modality, tile in AEw._iter_tiles(pdf):
                    ids.append(aid)
                    mods.append(modality)
                    fps.append(AEw._phash_of_tile(tile))
                    vecs.append(AEw._embedding_of_tile(tile))
                yield pd.DataFrame(
                    {
                        "asset_id": ids,
                        "modality": mods,
                        "phash": pd.Series(fps, dtype="int64"),
                        "embedding": vecs,
                    }
                )
        finally:
            MMw._codec = orig

    old_df = assets.mapInPandas(old_batches, schema=AE.ASSET_FEATURES_SCHEMA)

    arms = {
        "old_import_per_row": lambda: noop(old_df),
        "new_codec_memo": lambda: noop(AE.asset_features(assets)),
    }
    run_arms(spark, arms, reps)


def case_lshbuild(spark, reps):
    import shutil

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        concurrency as CC,
        lsh_index as LI,
    )

    d = blow10x_docs(spark)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    real_overlap = CC.overlap_jobs

    def seq_overlap(jobs, spark=None):
        for j in jobs:
            j()

    def build(tag, overlap):
        LI.overlap_jobs = overlap
        out = tempfile.mkdtemp(prefix=f"ab_lsh_{tag}_")
        shutil.rmtree(out, ignore_errors=True)
        LI.build_minhash_index(docs, out)
        shutil.rmtree(out, ignore_errors=True)

    arms = {
        "build_sequential": lambda: build("seq", seq_overlap),
        "build_overlapped": lambda: build("par", real_overlap),
    }
    run_arms(spark, arms, reps)
    LI.overlap_jobs = real_overlap


def case_psgbuild(spark, reps):
    import shutil

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        concurrency as CC,
        passage as PSG,
    )

    docs = load_table(spark, SF, "documents")
    real_overlap = CC.overlap_jobs

    def seq_overlap(jobs, spark=None):
        for j in jobs:
            j()

    def build(overlap):
        CC.overlap_jobs = overlap
        out = tempfile.mkdtemp(prefix="ab_psg_")
        shutil.rmtree(out, ignore_errors=True)
        PSG.build_passage_index(docs, out)
        shutil.rmtree(out, ignore_errors=True)

    arms = {
        "psg_sequential": lambda: build(seq_overlap),
        "psg_overlapped": lambda: build(real_overlap),
    }
    run_arms(spark, arms, reps)
    CC.overlap_jobs = real_overlap


def case_shingles(spark, reps):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        dedup as DD,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.text import (
        TOKENS_COL,
        shingles,
        shingles_from_tokens,
    )

    docs_dup = DD.with_exact_duplicates(load_table(spark, SF, "documents"))
    real = DD._doc_shingles

    def rr_doc_shingles(documents, n=3):
        par = documents.sparkSession.sparkContext.defaultParallelism
        sh = (
            shingles_from_tokens(F.col(TOKENS_COL), n)
            if TOKENS_COL in documents.columns
            else shingles(F.col("text"), n)
        )
        return (
            documents.repartition(par)
            .select("doc_id", F.array_distinct(sh).alias("sh"))
            .where(F.size("sh") > 0)
        )

    def ngram(impl):
        DD._doc_shingles = impl
        noop(DD.ngram_jaccard_pairs(docs_dup, threshold=0.5))

    def clusters(impl):
        DD._doc_shingles = impl
        noop(DD.dedup_clusters(docs_dup))

    arms = {
        "ngram_roundrobin": lambda: ngram(rr_doc_shingles),
        "ngram_hashkeyed": lambda: ngram(real),
        "clusters_roundrobin": lambda: clusters(rr_doc_shingles),
        "clusters_hashkeyed": lambda: clusters(real),
    }
    run_arms(spark, arms, reps)
    DD._doc_shingles = real


def main():
    case = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(f"ab-r11b-{case}")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
    spark.range(1000).selectExpr("sum(id)").write.mode("overwrite").format("noop").save()
    dict(
        decode=case_decode,
        lshbuild=case_lshbuild,
        psgbuild=case_psgbuild,
        shingles=case_shingles,
    )[case](spark, reps)


if __name__ == "__main__":
    main()
