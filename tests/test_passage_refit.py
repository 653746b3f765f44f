"""Passage-level drift refit (round-9 verdict task 4) — the passage
twin of test_ivf_refit's drifted-stream test: the chunk-vector index
is the MOST drift-exposed artifact (chunking multiplies vectors ~15×;
a domain-drifting corpus shifts chunk space first), so
``start_passage_index_sink`` gains the same ``refit_threshold=`` hook
its embedding and media siblings have.  The refit must fire once when
the fold-time drift metric crosses, RESTORE MaxP recall at fixed
``n_probe``, preserve pid invertibility and passage-table
reachability across the version swap, and keep a half-built next
version invisible.

Drift fixture: families of near-duplicate documents over a pseudo-word
vocabulary disjoint from the fixture corpus.  Built with a divisor
that keeps each drifted doc single-chunk, so chunk space = doc space
for them: under the FROZEN centroids (fit on the fixture corpus) the
whole drifted region is far from every centroid — assignment there is
decided by small residual projections, scattering each family across
cells (recall@n_probe=1 sags); a refit re-centers on the families and
coheres them (recall restored).  Truth = the index's own EXHAUSTIVE
probe (n_probe = n_centroids), which is geometry-independent — the
test asserts it is bit-stable across the refit, which is exactly the
pid-invertibility + reachability contract."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    ivf_index,
    passage,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import (
    pipeline as sp,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

import pytest

NC, SEED, NF, DIV = 10, 7, 6, 1024



pytestmark = pytest.mark.slow  # multi-epoch lifecycle walk; fast tier keeps the
# single-epoch/oracle coverage of this family (round 12, VERDICT r11 #3)

def _base_docs(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )


def _drifted_rows():
    """6 families × 12 members; members share 12 of 15 pseudo-words
    (within-family cosine ~0.8, across-family and against the fixture
    corpus ~0)."""
    rows = []
    for fam in range(NF):
        basewords = [f"zq{fam}base{j}word" for j in range(15)]
        for m in range(12):
            words = list(basewords)
            for r in range(3):
                words[(m + r * 5) % 15] = f"zq{fam}mem{m}var{r}tok"
            rows.append((10_000 + fam * 100 + m, " ".join(words)))
    return rows


def _queries(spark):
    return spark.createDataFrame(
        [
            (fam, " ".join(f"zq{fam}base{j}word" for j in range(15)))
            for fam in range(NF)
        ],
        "query_id long, text string",
    )


def _hits(spark, index_dir, queries, n_probe):
    return passage.passage_topk(
        spark, queries, index_dir, k=12, n_probe=n_probe, k_chunks=100
    ).collect()


def _pairs(rows):
    return {(r.query_id, r.doc_id) for r in rows}


def test_streamed_drift_triggers_passage_refit_and_restores_recall(
    spark, sf_dir, tmp_path
):
    base = _base_docs(spark, sf_dir)
    drifted = spark.createDataFrame(_drifted_rows(), "doc_id long, text string")
    queries = _queries(spark)

    # the no-refit twin (batch API) shows the damage
    twin = str(tmp_path / "twin")
    passage.build_passage_index(
        base, twin, n_centroids=NC, seed=SEED, divisor=DIV
    )
    passage.update_passage_index(drifted, twin)
    ratio = ivf_index.ivf_drift_ratio(f"{twin}/vectors")
    assert ratio is not None and ratio > 2.0, ratio  # the metric crossed
    truth = _pairs(_hits(spark, twin, queries, NC))  # exhaustive = exact MaxP
    rec_frozen = len(_pairs(_hits(spark, twin, queries, 1)) & truth) / len(truth)
    assert rec_frozen < 0.85, rec_frozen  # the frontier really sagged

    # streamed: bootstrap on the fixture corpus, drifted fold crosses
    # the threshold, the sink refits
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    schema = "doc_id long, text string"
    base.coalesce(1).write.mode("overwrite").parquet(f"{feed}/f0.parquet")
    drifted.coalesce(1).write.mode("overwrite").parquet(f"{feed}/f1.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed + "/*.parquet")
    )
    idx = str(tmp_path / "pidx_stream")
    q = sp.start_passage_index_sink(
        stream, idx, str(tmp_path / "ck"), n_centroids=NC, seed=SEED,
        refit_threshold=2.0, divisor=DIV,
    )
    q.processAllAvailable()
    q.stop()

    vec_meta = ivf_index.read_manifest(f"{idx}/vectors")
    assert vec_meta.get("refit_count", 0) == 1  # fired exactly once
    assert vec_meta.get("data_version") == 1
    assert vec_meta["last_epoch"] == 1  # the replay guard survived the swap
    assert vec_meta["drift_ratio"] is None  # baseline reset — no refit storm

    # truth (exhaustive probing) is geometry-independent: the streamed
    # + refit index answers EXACTLY like the frozen twin at full probe
    # — pids still invert, every snippet still resolves
    refit_hits = _hits(spark, idx, queries, NC)
    assert _pairs(refit_hits) == truth
    # every hit's snippet resolved through the version swap
    assert refit_hits and all(r.chunk and len(r.chunk) > 0 for r in refit_hits)

    # recall at the SAME n_probe is restored
    rec_refit = len(_pairs(_hits(spark, idx, queries, 1)) & truth) / len(truth)
    assert rec_refit > rec_frozen + 0.1, (rec_frozen, rec_refit)
    assert rec_refit >= 0.9, rec_refit

    # a half-built NEXT version (crashed refit) is invisible until the
    # pointer swaps: plant a v2 with centroids only, answers unchanged
    os.makedirs(f"{idx}/vectors/v2")
    spark.read.parquet(f"{idx}/vectors/v1/centroids").write.parquet(
        f"{idx}/vectors/v2/centroids"
    )
    assert _pairs(_hits(spark, idx, queries, NC)) == truth

    # post-refit lifecycle still works: fold one more batch (frozen
    # NEW centroids), then delete a doc — both resolve through the
    # refit version pointer
    extra = spark.createDataFrame(
        [(20_000, " ".join(f"zq0base{j}word" for j in range(15)))],
        "doc_id long, text string",
    )
    # post-refit fold on the sink's behalf → carries its checkpoint
    passage.update_passage_index(extra, idx, checkpoint=str(tmp_path / "ck"))
    got = _pairs(_hits(spark, idx, queries, NC))
    assert (0, 20_000) in got
    passage.delete_docs_from_passage_index(spark, idx, [20_000])
    assert _pairs(_hits(spark, idx, queries, NC)) == truth
