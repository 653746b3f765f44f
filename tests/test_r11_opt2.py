"""Round-11 continuation: internals changed by the second optimization
pass keep every contract identical.

- ``concurrency.overlap_jobs`` runs every job (0, 1, many) and
  propagates the first error after all jobs settle — the semantics
  ``_run_fold_legs`` and the index builds' overlapped table writes
  both lean on.
- ``build_minhash_index`` with OVERLAPPED bands/shingles writes emits
  tables content-identical to a forced-sequential build.
- ``multimodal.extract_features``'s vectorized ``mean_byte`` equals
  the pure-Python ``float(sum(b)) / len(b)`` definition bit-for-bit
  (including the empty-payload null).
- ``multimodal._codec`` memoizes the absent-codec probe (one import
  attempt per process, not one per decoded row) and ``decode_media``
  still produces the same arrays through it.
"""

from __future__ import annotations

import threading

import numpy as np
import pyspark.sql.functions as F
import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    lsh_index,
    multimodal,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.concurrency import (
    overlap_jobs,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


def _docs(spark, sf_dir, n=40):
    return (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < n)
        .select("doc_id", "text", "lang", "source")
    )


def test_overlap_jobs_runs_all_and_propagates_first_error():
    ran = []
    overlap_jobs([])  # no-op
    overlap_jobs([lambda: ran.append("solo")])
    assert ran == ["solo"]

    done = []
    gate = threading.Event()

    def slow_ok():
        gate.wait(timeout=10)
        done.append("ok")

    def fast_fail():
        gate.set()
        raise RuntimeError("leg boom")

    with pytest.raises(RuntimeError, match="leg boom"):
        overlap_jobs([slow_ok, fast_fail])
    # the error is raised only after every job settled
    assert done == ["ok"]


def test_build_overlapped_tables_match_sequential(spark, sf_dir, tmp_path):
    import real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.lsh_index as LI

    docs = _docs(spark, sf_dir)
    d_par = str(tmp_path / "idx_par")
    d_seq = str(tmp_path / "idx_seq")
    lsh_index.build_minhash_index(docs, d_par)

    real = LI.overlap_jobs
    LI.overlap_jobs = lambda jobs, spark=None: [j() for j in jobs]
    try:
        lsh_index.build_minhash_index(docs, d_seq)
    finally:
        LI.overlap_jobs = real

    for sub in ("bands", "shingles"):
        a = spark.read.parquet(f"{d_par}/{sub}")
        b = spark.read.parquet(f"{d_seq}/{sub}")
        assert sorted(a.columns) == sorted(b.columns)
        cols = sorted(a.columns)
        assert (
            a.select(cols).exceptAll(b.select(cols)).isEmpty()
            and b.select(cols).exceptAll(a.select(cols)).isEmpty()
        )
    assert lsh_index._lsh_manifest(d_par) == lsh_index._lsh_manifest(d_seq)


def test_mean_byte_matches_pure_python(spark):
    payloads = [b"", b"\x00", b"abc", bytes(range(256)) * 3, b"\xff" * 7]
    rows = [(i, "image", p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "asset_id long, modality string, payload binary")
    got = {
        r["asset_id"]: r["mean_byte"]
        for r in multimodal.extract_features(df).collect()
    }
    for i, p in enumerate(payloads):
        want = float(sum(p)) / len(p) if len(p) else None
        assert got[i] == want, (i, got[i], want)


def test_codec_probe_memoized_and_decode_unchanged():
    multimodal._CODECS.clear()
    px = multimodal.decode_media(b"abcdef", "image", width=3, height=2)
    assert px.shape == (2, 3)
    assert "pil" in multimodal._CODECS  # probed exactly once, cached
    multimodal._CODECS["pil"] = None  # absent-codec memo must be trusted
    px2 = multimodal.decode_media(b"abcdef", "image", width=3, height=2)
    assert np.array_equal(px, px2)
    # audio path likewise goes through the memo
    multimodal._CODECS.clear()
    au = multimodal.decode_media(b"ab", "audio")
    assert "soundfile" in multimodal._CODECS
    assert au.dtype == np.dtype("<i2") and au.size == 1
    multimodal._CODECS.clear()
