"""Pluggable hash modes (functions/scalar.portable_hash64): md5 is
the DuckDB-twinned oracle mode every gate uses; xxh64 is the
production mode — same 60-bit non-negative range and null semantics,
different values, no hex round-trip.  These tests pin the contract
(range, null-in-null-out, mode really changes the hash) and prove the
xxh64 paths keep the operators' GEOMETRY: duplicate texts embed
identically, DSIR selection still skews toward the target, and the
stored DSIR model refuses to mix schemes across folds."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.scalar import (
    portable_hash64,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    dedup,
    dsir,
    embedder,
)

DIM = 32
N_BUCKETS = 256


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hash_contract_shared_across_modes(spark):
    """Both modes: 60-bit non-negative, NULL in → NULL out,
    seed-sensitive; the modes disagree on values (the swap is real);
    an unknown mode refuses loudly."""
    df = spark.createDataFrame(
        [("alpha",), ("beta",), ("",), (None,)], "x string"
    )
    rows = df.select(
        portable_hash64(F.col("x"), seed="s:").alias("md5"),
        portable_hash64(F.col("x"), seed="s:", mode="xxh64").alias("xxh"),
        portable_hash64(F.col("x"), seed="t:", mode="xxh64").alias("xxh_t"),
    ).collect()
    for r in rows[:3]:
        for v in (r.md5, r.xxh, r.xxh_t):
            assert v is not None and 0 <= v < 2**60, r
        assert r.md5 != r.xxh, r  # distinct hash families
        assert r.xxh != r.xxh_t, r  # seed separates domains
    assert rows[3].md5 is None and rows[3].xxh is None  # null passthrough
    with pytest.raises(ValueError, match="unknown hash mode"):
        portable_hash64(F.col("x"), mode="sha1")


def test_xxh64_embeddings_keep_duplicate_geometry(spark, sf_dir):
    """xxh-mode embeddings: unit norm for token-ful docs, exact
    duplicates embed identically, tokenless docs get the zero vector —
    and the vectors differ from md5 mode (the mode actually routed)."""
    docs = dedup.with_exact_duplicates(_docs(spark, sf_dir).limit(80))
    emb_x = embedder.embed_documents(docs, dim=DIM, hash_mode="xxh64")
    rows = {r.vec_id: r for r in emb_x.collect()}
    assert len(rows) == docs.count()
    dups = [d for d in rows if d >= 100_000]
    assert dups
    for d in dups:
        assert list(rows[d].embedding) == list(rows[d - 100_000].embedding), d
    for r in rows.values():
        s = sum(x * x for x in r.embedding)
        if r.n_tokens > 0:
            assert s == pytest.approx(1.0, abs=1e-5), r.vec_id
        else:
            assert s == 0.0, r.vec_id
    # differs from the oracle mode somewhere (same docs, same dim)
    emb_m = {
        r.vec_id: list(r.embedding)
        for r in embedder.embed_documents(docs, dim=DIM).collect()
    }
    assert any(list(rows[v].embedding) != emb_m[v] for v in emb_m)


def test_xxh64_dsir_selection_still_lifts_target_fraction(spark, sf_dir):
    """The DSIR effect is hash-family-independent: under xxh64 the
    English-target selection still lands far above the base rate."""
    docs = _docs(spark, sf_dir)
    target = docs.where(F.col("lang") == "en")
    base = target.count() / docs.count()
    sel = dsir.dsir_select(
        docs, target, k=50, n_buckets=N_BUCKETS, temperature=0.25,
        hash_mode="xxh64",
    )
    frac_en = sel.where(F.col("lang") == "en").count() / 50
    assert frac_en >= min(1.0, base + 0.3), (frac_en, base)
    dsir.release_dsir_caches()


def test_dsir_model_pins_hash_mode_across_folds(spark, sf_dir, tmp_path):
    """An xxh64-built model manifest records the mode; later folds and
    from-model scoring hash under it — update ≡ rebuild stays an exact
    integer identity in xxh64 mode too."""
    docs = _docs(spark, sf_dir).limit(300)
    target = docs.where(F.col("lang") == "en")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)

    inc_dir = str(tmp_path / "inc")
    dsir.save_dsir_model(target, a, inc_dir, n_buckets=N_BUCKETS, hash_mode="xxh64")
    assert dsir.read_dsir_manifest(inc_dir)["hash_mode"] == "xxh64"
    dsir.update_dsir_model(spark, inc_dir, raw_batch=b)

    full_dir = str(tmp_path / "full")
    dsir.save_dsir_model(target, docs, full_dir, n_buckets=N_BUCKETS, hash_mode="xxh64")

    inc_counts = {
        r.bucket: (r.t_cnt, r.r_cnt)
        for r in spark.read.parquet(
            f"{inc_dir}/counts_v{dsir.read_dsir_manifest(inc_dir)['version']}"
        ).collect()
    }
    full_counts = {
        r.bucket: (r.t_cnt, r.r_cnt)
        for r in spark.read.parquet(
            f"{full_dir}/counts_v{dsir.read_dsir_manifest(full_dir)['version']}"
        ).collect()
    }
    assert inc_counts == full_counts
    # from-model weights ≡ inline weights under the SAME (xxh64) mode
    got = {
        r.doc_id: r.logw
        for r in dsir.dsir_weights_from_model(docs, full_dir).collect()
    }
    want = {
        r.doc_id: r.logw
        for r in dsir.dsir_weights(
            docs, target, n_buckets=N_BUCKETS, hash_mode="xxh64"
        ).collect()
    }
    assert set(got) == set(want)
    for d, v in want.items():
        assert got[d] == pytest.approx(v, rel=1e-9, abs=1e-9), d
    dsir.release_dsir_caches()
