"""hash_mode threading through the MinHash/SimHash/split dedup family
and the decontamination flows (round-8 verdict item #1).

md5 stays the DuckDB-twinned oracle default on every gated path;
xxh64 is the codegen'd production family.  The mode changes hash
VALUES, never geometry, so these tests pin the invariants a family
swap must preserve — planted exact duplicates still collide in every
band (certain at Jaccard 1.0 in ANY family), verification stays exact
Jaccard, split assignment stays content-deterministic — plus the new
index-manifest contract: an LSH index built in one mode resolves
every later batch to that mode and refuses contradictions.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    decontam,
    dedup,
    lsh_index,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

OFFSET = 100000


def _docs(spark, sf_dir, limit=200):
    return load_table(spark, sf_dir, "documents").limit(limit)


def _dup_corpus(spark, sf_dir, limit=200):
    return dedup.with_exact_duplicates(_docs(spark, sf_dir, limit))


def _planted_pairs(corpus):
    return {
        (d, d + OFFSET)
        for d in {r.doc_id for r in corpus.select("doc_id").collect()}
        if d < OFFSET and d % 10 == 0
    }


def test_xxh64_minhash_lsh_catches_planted_dups(spark, sf_dir):
    """Exact duplicates agree on every minhash in ANY hash family, so
    the xxh64 candidate set must contain every planted pair; the
    signatures themselves must differ from md5 mode (the swap routed)."""
    corpus = _dup_corpus(spark, sf_dir)
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(corpus, hash_mode="xxh64").collect()
    }
    assert _planted_pairs(corpus) <= got

    sig_m = dedup.minhash_signatures(corpus.limit(30)).collect()
    sig_x = dedup.minhash_signatures(corpus.limit(30), hash_mode="xxh64").collect()
    m = {r.doc_id: tuple(r[f"mh_{i}"] for i in range(dedup.N_MINHASH)) for r in sig_m}
    x = {r.doc_id: tuple(r[f"mh_{i}"] for i in range(dedup.N_MINHASH)) for r in sig_x}
    assert set(m) == set(x)
    assert any(m[d] != x[d] for d in m)
    # both families stay in the shared 30-bit permutation range
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.scalar import (
        MINHASH_P,
    )

    for sig in (m, x):
        for vals in sig.values():
            assert all(0 <= v < MINHASH_P for v in vals)


def test_xxh64_fuzzy_dedup_drops_planted_copies(spark, sf_dir):
    """End-to-end fuzzy dedup under the production hash: every planted
    copy drops (its original, smaller id, is the keeper) and no
    surviving doc pairs with a smaller survivor at Jaccard ≥ 0.5."""
    corpus = _dup_corpus(spark, sf_dir)
    kept = {r.doc_id for r in dedup.fuzzy_dedup_keep(corpus, hash_mode="xxh64").collect()}
    planted = {b for _, b in _planted_pairs(corpus)}
    assert planted and kept.isdisjoint(planted)
    # soundness: every drop (planted or organic) is the larger id of an
    # exact-Jaccard-verified pair — verification is hash-free, so the
    # family swap can only change which candidates SURFACE
    dropped = {r.doc_id for r in corpus.select("doc_id").collect()} - kept
    verified_b = {
        r.doc_b
        for r in dedup.fuzzy_near_dup_pairs(corpus, hash_mode="xxh64").collect()
    }
    assert dropped == verified_b


def test_xxh64_simhash_planted_dups_at_hamming0(spark, sf_dir):
    corpus = _dup_corpus(spark, sf_dir, limit=120)
    near = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_near_pairs(corpus, hash_mode="xxh64").collect()
    }
    for p in _planted_pairs(corpus):
        assert near.get(p) == 0, p
    fp_m = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(corpus).collect()}
    fp_x = {
        r.doc_id: r.simhash
        for r in dedup.simhash_fingerprints(corpus, hash_mode="xxh64").collect()
    }
    assert any(fp_m[d] != fp_x[d] for d in fp_m)
    for fp in fp_x.values():  # 60-bit fingerprints stay positive BIGINTs
        assert 0 <= fp < 2**60


def test_hash_split_xxh64_content_stable_partition(spark, sf_dir):
    """xxh64 split: a full partition, content-following (planted copies
    land in their original's split), deterministic across calls, and a
    genuinely different assignment than md5 somewhere."""
    corpus = _dup_corpus(spark, sf_dir)
    sx = {r.doc_id: r.split for r in dedup.hash_split(corpus, hash_mode="xxh64").collect()}
    assert set(sx.values()) <= {"train", "val", "test"}
    assert len(sx) == corpus.count()
    for a, b in _planted_pairs(corpus):
        assert sx[a] == sx[b], (a, b)
    again = {
        r.doc_id: r.split
        for r in dedup.hash_split(corpus, hash_mode="xxh64").collect()
    }
    assert sx == again
    sm = {r.doc_id: r.split for r in dedup.hash_split(corpus).collect()}
    assert any(sm[d] != sx[d] for d in sm)


def test_lsh_index_manifest_pins_xxh64_mode(spark, sf_dir, tmp_path):
    """An xxh64-built index resolves later batches to xxh64 with no
    caller annotation, and the incremental flow keeps the exact
    batch-equivalence contract under the production family."""
    corpus = _dup_corpus(spark, sf_dir, limit=300)
    old = corpus.where(F.col("doc_id") < 150)
    new = corpus.where(F.col("doc_id") >= 150)

    idx = str(tmp_path / "idx")
    lsh_index.build_minhash_index(old, idx, hash_mode="xxh64")
    assert lsh_index._lsh_manifest(idx)["hash_mode"] == "xxh64"

    got = sorted(
        r.doc_id for r in lsh_index.dedup_against_index(spark, new, idx).collect()
    )
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    want = sorted(
        r.doc_id
        for r in dedup.fuzzy_dedup_keep(
            old.unionByName(new), hash_mode="xxh64"
        ).collect()
        if r.doc_id in new_ids
    )
    assert got == want and len(got) > 0

    # update resolves the mode from the manifest too: exact re-copies
    # of indexed docs must all drop afterwards
    lsh_index.update_minhash_index(new, idx)
    copies = new.select(
        (F.col("doc_id") + 777000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    assert lsh_index.dedup_against_index(spark, copies, idx).count() == 0


def test_lsh_index_refuses_contradicting_params(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir, limit=40)
    idx = str(tmp_path / "idx")
    lsh_index.build_minhash_index(docs, idx, hash_mode="xxh64")
    with pytest.raises(ValueError, match="pins hash_mode"):
        lsh_index.dedup_against_index(spark, docs, idx, hash_mode="md5")
    with pytest.raises(ValueError, match="pins k"):
        lsh_index.update_minhash_index(docs, idx, k=8)
    with pytest.raises(ValueError, match="pins hash_mode"):
        decontam.decontaminate_against_index(spark, docs, idx, hash_mode="md5")
    # matching explicit params are fine
    lsh_index.update_minhash_index(docs, idx, hash_mode="xxh64")


def test_legacy_index_without_manifest_resolves_md5_defaults(spark, sf_dir, tmp_path):
    """Pre-round-8 indexes carry no manifest; they were built with the
    md5 defaults and must keep answering exactly as before."""
    corpus = _dup_corpus(spark, sf_dir, limit=160)
    old = corpus.where(F.col("doc_id") < 80)
    new = corpus.where(F.col("doc_id") >= 80)
    idx = str(tmp_path / "idx")
    lsh_index.build_minhash_index(old, idx)
    os.remove(os.path.join(idx, lsh_index._LSH_MANIFEST))  # simulate legacy
    meta = lsh_index._lsh_manifest(idx)
    assert meta == {"n": 3, "k": 16, "band": 4, "hash_mode": "md5"}
    got = sorted(
        r.doc_id for r in lsh_index.dedup_against_index(spark, new, idx).collect()
    )
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    want = sorted(
        r.doc_id
        for r in dedup.fuzzy_dedup_keep(old.unionByName(new)).collect()
        if r.doc_id in new_ids
    )
    assert got == want


def test_decontaminate_xxh64_index_equals_fit_per_call(spark, sf_dir, tmp_path):
    """fuzzy_decontaminate(…, xxh64) ≡ decontaminate_against_index over
    an xxh64-built benchmark index — the index path inherits the mode
    from the manifest, so both sides hash in the same family."""
    docs = _docs(spark, sf_dir, limit=250)
    train = docs.where(F.col("doc_id") >= 40)
    # benchmark = re-id'd copies of 40 TRAIN docs, so the train side
    # really contains benchmark material to flag
    bench = train.where(F.col("doc_id") < 80).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )

    live = sorted(
        map(
            tuple,
            decontam.fuzzy_decontaminate(train, bench, hash_mode="xxh64").collect(),
        )
    )
    idx = str(tmp_path / "bidx")
    lsh_index.build_minhash_index(bench, idx, hash_mode="xxh64")
    stored = sorted(
        map(
            tuple,
            decontam.decontaminate_against_index(spark, train, idx).collect(),
        )
    )
    assert live == stored
    assert any(r[-1] for r in live)  # the fixture really contaminates
