"""Key-bucketed MinHash index layout (round 10): the pruned corpus
reads must lose no candidate (bucketed ≡ flat on every lifecycle
step), the pruning must actually reach the scan's PartitionFilters,
flat pre-round-10 artifacts must keep working unpruned and upgrade
atomically at compaction, and bucket-constant drift must refuse
loudly instead of silently missing matches."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import decontam, dedup, lsh_index
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table



pytestmark = pytest.mark.slow  # multi-epoch lifecycle walk; fast tier keeps the
# single-epoch/oracle coverage of this family (round 12, VERDICT r11 #3)

def _docs(spark, sf_dir, limit=200):
    return load_table(spark, sf_dir, "documents").limit(limit)


def _split(spark, sf_dir):
    corpus = dedup.with_exact_duplicates(_docs(spark, sf_dir))
    old = corpus.where(F.col("doc_id") < 120)
    new = corpus.where(F.col("doc_id") >= 120)
    return old, new


def _survivors(spark, new, idx):
    return sorted(
        r["doc_id"] for r in lsh_index.dedup_against_index(spark, new, idx).collect()
    )


def test_bucketed_equals_flat_full_lifecycle(spark, sf_dir, tmp_path):
    """Same survivors from a bucketed and a flat artifact through
    build → dedup → fold → dedup → delete → dedup → compact → dedup."""
    old, new = _split(spark, sf_dir)
    fresh = new.select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    flat, buck = str(tmp_path / "flat"), str(tmp_path / "buck")
    lsh_index.build_minhash_index(old, flat, bucketed=False)
    lsh_index.build_minhash_index(old, buck, bucketed=True)
    assert lsh_index._bands_layout(flat) == "flat"
    assert lsh_index._bands_layout(buck) == "bucketed"
    assert lsh_index._shingles_layout(buck) == "bucketed"

    assert _survivors(spark, new, flat) == _survivors(spark, new, buck)

    for idx in (flat, buck):
        lsh_index.update_minhash_index(new, idx)
    # folds match their tree's layout
    assert lsh_index._bands_layout(flat) == "flat"
    assert lsh_index._bands_layout(buck) == "bucketed"
    assert _survivors(spark, fresh, flat) == _survivors(spark, fresh, buck)

    victims = [r["doc_id"] for r in new.limit(5).select("doc_id").collect()]
    for idx in (flat, buck):
        lsh_index.delete_from_minhash_index(spark, idx, victims)
    assert _survivors(spark, fresh, flat) == _survivors(spark, fresh, buck)

    for idx in (flat, buck):
        lsh_index.compact_minhash_index(spark, idx)
    assert _survivors(spark, fresh, flat) == _survivors(spark, fresh, buck)


def test_pruned_band_read_reaches_partition_filters(spark, sf_dir, tmp_path):
    old, new = _split(spark, sf_dir)
    idx = str(tmp_path / "idx")
    lsh_index.build_minhash_index(old, idx)
    nb = lsh_index.minhash_band_entries(new)
    pairs = [
        (r["band_id"], r["kb"])
        for r in nb.select(
            "band_id", lsh_index._kbucket_col(F.col("band_key"), lsh_index.LSH_KBUCKETS).alias("kb")
        )
        .distinct()
        .collect()
    ]
    pruned = lsh_index._live_bands(spark, idx, band_pairs=pairs[:3])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    head = plan.split("PartitionFilters", 1)
    assert len(head) == 2 and "kbucket" in head[1].split("]", 1)[0]
    # the shingle prune likewise
    sh = lsh_index._live_shingles(spark, idx, dbuckets=[0, 1])
    splan = sh._jdf.queryExecution().executedPlan().toString()
    sp = splan.split("PartitionFilters", 1)
    assert len(sp) == 2 and "dbucket" in sp[1].split("]", 1)[0]


def test_pruned_read_is_correct_restriction(spark, sf_dir, tmp_path):
    """The pruned band read returns exactly the full read's rows whose
    (band_id, kbucket) fall in the requested pairs — pruning is a
    partition restriction, never a row filter approximation."""
    old, _ = _split(spark, sf_dir)
    idx = str(tmp_path / "idx")
    lsh_index.build_minhash_index(old, idx)
    pairs = [(0, 3), (1, 7), (5, 11)]
    got = (
        lsh_index._live_bands(spark, idx, band_pairs=pairs)
        .orderBy("doc_id", "band_id", "band_key")
        .collect()
    )
    full = lsh_index._live_bands(spark, idx).withColumn(
        "kb", lsh_index._kbucket_col(F.col("band_key"), lsh_index.LSH_KBUCKETS)
    )
    want = (
        full.where(
            F.concat_ws("/", F.col("band_id"), F.col("kb")).isin(
                [f"{a}/{b}" for a, b in pairs]
            )
        )
        .select("doc_id", "band_id", "band_key")
        .orderBy("doc_id", "band_id", "band_key")
        .collect()
    )
    assert got == want and len(got) > 0


def test_flat_artifact_upgrades_at_compaction(spark, sf_dir, tmp_path):
    """Pre-round-10 artifact: folds stay flat (one consistent shape per
    read root), the first compaction flips the whole tree bucketed, and
    post-upgrade folds + lookups keep the exact same answers."""
    old, new = _split(spark, sf_dir)
    fresh = new.select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    idx, twin = str(tmp_path / "idx"), str(tmp_path / "twin")
    lsh_index.build_minhash_index(old, idx, bucketed=False)
    lsh_index.build_minhash_index(old, twin, bucketed=False)
    lsh_index.update_minhash_index(new, idx)
    lsh_index.update_minhash_index(new, twin)

    lsh_index.compact_minhash_index(spark, idx)
    assert lsh_index._bands_layout(idx) == "bucketed"
    assert lsh_index._shingles_layout(idx) == "bucketed"
    meta = json.load(open(os.path.join(idx, "_lsh_manifest.json")))
    assert meta["kbuckets"] == lsh_index.LSH_KBUCKETS
    assert meta["dbuckets"] == lsh_index.LSH_DBUCKETS
    assert _survivors(spark, fresh, idx) == _survivors(spark, fresh, twin)

    # post-upgrade fold writes bucketed and answers like the flat twin
    kept = lsh_index.dedup_against_index(spark, fresh, idx)
    lsh_index.update_minhash_index(fresh, idx)
    lsh_index.update_minhash_index(fresh, twin)
    assert lsh_index._bands_layout(idx) == "bucketed"
    again = fresh.select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    assert _survivors(spark, again, idx) == _survivors(spark, again, twin) == []


def test_mixed_window_between_compaction_swaps(spark, sf_dir, tmp_path, monkeypatch):
    """A crash between the shingle swap and the bands swap leaves one
    bucketed and one flat table — lookups must still answer exactly,
    folds must match each table's own shape, and the re-run completes
    the upgrade."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import retrieval

    old, new = _split(spark, sf_dir)
    idx, twin = str(tmp_path / "idx"), str(tmp_path / "twin")
    lsh_index.build_minhash_index(old, idx, bucketed=False)
    lsh_index.build_minhash_index(old, twin, bucketed=False)

    real_swap = retrieval._swap_tree
    calls = {"n": 0}

    def crash_after_first(src, dst):
        real_swap(src, dst)
        calls["n"] += 1
        raise RuntimeError("injected crash after the shingles swap")

    monkeypatch.setattr(retrieval, "_swap_tree", crash_after_first)
    with pytest.raises(RuntimeError, match="injected"):
        lsh_index.compact_minhash_index(spark, idx)
    monkeypatch.setattr(retrieval, "_swap_tree", real_swap)
    assert calls["n"] == 1
    assert lsh_index._shingles_layout(idx) == "bucketed"
    assert lsh_index._bands_layout(idx) == "flat"

    # lookups and folds stay exact in the mixed window
    assert _survivors(spark, new, idx) == _survivors(spark, new, twin)
    lsh_index.update_minhash_index(new, idx)
    lsh_index.update_minhash_index(new, twin)
    fresh = new.select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    assert _survivors(spark, fresh, idx) == _survivors(spark, fresh, twin) == []

    # the re-run completes the upgrade
    lsh_index.compact_minhash_index(spark, idx)
    assert lsh_index._bands_layout(idx) == "bucketed"
    assert _survivors(spark, fresh, idx) == []


def _set_grid_conf(spark, kb, db):
    if kb is None:
        spark.conf.unset(lsh_index.KBUCKETS_CONF)
    else:
        spark.conf.set(lsh_index.KBUCKETS_CONF, str(kb))
    if db is None:
        spark.conf.unset(lsh_index.DBUCKETS_CONF)
    else:
        spark.conf.set(lsh_index.DBUCKETS_CONF, str(db))


def test_bucket_grid_drift_refuses(spark, sf_dir, tmp_path):
    """A session conf pinning a grid that contradicts the artifact's
    manifest refuses on read AND write; compaction under the conf is
    the migration cure, after which both succeed."""
    old, new = _split(spark, sf_dir)
    idx = str(tmp_path / "idx")
    lsh_index.build_minhash_index(old, idx)  # default 32/16 grid
    p = os.path.join(idx, "_lsh_manifest.json")
    assert json.load(open(p))["kbuckets"] == lsh_index.LSH_KBUCKETS
    try:
        _set_grid_conf(spark, 64, 32)
        with pytest.raises(ValueError, match="bucketed with kbuckets"):
            lsh_index.dedup_against_index(spark, new, idx)
        with pytest.raises(ValueError, match="bucketed with kbuckets"):
            lsh_index.update_minhash_index(new, idx)
        # compaction is the documented cure: full reads never prune,
        # the rewrite re-buckets under the session's grid
        lsh_index.compact_minhash_index(spark, idx)
        meta = json.load(open(p))
        assert meta["kbuckets"] == 64 and meta["dbuckets"] == 32
        assert lsh_index.dedup_against_index(spark, new, idx).count() >= 0
        lsh_index.update_minhash_index(new, idx)
    finally:
        _set_grid_conf(spark, None, None)


def test_conf_grid_build_fold_read_compact(spark, sf_dir, tmp_path):
    """Deployment-configurable grid (round 11): build at 64/32 via the
    session confs with the module constants untouched, fold/read/
    compact against it, answers ≡ the default-grid twin, and the
    manifest — not the module — is what every step resolves."""
    old, new = _split(spark, sf_dir)
    fresh = new.select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    big, dflt = str(tmp_path / "big"), str(tmp_path / "dflt")
    lsh_index.build_minhash_index(old, dflt)
    # the default-grid twin's answer, read before the conf is pinned
    # (reading a 32/16 artifact under a 64/32 conf rightly refuses)
    want_new = _survivors(spark, new, dflt)
    try:
        _set_grid_conf(spark, 64, 32)
        lsh_index.build_minhash_index(old, big)
        meta = json.load(open(os.path.join(big, "_lsh_manifest.json")))
        assert meta["kbuckets"] == 64 and meta["dbuckets"] == 32
        assert lsh_index.LSH_KBUCKETS == 32  # module untouched
        # dirs really carry the wider grid
        b0 = os.path.join(big, "bands", "batch=-1", "band_id=0")
        kbs = {e for e in os.listdir(b0) if e.startswith("kbucket=")}
        assert any(int(e.split("=")[1]) >= 32 for e in kbs)
        assert _survivors(spark, new, big) == want_new
        lsh_index.update_minhash_index(new, big)
        lsh_index.compact_minhash_index(spark, big)
        meta = json.load(open(os.path.join(big, "_lsh_manifest.json")))
        assert meta["kbuckets"] == 64 and meta["dbuckets"] == 32
    finally:
        _set_grid_conf(spark, None, None)
    # with the conf dropped, the manifest alone drives folds and the
    # pruned reads against the 64/32 artifact — same answers as the
    # default-grid twin at the same corpus state
    lsh_index.update_minhash_index(new, dflt)
    assert _survivors(spark, fresh, big) == _survivors(spark, fresh, dflt)
    lsh_index.update_minhash_index(fresh, big)
    meta = json.load(open(os.path.join(big, "_lsh_manifest.json")))
    assert meta["kbuckets"] == 64 and meta["dbuckets"] == 32


def test_unannotated_bucketed_tree_never_prunes_and_heals_at_compaction(
    spark, sf_dir, tmp_path
):
    """A bucketed tree whose manifest lost its grid counts (crashed
    build / unknown provenance) must fall back to full scans — same
    answers as an annotated twin — must NOT get stamped by a fold, and
    heals (re-buckets + stamps) at compaction."""
    old, new = _split(spark, sf_dir)
    idx, twin = str(tmp_path / "idx"), str(tmp_path / "twin")
    lsh_index.build_minhash_index(old, idx)
    lsh_index.build_minhash_index(old, twin)
    p = os.path.join(idx, "_lsh_manifest.json")
    meta = json.load(open(p))
    meta.pop("kbuckets"), meta.pop("dbuckets")
    json.dump(meta, open(p, "w"))
    # reads fall back to the full scan, answers exact
    assert _survivors(spark, new, idx) == _survivors(spark, new, twin)
    # a fold appends but does NOT stamp (old batches' modulus unknown)
    lsh_index.update_minhash_index(new, idx)
    lsh_index.update_minhash_index(new, twin)
    assert "kbuckets" not in json.load(open(p))
    fresh = new.select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    assert _survivors(spark, fresh, idx) == _survivors(spark, fresh, twin) == []
    # compaction rewrites the whole tree under one modulus and stamps
    lsh_index.compact_minhash_index(spark, idx)
    meta = json.load(open(p))
    assert meta["kbuckets"] == lsh_index.LSH_KBUCKETS
    assert meta["dbuckets"] == lsh_index.LSH_DBUCKETS
    assert _survivors(spark, fresh, idx) == []


def test_decontaminate_against_bucketed_index_matches_fit_per_call(
    spark, sf_dir, tmp_path
):
    docs = _docs(spark, sf_dir, 150)
    bench = docs.where(F.col("doc_id") % 7 == 0)
    train = docs.where(F.col("doc_id") % 7 != 0)
    idx = str(tmp_path / "bench_idx")
    lsh_index.build_minhash_index(bench, idx, bucketed=True)
    got = (
        decontam.decontaminate_against_index(spark, train, idx)
        .orderBy("doc_id")
        .collect()
    )
    want = decontam.fuzzy_decontaminate(train, bench).orderBy("doc_id").collect()
    assert got == want


def test_shingle_pruned_victims_equal_bands_scan(spark, sf_dir, tmp_path):
    """The upsert path's dbucket-pruned victim location must find
    exactly the (doc_id, batch) pairs the full bands scan finds —
    lossless because a doc has band rows iff it has shingle rows
    (minhash_signatures aggregates over _doc_shingles)."""
    import json

    docs = _docs(spark, sf_dir, 150)
    old = docs.where(F.col("doc_id") < 90)
    b1 = docs.where(F.col("doc_id") >= 90)
    flat, buck = str(tmp_path / "flat"), str(tmp_path / "buck")
    for idx, kw in ((flat, {"bucketed": False}), (buck, {"bucketed": True})):
        lsh_index.build_minhash_index(old, idx, **kw)
        lsh_index.update_minhash_index(b1, idx)

    # victims spanning both batches
    vic = [r["doc_id"] for r in docs.limit(120).select("doc_id").collect()][::7]
    lsh_index.delete_from_minhash_index(spark, flat, vic)  # bands scan
    lsh_index.delete_from_minhash_index(
        spark, buck, vic, victims_from_shingles=True
    )  # pruned shingles scan
    t_flat = sorted(
        (r["doc_id"], r["batch"])
        for r in spark.read.parquet(f"{flat}/tombstones").collect()
    )
    t_buck = sorted(
        (r["doc_id"], r["batch"])
        for r in spark.read.parquet(f"{buck}/tombstones").collect()
    )
    assert t_flat == t_buck and t_flat

    # and the CDC upsert (which uses the pruned path on bucketed
    # indexes) keeps answering exactly like the flat twin
    revised = b1.select(
        "doc_id",
        F.concat(F.lit("revised "), F.col("text")).alias("text"),
        "lang", "source", "n_chars",
    )
    lsh_index.upsert_minhash_index(spark, flat, revised, epoch=7)
    lsh_index.upsert_minhash_index(spark, buck, revised, epoch=7)
    probe = revised.select(
        (F.col("doc_id") + 700000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    assert _survivors(spark, probe, flat) == _survivors(spark, probe, buck) == []


def test_pruning_engages_small_batch_skips_saturated(spark, sf_dir, tmp_path, monkeypatch):
    """The eager pruning machinery engages only when the batch's bucket
    coverage is ≤ half the grid: a CDC-sized batch prunes (band_pairs
    passed to the index read), a corpus-sized batch takes the plain
    lazy path (band_pairs=None) — and both answer exactly like a flat
    twin."""
    old, new = _split(spark, sf_dir)
    buck, flat = str(tmp_path / "buck"), str(tmp_path / "flat")
    lsh_index.build_minhash_index(old, buck, bucketed=True)
    lsh_index.build_minhash_index(old, flat, bucketed=False)

    seen = {}
    real = lsh_index._live_bands

    def spy(spark_, idx_dir, band_pairs=None):
        seen["pairs"] = band_pairs
        return real(spark_, idx_dir, band_pairs=band_pairs)

    monkeypatch.setattr(lsh_index, "_live_bands", spy)

    small = new.limit(3)
    got_small = sorted(
        r["doc_id"] for r in lsh_index.dedup_against_index(spark, small, buck).collect()
    )
    assert seen["pairs"] is not None and len(seen["pairs"]) <= 12  # 3 docs × 4 bands
    want_small = sorted(
        r["doc_id"] for r in lsh_index.dedup_against_index(spark, small, flat).collect()
    )
    assert got_small == want_small

    got_big = sorted(
        r["doc_id"] for r in lsh_index.dedup_against_index(spark, new, buck).collect()
    )
    assert seen["pairs"] is None  # saturated — lazy path, no filter
    want_big = sorted(
        r["doc_id"] for r in lsh_index.dedup_against_index(spark, new, flat).collect()
    )
    assert got_big == want_big
