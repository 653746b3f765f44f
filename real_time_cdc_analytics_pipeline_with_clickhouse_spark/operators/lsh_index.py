"""Incremental MinHash-LSH dedup index — dedup a NEW batch against a
100 TB corpus without re-LSHing the corpus.

``fuzzy_dedup_keep`` (dedup.py) is the whole-corpus flow: every run
re-shingles, re-hashes and re-joins everything.  Real training-data
pipelines don't operate that way — the corpus is an accumulated
artifact and arrivals are incremental (a new crawl slice, a new source
dump).  The standard production answer (the RefinedWeb/SlimPajama-style
MinHash pipelines, and the same pattern ClickHouse users run with a
ReplacingMergeTree of signatures) is to PERSIST the LSH artifacts and
join each new batch against them:

- ``build_minhash_index`` writes the banded signature table
  ``(doc_id, band_id, band_key)`` partitioned by ``band_id`` plus the
  per-doc shingle table (for exact-Jaccard verification of
  candidates) — together ~tokens-sized, the storage cost every
  incremental-dedup deployment pays;
- ``dedup_against_index`` LSH-joins ONLY the new batch's bands
  against the index (cost ∝ batch, not corpus: the index side of the
  equi-join is shuffle-partitioned on the same (band_id, band_key)
  key and never rescanned in full per candidate), verifies candidates
  with exact Jaccard, and drops a new doc iff it near-dups an indexed
  doc or a smaller-id doc within its own batch;
- ``update_minhash_index`` appends the batch's artifacts so the next
  batch sees it.

Equivalence contract (tested): when every indexed doc precedes the
batch (ids below the batch's), ``dedup_against_index`` keeps exactly
the batch rows ``fuzzy_dedup_keep`` would keep running on the full
old∪new corpus — same shingles, same signature family, same
verification threshold.  Indexed docs are immutable precedent: the
incremental pass never retracts a doc that already made the corpus
(the asymmetry every append-only pipeline has).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .dedup import BAND_SIZE, N_MINHASH, _doc_shingles, minhash_signatures


def minhash_band_entries(
    documents: DataFrame,
    n: int = 3,
    k: int = N_MINHASH,
    band: int = BAND_SIZE,
    hash_mode: str = "md5",
) -> DataFrame:
    """(doc_id, band_id, band_key) — one row per doc per LSH band."""
    sig = minhash_signatures(documents, n, k, hash_mode)
    entries = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws("_", *[F.col(f"mh_{b * band + j}") for j in range(band)]).alias("band_key"),
        )
        for b in range(k // band)
    ]
    return sig.select("doc_id", F.explode(F.array(*entries)).alias("bk")).select(
        "doc_id", F.col("bk.band_id").alias("band_id"), F.col("bk.band_key").alias("band_key")
    )


def _shingle_rows(documents: DataFrame, n: int) -> DataFrame:
    return _doc_shingles(documents, n).select("doc_id", F.explode("sh").alias("shingle"))


def _write(df: DataFrame, path: str, mode: str, partition_by: str | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)


_LSH_MANIFEST = "_lsh_manifest.json"
_LSH_DEFAULTS = {"n": 3, "k": N_MINHASH, "band": BAND_SIZE, "hash_mode": "md5"}


def _lsh_manifest(index_dir: str) -> dict:
    """The index's pinned parameters.  Pre-round-8 indexes carry no
    manifest — they were all built with the module defaults in md5
    mode, so the fallback IS their true geometry."""
    import json

    p = os.path.join(index_dir, _LSH_MANIFEST)
    if not os.path.isfile(p):
        return dict(_LSH_DEFAULTS)
    with open(p) as fh:
        meta = json.load(fh)
    return {**_LSH_DEFAULTS, **meta}


def _write_lsh_manifest(index_dir: str, n: int, k: int, band: int, hash_mode: str) -> None:
    import json

    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, _LSH_MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"n": int(n), "k": int(k), "band": int(band), "hash_mode": hash_mode}, fh)
    os.replace(tmp, os.path.join(index_dir, _LSH_MANIFEST))


def _resolve_lsh_params(index_dir: str, n, k, band, hash_mode) -> tuple[int, int, int, str]:
    """Resolve per-call LSH params against the index manifest: ``None``
    means "the index's value"; an explicit value that CONTRADICTS the
    manifest raises — a batch hashed with the wrong family or band
    geometry would silently never collide with the stored corpus
    (every doc "survives"), which is the worst possible failure mode
    for a dedup gate."""
    meta = _lsh_manifest(index_dir)
    out = []
    for name, given in (("n", n), ("k", k), ("band", band), ("hash_mode", hash_mode)):
        pinned = meta[name]
        if given is not None and given != pinned:
            raise ValueError(
                f"index at {index_dir} pins {name}={pinned!r} but the call "
                f"passed {name}={given!r} — mixed LSH families never collide; "
                "rebuild the index to change its geometry"
            )
        out.append(pinned)
    return out[0], out[1], out[2], out[3]


def build_minhash_index(
    documents: DataFrame,
    index_dir: str,
    n: int = 3,
    k: int = N_MINHASH,
    band: int = BAND_SIZE,
    hash_mode: str = "md5",
) -> None:
    """Materialize the index from the current corpus (one full pass —
    paid once, then every batch is incremental).  The manifest pins
    (n, k, band, hash_mode) for the artifact's lifetime — incremental
    updates and queries resolve their params from it, so a batch can
    never be hashed with a different family than the stored corpus
    (``hash_mode="xxh64"`` builds the production-hash index; the md5
    default keeps the DuckDB twin).  Manifest lands after the data —
    on a crashed build the next reader sees either the old manifest
    with old data or no manifest (legacy defaults), never new params
    over half-written tables the defaults can't read anyway
    (overwrite is atomic per table via Spark's commit protocol)."""
    _write(
        minhash_band_entries(documents, n, k, band, hash_mode),
        f"{index_dir}/bands", "overwrite", "band_id",
    )
    _write(_shingle_rows(documents, n), f"{index_dir}/shingles", "overwrite")
    _write_lsh_manifest(index_dir, n, k, band, hash_mode)


def update_minhash_index(
    new_documents: DataFrame,
    index_dir: str,
    n: int | None = None,
    k: int | None = None,
    band: int | None = None,
    hash_mode: str | None = None,
) -> None:
    """Append a batch's artifacts (ALL its docs, kept or dropped — a
    dropped doc still outranks later copies of itself, exactly as in
    the batch flow where the higher id of a pair drops even when the
    lower id was itself dropped).  Params default to the index
    manifest's pinned values; explicit values must match it (see
    ``_resolve_lsh_params``)."""
    n, k, band, hash_mode = _resolve_lsh_params(index_dir, n, k, band, hash_mode)
    _write(
        minhash_band_entries(new_documents, n, k, band, hash_mode),
        f"{index_dir}/bands", "append", "band_id",
    )
    _write(_shingle_rows(new_documents, n), f"{index_dir}/shingles", "append")
    if not os.path.isfile(os.path.join(index_dir, _LSH_MANIFEST)):
        # an index bootstrapped by appends (the streaming sink's first
        # epoch) pins its resolved params too, not just built ones
        _write_lsh_manifest(index_dir, n, k, band, hash_mode)


def parquet_file_count(path: str) -> int:
    """Data files under ``path`` (recursive; parquet only) — the
    small-file health metric compaction is judged by."""
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(1 for f in files if f.endswith(".parquet"))
    return total


def _lsh_tomb_ids(spark: SparkSession, index_dir: str):
    p = f"{index_dir}/tombstones"
    if not os.path.isdir(p):
        return None
    return spark.read.parquet(p).select("doc_id").distinct()


def delete_from_minhash_index(spark: SparkSession, index_dir: str, doc_ids) -> None:
    """Remove documents from the dedup index by TOMBSTONE — the
    takedown / right-to-be-forgotten path: a deleted doc stops acting
    as dedup PRECEDENT immediately (``dedup_against_index`` anti-joins
    its bands and shingles out of the corpus side), and the next
    ``compact_minhash_index`` purges its rows physically and retires
    the tombstones.  One atomic tombstone-table swap commits the
    delete; idempotent, unknown ids are no-ops.

    Contract: the band/shingle tables carry no batch lineage (plain
    set-semantic appends), so a tombstone kills EVERY row of the
    doc_id — re-adding a deleted doc_id only takes effect after a
    compaction has retired its tombstone.  Takedowns don't re-add;
    an edited re-ingest should compact first (or use a fresh id).

    ``doc_ids``: a list of ids or a DataFrame with a ``doc_id``
    column."""
    from .retrieval import _commit_tombstones, _ids_frame

    if not os.path.isdir(f"{index_dir}/bands"):
        raise FileNotFoundError(
            f"no MinHash index at {index_dir} — run build_minhash_index first"
        )
    ids = _ids_frame(spark, doc_ids, "doc_id")
    existing = _lsh_tomb_ids(spark, index_dir)
    new_tomb = ids if existing is None else existing.unionByName(ids).distinct()
    _commit_tombstones(new_tomb, f"{index_dir}/tombstones")


def compact_minhash_index(spark: SparkSession, index_dir: str) -> None:
    """Small-file compaction for the appended index — the MergeTree
    background-merge analog ``warehouse.compact_warehouse`` applies to
    facts, applied to the index artifacts.  Every ``update_minhash_index``
    appends one file set per table; after N batches the band equi-join
    pays N× the file-open/footer overhead and row-group stats degrade.
    Rewrite = the same stage-then-swap: bands re-cluster to one sorted
    file per ``band_id`` partition, shingles to parallelism-bounded
    files.  Both tables are SET-semantic (a (doc, band, key) or (doc,
    shingle) row means membership, never a count — ``_verified``
    distinct's before counting), so the rewrite also ``distinct``s:
    logical content is unchanged (tested: dedup results identical
    before/after) and any crash-replay append residue is squashed."""
    import shutil

    from ..warehouse import _stage_swap

    tomb = _lsh_tomb_ids(spark, index_dir)

    def _purged(df: DataFrame) -> DataFrame:
        return (
            df.join(F.broadcast(tomb), "doc_id", "left_anti") if tomb is not None else df
        )

    bands = _purged(spark.read.parquet(f"{index_dir}/bands")).distinct()
    _stage_swap(bands, f"{index_dir}/bands", partition_by="band_id",
                sort_within=["band_id", "band_key"])
    sh = _purged(spark.read.parquet(f"{index_dir}/shingles")).distinct()
    _stage_swap(sh.repartition(spark.sparkContext.defaultParallelism),
                f"{index_dir}/shingles")
    # tombstones retire only after BOTH swaps — in any crash window the
    # surviving tombstones still anti-join whatever table wasn't purged
    shutil.rmtree(f"{index_dir}/tombstones", ignore_errors=True)


def _verified(cand: DataFrame, sh_a: DataFrame, sh_b: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs; shingle frames
    may come from different places (index parquet vs freshly
    computed).  Cost ∝ candidates — the shingle frames are semi-joined
    down to candidate docs BEFORE any aggregation (sh_a is the
    accumulated corpus index: counting it unrestricted would make
    every incremental batch pay a corpus-wide shuffle), and the
    shingle joins are equi-keyed on (doc, shingle), never
    corpus×corpus.  The candidate-restricted shingle rows are
    DISTINCT'd before counting: Jaccard is a SET ratio, and a
    crash-replayed index append that duplicated a doc's shingle rows
    must not corrupt it (duplicate-tolerance is half of the ingest
    sink's exactly-once story)."""
    ea = (
        sh_a.join(
            cand.select(F.col("doc_a").alias("doc_id")).distinct(), "doc_id", "left_semi"
        )
        .select(F.col("doc_id").alias("doc_a"), "shingle")
        .distinct()
    )
    eb = (
        sh_b.join(
            cand.select(F.col("doc_b").alias("doc_id")).distinct(), "doc_id", "left_semi"
        )
        .select(F.col("doc_id").alias("doc_b"), "shingle")
        .distinct()
    )
    common = (
        cand.join(ea, "doc_a")
        .join(eb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    na = ea.groupBy("doc_a").agg(F.count("*").alias("n_a"))
    nb = eb.groupBy("doc_b").agg(F.count("*").alias("n_b"))
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            >= threshold
        )
        .select("doc_a", "doc_b")
    )


def dedup_against_index(
    spark: SparkSession,
    new_documents: DataFrame,
    index_dir: str,
    n: int | None = None,
    k: int | None = None,
    band: int | None = None,
    threshold: float = 0.5,
    hash_mode: str | None = None,
) -> DataFrame:
    """Survivors of the new batch against corpus + batch (see module
    docstring for the contract).  Does NOT update the index — call
    ``update_minhash_index`` after persisting the survivors, so a
    failed run retries cleanly (the same stage-then-publish discipline
    as the warehouse sink).  LSH params resolve from the index
    manifest (``None`` = pinned value; a contradiction raises)."""
    if not os.path.isdir(f"{index_dir}/bands"):
        raise FileNotFoundError(
            f"no MinHash index at {index_dir} — run build_minhash_index first"
        )
    n, k, band, hash_mode = _resolve_lsh_params(index_dir, n, k, band, hash_mode)
    new_bands = minhash_band_entries(new_documents, n, k, band, hash_mode)
    new_sh = _shingle_rows(new_documents, n)
    idx_bands = spark.read.parquet(f"{index_dir}/bands")
    idx_sh = spark.read.parquet(f"{index_dir}/shingles")
    tomb = _lsh_tomb_ids(spark, index_dir)
    if tomb is not None:
        # tombstoned (taken-down) docs stop acting as dedup precedent
        idx_bands = idx_bands.join(F.broadcast(tomb), "doc_id", "left_anti")
        idx_sh = idx_sh.join(F.broadcast(tomb), "doc_id", "left_anti")

    # batch × index candidates: indexed doc is always doc_a (precedent).
    # doc_a < doc_b ENFORCES the module contract (indexed docs precede
    # the batch — ids below it) instead of trusting it; it also makes a
    # crash-REPLAYED batch deterministic: the replay sees its own
    # append in the index, but self-pairs and larger-id batch-mates are
    # excluded here exactly as the within-batch rule excludes them, so
    # the replayed keep set is identical to the original
    cross = (
        idx_bands.alias("a")
        .join(
            new_bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    drops_cross = _verified(cross, idx_sh, new_sh, threshold).select(
        F.col("doc_b").alias("doc_id")
    )

    # batch-internal candidates: smaller id wins, as in fuzzy_dedup_keep
    a, b = new_bands.alias("a"), new_bands.alias("b")
    within = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    drops_within = _verified(within, new_sh, new_sh, threshold).select(
        F.col("doc_b").alias("doc_id")
    )

    drops = drops_cross.unionByName(drops_within).distinct()
    return new_documents.join(drops, "doc_id", "left_anti").select("doc_id", "lang", "source")


def refresh_minhash_index_from_diff(
    spark: SparkSession,
    index_dir: str,
    old_documents: DataFrame,
    new_documents: DataFrame,
    n: int | None = None,
    k: int | None = None,
    band: int | None = None,
    hash_mode: str | None = None,
) -> None:
    """Fold a corpus-snapshot transition into the stored MinHash index
    from ``corpus_diff``'s work-list — the same incremental contract
    as ``retrieval.refresh_text_index_from_diff``: removed/changed
    docs tombstone out (they stop acting as dedup/decontamination
    precedent), added/changed docs append their bands+shingles, and
    the result answers ``dedup_against_index`` /
    ``decontaminate_against_index`` exactly as a fresh build on the
    new snapshot (tested).  Cost ∝ diff, never a re-LSH of the corpus.

    MinHash tombstones are doc-id-scoped (not batch-scoped), so the
    order here matters: the DELETE commits first and the re-ADD of
    changed docs lands after ``compact_minhash_index`` retires the
    tombstones — callers running without compaction should treat
    changed docs as takedown-until-compact (the documented MinHash
    re-add rule).  This helper therefore compacts between the two
    halves when any changed doc must re-enter."""
    from .corpus import corpus_diff

    diff = corpus_diff(old_documents, new_documents).persist()
    try:
        gone = diff.where(F.col("change").isin("removed", "changed")).select("doc_id")
        changed = diff.where(F.col("change") == "changed").select("doc_id")
        fresh = new_documents.join(
            diff.where(F.col("change").isin("added", "changed")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        if not gone.isEmpty():
            delete_from_minhash_index(spark, index_dir, gone)
            if not changed.isEmpty():
                # doc-id-scoped tombstones would kill the re-add too —
                # compact first so changed docs can re-enter cleanly
                compact_minhash_index(spark, index_dir)
        if not fresh.isEmpty():
            update_minhash_index(fresh, index_dir, n, k, band, hash_mode)
    finally:
        diff.unpersist()
