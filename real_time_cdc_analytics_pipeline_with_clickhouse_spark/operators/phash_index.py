"""Incremental perceptual-hash dedup index — dedup a NEW batch of
media assets against a 100 TB asset corpus without re-decoding the
corpus.

The media twin of ``lsh_index`` (MinHash over text): ``dedup_assets``
(asset_embed.py) is the whole-corpus flow — every run re-decodes and
re-fingerprints everything.  An ingest pipeline instead PERSISTS the
fingerprints and joins each arriving batch against them:

- ``build_phash_index`` stores the fingerprint table
  ``(asset_id, modality, phash)`` — 8 bytes of hash per asset
  regardless of payload size, so the index is ~4 orders of magnitude
  smaller than the media it covers (the whole reason perceptual
  hashing is THE production answer for image dedup);
- ``dedup_assets_against_index`` decodes/fingerprints ONLY the new
  batch (cost ∝ batch — the corpus is never re-decoded), bands both
  sides and equi-joins on (modality, band_id, band_val)
  (pigeonhole-complete to hamming ``n_bands − 1``, exact
  ``bit_count`` verification — the same construction as
  ``asset_embed.phash_near_pairs``), and drops a new asset iff it
  near-dups an indexed asset or a smaller-id batch-mate;
- ``update_phash_index`` appends the batch's fingerprints (ALL its
  assets, kept or dropped — a dropped asset still outranks later
  copies of itself, the ``lsh_index`` precedent rule);
- ``delete_from_phash_index`` / ``compact_phash_index`` carry the
  takedown + small-file lifecycle every stored artifact in this
  engine has (atomic tombstone swap; stage-swapped distinct rewrite
  retires the tombstones).

Equivalence contract (tested): when every indexed asset precedes the
batch (ids below the batch's), the incremental survivors equal the
greedy pairwise rule over the full old∪new corpus — an asset drops
iff it is the higher id of a verified near-dup pair — i.e. the
perceptual analog of ``dedup.fuzzy_dedup_keep``'s policy.  (The
one-survivor-per-component policy lives in ``asset_embed.
dedup_assets`` for batch curation; ingest uses the greedy rule
because components cannot be known incrementally.)

Streaming form: ``streaming/pipeline.start_asset_ingest_sink``.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .asset_embed import PHASH_BANDS, PHASH_BITS, perceptual_hashes

FP_TABLE = "fingerprints"


def _banded(fp: DataFrame, n_bands: int) -> DataFrame:
    """(asset_id, modality, phash, band_id, band_val) — the same band
    algebra as ``phash_near_pairs`` (unsigned shifts: bit 63 must not
    smear sign across bands).  Banding is derived at JOIN time from
    the stored 8-byte fingerprints — re-deriving 4 rows over the tiny
    hash table beats storing the bands 4×."""
    if PHASH_BITS % n_bands != 0:
        raise ValueError(f"bits={PHASH_BITS} not divisible by n_bands={n_bands}")
    width = PHASH_BITS // n_bands
    mask = (1 << width) - 1
    return fp.select(
        "asset_id",
        "modality",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned(F.col("phash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(
        "asset_id",
        "modality",
        "phash",
        F.col("bk.band_id").alias("band_id"),
        F.col("bk.band_val").alias("band_val"),
    )


def build_phash_index(assets: DataFrame, index_dir: str) -> None:
    """Materialize the fingerprint table from the current asset corpus
    (one full decode pass — paid once, then every batch is
    incremental)."""
    perceptual_hashes(assets).write.mode("overwrite").parquet(
        f"{index_dir}/{FP_TABLE}"
    )


def update_phash_index(new_assets: DataFrame, index_dir: str) -> None:
    """Append a batch's fingerprints (all of them — see module
    docstring's precedent rule)."""
    perceptual_hashes(new_assets).write.mode("append").parquet(
        f"{index_dir}/{FP_TABLE}"
    )


def _tomb_ids(spark: SparkSession, index_dir: str):
    p = f"{index_dir}/tombstones"
    if not os.path.isdir(p):
        return None
    return spark.read.parquet(p).select("asset_id").distinct()


def delete_from_phash_index(spark: SparkSession, index_dir: str, asset_ids) -> None:
    """Takedown path: one atomic tombstone-table swap; a deleted asset
    stops acting as dedup precedent immediately (the index side
    anti-joins tombstones) and ``compact_phash_index`` purges its rows
    physically.  Idempotent; unknown ids no-op.  Doc-id-scoped like
    the MinHash tombstones: re-adding a deleted asset_id takes effect
    after a compaction retires its tombstone."""
    from .retrieval import _commit_tombstones, _ids_frame

    if not os.path.isdir(f"{index_dir}/{FP_TABLE}"):
        raise FileNotFoundError(
            f"no phash index at {index_dir} — run build_phash_index first"
        )
    ids = _ids_frame(spark, asset_ids, "asset_id")
    existing = _tomb_ids(spark, index_dir)
    new_tomb = ids if existing is None else existing.unionByName(ids).distinct()
    _commit_tombstones(new_tomb, f"{index_dir}/tombstones")


def compact_phash_index(spark: SparkSession, index_dir: str) -> None:
    """Small-file + tombstone compaction: distinct rewrite (the table
    is set-semantic — a crash-replayed append's duplicate rows mean
    nothing and are squashed here), tombstoned assets purged, stage-
    then-swap, tombstones retired after the swap."""
    import shutil

    from ..warehouse import _stage_swap

    tomb = _tomb_ids(spark, index_dir)
    fp = spark.read.parquet(f"{index_dir}/{FP_TABLE}")
    if tomb is not None:
        fp = fp.join(F.broadcast(tomb), "asset_id", "left_anti")
    _stage_swap(
        fp.distinct().repartition(spark.sparkContext.defaultParallelism),
        f"{index_dir}/{FP_TABLE}",
    )
    shutil.rmtree(f"{index_dir}/tombstones", ignore_errors=True)


def dedup_assets_against_index(
    spark: SparkSession,
    new_assets: DataFrame,
    index_dir: str,
    max_hamming: int = PHASH_BANDS - 1,
    n_bands: int = PHASH_BANDS,
) -> DataFrame:
    """Survivors of the new batch against corpus + batch (module
    docstring contract).  Does NOT update the index — call
    ``update_phash_index`` after persisting survivors, the same
    stage-then-publish discipline as ``dedup_against_index``.

    Scale shape per batch: one decode pass over the BATCH, then
    fingerprint-table equi-joins — the corpus side ships only the
    (modality, band) rows matching the batch's bands; exact hamming
    verification is an expression on the joined 8-byte pair.  Returns
    the surviving asset rows with every input column."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs > {max_hamming} bands (have {n_bands})"
        )
    if not os.path.isdir(f"{index_dir}/{FP_TABLE}"):
        raise FileNotFoundError(
            f"no phash index at {index_dir} — run build_phash_index first"
        )
    # one decode for the whole call: both the cross and within joins
    # (and the caller's later update) reuse the exchange
    par = spark.sparkContext.defaultParallelism
    new_fp = perceptual_hashes(new_assets).repartition(par)
    new_bands = _banded(new_fp, n_bands)
    idx_fp = spark.read.parquet(f"{index_dir}/{FP_TABLE}")
    tomb = _tomb_ids(spark, index_dir)
    if tomb is not None:
        idx_fp = idx_fp.join(F.broadcast(tomb), "asset_id", "left_anti")
    idx_bands = _banded(idx_fp, n_bands)

    def _drops(a: DataFrame, b: DataFrame) -> DataFrame:
        # a = precedent side, b = batch side; doc_a < doc_b enforces
        # the indexed-ids-precede-batch contract AND makes a
        # crash-replayed batch deterministic (the replay sees its own
        # append in the index; self-pairs and larger-id mates are
        # excluded exactly as within-batch)
        return (
            a.alias("a")
            .join(
                b.alias("b"),
                (F.col("a.modality") == F.col("b.modality"))
                & (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.asset_id") < F.col("b.asset_id")),
            )
            .where(
                F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
                <= max_hamming
            )
            .select(F.col("b.asset_id").alias("asset_id"))
            .distinct()
        )

    drops = _drops(idx_bands, new_bands).unionByName(
        _drops(new_bands, new_bands)
    ).distinct()
    return new_assets.join(drops, "asset_id", "left_anti")
