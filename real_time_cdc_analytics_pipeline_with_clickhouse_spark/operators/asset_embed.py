"""Media assets → the engine's vector/dedup stack (north star).

``embedder.embed_documents`` proved the pattern for text: a
deterministic, model-free embedder whose output rides the SAME
(vec_id, embedding) contract as the ``embeddings`` table, so every
downstream operator — sign-LSH near-dup, persistent IVF/PQ indexes,
SemDeDup, cluster-balanced sampling — works unchanged.  This module
is the multimodal leg of that bridge: image/audio/video payloads
(``multimodal.decode_media`` output — real codec when importable,
deterministic fallback otherwise) reduce to a fixed 8×8 CONTENT TILE
per asset, which then feeds

- ``embed_assets``     → mean-centered, L2-normalized 64-dim vectors
  (cosine geometry: byte-identical assets embed identically,
  small payload edits move the vector a little), and
- ``perceptual_hashes`` → a 64-bit aHash-style fingerprint (bit b set
  iff tile cell b is brighter than the tile mean — Average Hash, the
  classic perceptual image fingerprint) with
  ``phash_near_pairs`` as the image analog of
  ``dedup.simhash_near_pairs``: banded hamming search, pigeonhole-
  complete candidates, exact ``bit_count`` verification.

The tile is the modality-agnostic canonical form:

- image  → 8×8 block means of the decoded pixel raster (channels
  averaged to gray first if a real codec returns RGB);
- audio  → 64 window means over the decoded int16 samples;
- video  → per-frame 8×8 tile of ≤16 evenly-sampled decoded frames,
  averaged across frames.

Decode/tile is Python (the engine's Arrow-batched custom-operator
tier — ``mapInPandas``, bounded per-row work, no driver collect, no
shuffle of payload bytes beyond the input scan); everything after
the tile is the existing native stack.  Correctness twin: the tile
math is byte-deterministic, so tests recompute embeddings and
fingerprints EXACTLY with an independent pure-numpy reference
(tests/test_asset_embed.py) — the multimodal analog of the DuckDB
twins (DuckDB cannot decode media; numpy is the honest oracle here).

Scale shape at 100 TB: the decode pass is embarrassingly parallel
over assets (one scan, map-only); near-dup candidates come from
(modality, band) equi-joins or the IVF index's centroid cells —
never an all-pairs comparison; fingerprints are 8 bytes/asset and
vectors 256 bytes/asset regardless of payload size, so the derived
tables are ~4 orders of magnitude smaller than the corpus.

Reference parity note: the reference pipeline (ESJ, clickhouse sql)
has no media columns at all — this module, like embedder.py, is part
of the training-data-pipeline surface the north-star brief adds on
top of reference parity.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .multimodal import decode_media

GRID = 8  # canonical tile is GRID×GRID → embedding dim GRID²
TILE_DIM = GRID * GRID
PHASH_BITS = 64  # one bit per tile cell
PHASH_BANDS = 4  # 4 × 16-bit bands → pigeonhole-complete to hamming 3
MAX_VIDEO_FRAMES = 16  # evenly-sampled frame budget per video


def _block_bounds(n: int, parts: int) -> np.ndarray:
    """parts+1 monotone boundaries splitting range(n) into ``parts``
    nearly-equal segments (the same integer grid math as
    ``multimodal.resize_images``); empty segments are legal for
    n < parts and contribute 0 to the tile."""
    return (np.arange(parts + 1, dtype=np.int64) * n) // parts


def _grid_means_2d(px: np.ndarray) -> np.ndarray:
    """GRID×GRID block means of a 2-D array, flattened — one
    ``add.reduceat`` per axis instead of 64 Python-level slices (the
    per-asset hot path: ~4× cheaper on a 1024×576 raster).  Integer
    inputs accumulate in int64 along the contiguous axis first (both
    exact AND the fast memory order); block means are then exact
    float64 divisions, bit-identical to a float64 sequential sum
    (every intermediate integer < 2^53).  Empty blocks (side < GRID)
    contribute 0."""
    h, w = px.shape
    rb, cb = _block_bounds(h, GRID), _block_bounds(w, GRID)
    acc = np.int64 if px.dtype.kind in "iub" else np.float64
    c1 = np.add.reduceat(px, cb[:-1], axis=1, dtype=acc)
    cs = np.add.reduceat(c1, rb[:-1], axis=0)
    sizes = np.diff(rb)[:, None] * np.diff(cb)[None, :]
    out = np.zeros((GRID, GRID))
    nz = sizes > 0
    out[nz] = cs[nz] / sizes[nz]
    return out.ravel()


def _seg_means_1d(x: np.ndarray, parts: int) -> np.ndarray:
    """``parts`` segment means of a 1-D array (empty segments → 0;
    same exact int64-accumulate rule as ``_grid_means_2d``)."""
    if x.size == 0:
        return np.zeros(parts)
    b = _block_bounds(x.size, parts)
    acc = np.int64 if x.dtype.kind in "iub" else np.float64
    s = np.add.reduceat(x, b[:-1], dtype=acc)
    sizes = np.diff(b)
    out = np.zeros(parts)
    nz = sizes > 0
    out[nz] = s[nz] / sizes[nz]
    return out


def _tile_of(
    modality: str,
    payload: bytes,
    width,
    height,
    sample_rate,
    n_frames,
) -> np.ndarray:
    """The canonical GRID×GRID content tile (float64, flattened) of one
    decoded asset — the single definition both the embedding and the
    perceptual hash commit to."""
    if modality == "image":
        px = decode_media(payload, "image", width=int(width), height=int(height))
        if px.ndim == 3:  # real-codec RGB(A): average channels to gray
            px = px.mean(axis=2)
        return _grid_means_2d(px)
    if modality == "audio":
        samples = decode_media(payload, "audio", sample_rate=sample_rate)
        return _seg_means_1d(samples, TILE_DIM)
    if modality == "video":
        frames = decode_media(payload, "video", n_frames=int(n_frames)).astype(
            np.float64
        )
        if frames.shape[0] == 0:
            # zero-frame clip: zero tile (→ zero embedding, phash 0),
            # never a NaN mean over an empty axis
            return np.zeros(TILE_DIM)
        # ceil-step keeps the sample within the frame budget (floor-step
        # kept up to 2×MAX−1 frames, e.g. 17 of n=33)
        step = -(-frames.shape[0] // MAX_VIDEO_FRAMES)
        sampled = frames[::step]
        # fallback frames are already GRID×GRID; a real decoder's
        # larger frames reduce by the image block-mean rule
        if sampled.shape[1] == GRID and sampled.shape[2] == GRID:
            return sampled.mean(axis=0).ravel()
        return _grid_means_2d(sampled.mean(axis=0))
    raise ValueError(f"unknown modality {modality!r}")


def _iter_tiles(pdf: pd.DataFrame) -> Iterator[tuple[int, str, np.ndarray]]:
    for aid, modality, payload, w, h, sr, nf in zip(
        pdf["asset_id"], pdf["modality"], pdf["payload"],
        pdf["width"], pdf["height"], pdf["sample_rate"], pdf["n_frames"],
    ):
        yield int(aid), modality, _tile_of(modality, payload, w, h, sr, nf)


ASSET_EMB_SCHEMA = "vec_id long, modality string, embedding array<float>"


def embed_assets(assets: DataFrame) -> DataFrame:
    """(vec_id, modality, embedding array<float>) — deterministic
    content embeddings of media assets, ready for the vector stack:
    the output feeds ``build_ivf_index`` / ``embedding_near_dup_pairs``
    / ``semantic_dedup_keep`` / ``ann_*_topk`` unchanged (``vec_id`` =
    ``asset_id``; the ``embeddings`` table contract, embedder.py:39's
    multimodal twin).

    Vector = the asset's 8×8 content tile, mean-centered then unit-L2
    (float32).  Centering makes the geometry CONTENT-shaped: a global
    brightness/DC offset cancels, so two assets differing only by a
    constant shift embed identically, while byte-identical payloads
    trivially do.  A constant tile (no content variation — e.g. an
    empty payload decoding to all zeros) has norm 0 after centering
    and surfaces as the ZERO vector, the same survival rule as
    ``embed_documents`` for tokenless docs; filter those before
    indexing (cosine 0 against everything).

    Compare modalities separately downstream (``modality`` rides
    along): an audio window-mean vector and an image block-mean vector
    share a space only nominally."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mods, vecs = [], [], []
            for aid, modality, tile in _iter_tiles(pdf):
                ids.append(aid)
                mods.append(modality)
                vecs.append(_embedding_of_tile(tile))
            yield pd.DataFrame(
                {"vec_id": ids, "modality": mods, "embedding": vecs}
            )

    return assets.mapInPandas(batches, schema=ASSET_EMB_SCHEMA)


ASSET_FEATURES_SCHEMA = (
    "asset_id long, modality string, phash long, embedding array<float>"
)


def _phash_of_tile(tile: np.ndarray) -> int:
    """Average-Hash of a tile — the single bit-pack definition
    ``perceptual_hashes`` and ``asset_features`` share (vectorized
    packbits; see ``perceptual_hashes`` for the bit-order argument)."""
    packed = np.packbits(tile > tile.mean(), bitorder="little")
    v = int.from_bytes(packed.tobytes(), "little")
    return v - (1 << 64) if v >= 1 << 63 else v


def _embedding_of_tile(tile: np.ndarray) -> np.ndarray:
    """Mean-centered unit-L2 tile vector — the single definition
    ``embed_assets`` and ``asset_features`` share (zero vector for a
    constant tile; see ``embed_assets`` for the geometry argument)."""
    centered = tile - tile.mean()
    nrm = float(np.sqrt((centered * centered).sum()))
    vec = centered / nrm if nrm > 0 else np.zeros(TILE_DIM)
    return vec.astype(np.float32)


def asset_features(assets: DataFrame) -> DataFrame:
    """(asset_id, modality, phash, embedding) — BOTH derived
    representations from ONE decode pass: the tile is computed once
    per asset and the fingerprint and embedding are cheap functions of
    it, so a pipeline needing both (the unified media ingest sink —
    perceptual dedup gate + vector index fold) pays the decode
    exactly once per micro-batch by construction, with no reliance on
    exchange reuse.  Column-for-column equal to ``perceptual_hashes``
    × ``embed_assets`` on the same input (tested)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mods, fps, vecs = [], [], [], []
            for aid, modality, tile in _iter_tiles(pdf):
                ids.append(aid)
                mods.append(modality)
                fps.append(_phash_of_tile(tile))
                vecs.append(_embedding_of_tile(tile))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "modality": mods,
                    "phash": pd.Series(fps, dtype="int64"),
                    "embedding": vecs,
                }
            )

    return assets.mapInPandas(batches, schema=ASSET_FEATURES_SCHEMA)


PHASH_SCHEMA = "asset_id long, modality string, phash long"


def perceptual_hashes(assets: DataFrame) -> DataFrame:
    """(asset_id, modality, phash) — 64-bit Average-Hash fingerprint:
    bit b is set iff tile cell b is STRICTLY above the tile mean, so a
    constant tile fingerprints as 0 and a brightness offset leaves the
    fingerprint unchanged (same DC-invariance as the embedding).  The
    long is the two's-complement view of the 64-bit pattern (bit 63
    set ⇒ negative — ``bit_count``/XOR treat it correctly; band
    extraction below uses unsigned shifts)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mods, fps = [], [], []
            for aid, modality, tile in _iter_tiles(pdf):
                # vectorized (tile > mean) → little-endian packbits:
                # byte j bit i of the packed buffer IS fingerprint bit
                # 8j+i, so the little-endian int view reproduces the
                # Σ 2^b construction bit-for-bit without a 64-iteration
                # Python loop per asset (_phash_of_tile; two's-
                # complement into int64)
                ids.append(aid)
                mods.append(modality)
                fps.append(_phash_of_tile(tile))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "modality": mods,
                    "phash": pd.Series(fps, dtype="int64"),
                }
            )

    return assets.mapInPandas(batches, schema=PHASH_SCHEMA)


def phash_near_pairs(
    assets: DataFrame,
    max_hamming: int = PHASH_BANDS - 1,
    n_bands: int = PHASH_BANDS,
) -> DataFrame:
    """Perceptual near-duplicate pairs at hamming ≤ ``max_hamming`` —
    the image analog of ``dedup.simhash_near_pairs`` (dedup.py:226),
    over perceptual fingerprints instead of token fingerprints.

    Same banded-hamming construction: the 64-bit fingerprint splits
    into ``n_bands`` equal bands; two fingerprints within hamming
    ``n_bands − 1`` must agree exactly on ≥1 band (pigeonhole), so
    the (modality, band_id, band_val) equi-join yields a COMPLETE
    candidate set for that radius, then ``bit_count`` verifies the
    true distance.  Pairs never cross modalities — an audio
    fingerprint agreeing with an image fingerprint is meaningless.

    Scale shape: the candidate join runs on the 8-byte fingerprint
    table (never payloads), n_bands rows per asset, one equi-join,
    no broadcast of anything corpus-sized, no cartesian."""
    if PHASH_BITS % n_bands != 0:
        raise ValueError(f"bits={PHASH_BITS} not divisible by n_bands={n_bands}")
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs > {max_hamming} bands (have {n_bands})"
        )
    width = PHASH_BITS // n_bands
    mask = (1 << width) - 1
    # shuffle boundary AFTER the fingerprints: both self-join branches
    # then hang off ONE identical Exchange, which AQE reuses — without
    # it each branch re-runs the whole decode/tile MapInPandas stage
    # (the expensive pass) independently (ReusedExchange-asserted)
    par = assets.sparkSession.sparkContext.defaultParallelism
    fp = perceptual_hashes(assets).repartition(par, F.col("asset_id"))
    bands = fp.select(
        "asset_id",
        "modality",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        # unsigned shift: bit 63 rides in band n_bands−1
                        # and must not smear sign bits across bands
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
    a, b_ = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.modality") == F.col("b.modality"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.col("a.modality").alias("modality"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias(
                "hamming"
            ),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dedup_assets(
    assets: DataFrame,
    max_hamming: int = PHASH_BANDS - 1,
    n_bands: int = PHASH_BANDS,
    priority: str | None = None,
) -> DataFrame:
    """Perceptual ASSET dedup end-to-end — the media analog of
    ``dedup.fuzzy_dedup_keep_by`` (dedup.py:470): connected components
    over the verified ``phash_near_pairs`` graph (components never
    cross modalities because the pairs don't), ONE survivor per
    component — the highest-``priority`` asset (any numeric column of
    ``assets``; add a computed one with ``withColumn`` first), ties
    and the default policy falling to the smallest asset_id.  Returns
    the surviving rows with every input column.

    Scale shape: pairs as in ``phash_near_pairs`` (fingerprint-table
    joins), components via the large-star/small-star min-label
    iteration (edge-sized shuffles — near-dup graphs are sparse),
    keeper choice one combinable ``max_by`` per component, the final
    drop one anti-join.  Null priorities rank below every real value
    rather than poisoning the max."""
    from .dedup import connected_components

    pairs = phash_near_pairs(assets, max_hamming, n_bands).select(
        F.col("asset_a").alias("doc_a"), F.col("asset_b").alias("doc_b")
    )
    comp = connected_components(pairs)  # (doc_id, label)
    if priority is None:
        keepers = comp.groupBy("label").agg(F.min("doc_id").alias("keep_id"))
    else:
        pri = assets.select(
            F.col("asset_id").alias("doc_id"),
            F.coalesce(F.col(priority).cast("double"), F.lit(float("-inf"))).alias(
                "_pri"
            ),
        )
        keepers = (
            comp.join(pri, "doc_id")
            .groupBy("label")
            .agg(
                F.max_by(
                    "doc_id",
                    F.struct(F.col("_pri"), (-F.col("doc_id")).alias("_tie")),
                ).alias("keep_id")
            )
        )
    drops = (
        comp.join(keepers, "label")
        .where(F.col("doc_id") != F.col("keep_id"))
        .select(F.col("doc_id").alias("asset_id"))
    )
    return assets.join(drops, "asset_id", "left_anti")


def asset_near_dup_pairs(
    assets: DataFrame, threshold: float = 0.98
) -> DataFrame:
    """Embedding-cosine near-dup pairs over assets, per modality —
    ``dedup.embedding_near_dup_pairs`` semantics with the modality
    fence built in: vectors bucket by (modality, sign-LSH bucket), so
    candidates never cross modalities and each bucket stays small.
    Zero vectors (constant tiles) are dropped up front — they cannot
    exceed any positive threshold and would otherwise pile into one
    degenerate bucket."""
    from ..functions.vector import dot, norm
    from .dedup import corpus_rows, lsh_bits_for, sign_lsh_bucket

    emb = embed_assets(assets).where(
        F.aggregate(
            F.col("embedding"), F.lit(0.0), lambda a, x: a + F.abs(x)
        )
        > 0
    )
    par = assets.sparkSession.sparkContext.defaultParallelism
    # bits sized like embedding_near_dup_pairs (corpus_rows memoizes
    # the sizing count per session)
    e = emb.repartition(par, F.col("vec_id")).select(
        "vec_id",
        "modality",
        "embedding",
        sign_lsh_bucket("embedding", lsh_bits_for(corpus_rows(assets))).alias(
            "bucket"
        ),
        norm(F.col("embedding")).alias("nrm"),
    )

    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.modality") == F.col("b.modality"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.modality").alias("modality"),
            F.round(
                dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                4,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
