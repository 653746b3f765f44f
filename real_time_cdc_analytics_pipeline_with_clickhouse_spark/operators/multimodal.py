"""Multimodal column handling (north star).

Images/audio/video ride as opaque ``binary`` columns with typed
metadata (schemas.MULTIMODAL_ASSET).  The Spark-side plumbing — schema,
partition-friendly derivation, Arrow-batched ``mapInPandas`` feature
extraction — is real and tested; the actual media decode is stubbed
(no image/audio libs in this container) behind ``decode_media``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "asset_id long, modality string, byte_len long, payload_md5 string, mean_byte double"
)


def assets_from_documents(documents: DataFrame) -> DataFrame:
    """Derive a deterministic multimodal asset table from ``documents``:
    payload = utf-8 bytes of the text, modality by doc_id % 3, typed
    metadata filled per modality."""
    m = F.col("doc_id") % 3
    modality = F.when(m == 0, "image").when(m == 1, "audio").otherwise("video")
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.when(m == 0, "image/png").when(m == 1, "audio/wav").otherwise("video/mp4").alias("mime"),
        F.when(m == 0, (F.col("doc_id") % 16 + 1) * 64).cast("long").alias("width"),
        F.when(m == 0, (F.col("doc_id") % 9 + 1) * 64).cast("long").alias("height"),
        F.when(m == 1, F.lit(16000)).cast("long").alias("sample_rate"),
        F.when(m == 2, F.col("n_chars") % 240 + 1).cast("long").alias("n_frames"),
    )


def decode_media(payload: bytes, modality: str):
    """Decode an asset into pixels/samples/frames.

    STUB: real decoding needs PIL/librosa/av, which are not in this
    container.  The Spark-side contract (binary in, array features out
    via mapInPandas) is what the engine owns.
    """
    raise NotImplementedError("media decode requires image/audio libs not present here")


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic byte-level features stand in for the decode step:
    byte length, md5 digest, mean byte value.  Shape and batching are
    exactly what a real decoder would use (mapInPandas: per-partition
    iterator of pandas batches, no driver collect)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "byte_len": payloads.map(len),
                    "payload_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else None
                    ),
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id long, width long, height long, out_width long, out_height long, resized_md5 string"
)


def resize_images(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize plumbing for image assets: aspect-preserving target dims +
    a deterministic digest standing in for the resized pixel buffer.

    The dimension math is vectorized pandas (integer, deterministic);
    the pixel transform itself would live where the md5 is computed —
    ``decode_media`` documents the stub.  One Arrow batch in, one out;
    non-image rows are filtered before the UDF so the Python stage only
    ever sees the rows it must touch.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            scale_num = w.combine(h, max)  # longest side
            out_w = (w * max_side) // scale_num
            out_h = (h * max_side) // scale_num
            # no upscaling: assets already within bounds pass through
            small = scale_num <= max_side
            out_w = out_w.where(~small, w)
            out_h = out_h.where(~small, h)
            digest = [
                hashlib.md5(bytes(p) + f":{ow}x{oh}".encode()).hexdigest()
                for p, ow, oh in zip(pdf["payload"], out_w, out_h)
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": w,
                    "height": h,
                    "out_width": out_w,
                    "out_height": out_h,
                    "resized_md5": digest,
                }
            )

    images = assets.where(F.col("modality") == "image")
    return images.mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "asset_id long, frame_idx long, ts_ms long, frame_md5 string"
FRAME_RATE = 24  # synthetic fixed fps for ts derivation


def sample_frames(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video assets: one output row per sampled
    frame — the row-expanding ``mapInPandas`` shape a real decoder
    uses (iterate frames, emit every Nth).

    Frame payloads are deterministic digests of (payload, frame_idx)
    standing in for decoded frames (``decode_media`` stub applies).
    Expansion happens inside the Arrow batch, so a 10k-frame video
    never materializes per-frame rows on the driver, and partitions
    stay balanced by input asset.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            out_ids, out_idx, out_ts, out_md5 = [], [], [], []
            for aid, payload, n_frames in zip(
                pdf["asset_id"], pdf["payload"], pdf["n_frames"]
            ):
                for i in range(0, int(n_frames), every_n):
                    out_ids.append(aid)
                    out_idx.append(i)
                    out_ts.append(i * 1000 // FRAME_RATE)
                    out_md5.append(
                        hashlib.md5(bytes(payload) + f":frame{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "asset_id": out_ids,
                    "frame_idx": out_idx,
                    "ts_ms": out_ts,
                    "frame_md5": out_md5,
                }
            )

    videos = assets.where((F.col("modality") == "video") & F.col("n_frames").isNotNull())
    return videos.mapInPandas(batches, schema=FRAME_SCHEMA)


def asset_metadata_stats(assets: DataFrame) -> DataFrame:
    """Typed-metadata rollup per modality (pure column ops)."""
    return assets.groupBy("modality").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.sum(F.coalesce(F.col("width") * F.col("height"), F.lit(0))).alias("total_pixels"),
    )
