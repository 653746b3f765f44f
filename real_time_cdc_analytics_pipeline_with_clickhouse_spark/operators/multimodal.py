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


def asset_metadata_stats(assets: DataFrame) -> DataFrame:
    """Typed-metadata rollup per modality (pure column ops)."""
    return assets.groupBy("modality").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.sum(F.coalesce(F.col("width") * F.col("height"), F.lit(0))).alias("total_pixels"),
    )
