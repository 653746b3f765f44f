"""Multimodal column handling (north star).

Images/audio/video ride as opaque ``binary`` columns with typed
metadata (schemas.MULTIMODAL_ASSET).  The Spark-side plumbing — schema,
partition-friendly derivation, Arrow-batched ``mapInPandas``
decode/resize/frame-sample — is real and tested; ``decode_media``
prefers real codecs (Pillow / soundfile) when importable and otherwise
decodes through a tiny deterministic fallback codec, so the downstream
operators always work on true pixel/sample arrays.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "asset_id long, modality string, byte_len long, payload_md5 string, mean_byte double"
)

# codec availability, probed ONCE per process: a failed import is not
# cached by Python (unlike a successful one), so probing inside
# decode_media made every decoded row re-run the import machinery's
# full sys.path search when the codec is absent — per-row heavyweight
# init, the guide-§4.5 trap.  None = probed and absent.
_CODECS: dict[str, object] = {}


def _codec(name: str):
    if name not in _CODECS:
        try:
            if name == "pil":
                from PIL import Image

                _CODECS[name] = Image
            else:
                import soundfile

                _CODECS[name] = soundfile
        except ImportError:
            _CODECS[name] = None
    return _CODECS[name]


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


FRAME_H = FRAME_W = 8  # fallback-codec frame raster


def _tile_bytes(raw: bytes, n: int) -> "np.ndarray":
    """Cycle ``raw`` to exactly ``n`` uint8 values (empty → zeros)."""
    buf = np.frombuffer(raw, dtype=np.uint8) if raw else np.zeros(1, dtype=np.uint8)
    reps = -(-n // buf.size)
    return np.tile(buf, reps)[:n]


def decode_media(
    payload: bytes,
    modality: str,
    *,
    width: int | None = None,
    height: int | None = None,
    sample_rate: int | None = None,
    n_frames: int | None = None,
):
    """Decode an asset into numpy pixel/sample/frame arrays.

    Real codecs are preferred when importable — Pillow for images,
    soundfile for audio (neither ships in this container; the import
    guard keeps both paths live).  Otherwise the DETERMINISTIC
    FALLBACK CODEC decodes the synthetic payloads:

    - image  → (height, width) uint8 grayscale: payload bytes cycled
      to width·height and reshaped (dims from the typed metadata);
    - audio  → int16 little-endian samples straight off the bytes
      (odd trailing byte zero-padded);
    - video  → (n_frames, 8, 8) uint8: frame *i* is the base 8×8 tile
      of the payload plus *i* (mod 256) with the frame index stamped
      into the first two pixels, so every frame is distinct (up to
      65536 frames, not just 256) and any frame is reconstructable
      independently.

    Either way downstream operators (``resize_images``,
    ``sample_frames``) receive true arrays and transform real content;
    ``sample_rate`` rides along as metadata for the audio path.
    """
    raw = bytes(payload)
    if modality == "image":
        Image = _codec("pil")
        if Image is not None:
            try:
                import io

                return np.asarray(Image.open(io.BytesIO(raw)))
            except Exception:
                # importable codec but undecodable bytes (e.g. synthetic
                # payloads that aren't a real container format): fall back
                # rather than poison the whole Arrow batch.  A production
                # pipeline would instead route undecodable assets to a
                # reject lane with the error recorded.
                pass
        if not width or not height:
            raise ValueError("fallback image decode needs width/height metadata")
        return _tile_bytes(raw, int(width) * int(height)).reshape(int(height), int(width))
    if modality == "audio":
        sf = _codec("soundfile")
        if sf is not None:
            try:
                import io

                return sf.read(io.BytesIO(raw), dtype="int16")[0]
            except Exception:
                pass  # same undecodable-bytes fallback as the image path
        if len(raw) % 2:
            raw += b"\x00"
        return np.frombuffer(raw, dtype="<i2")
    if modality == "video":
        if n_frames is None:
            raise ValueError("video decode needs n_frames metadata")
        base = _tile_bytes(raw, FRAME_H * FRAME_W).reshape(FRAME_H, FRAME_W).astype(np.uint16)
        idx = np.arange(int(n_frames), dtype=np.uint16).reshape(-1, 1, 1)
        frames = ((base + idx) % 256).astype(np.uint8)
        # stamp the frame index into the first two pixels: (base+i)%256
        # alone repeats every 256 frames, which would let a
        # frame-indexing bug off by a multiple of 256 slip past the
        # digest tests; the stamp keeps every frame distinct to 65536
        frames[:, 0, 0] = (np.arange(int(n_frames)) >> 8) & 0xFF
        frames[:, 0, 1] = np.arange(int(n_frames)) & 0xFF
        return frames
    raise ValueError(f"unknown modality {modality!r}")


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
                    # exact int64 byte-sum (≡ python sum(b)) then the
                    # same float division — vectorized, value-identical
                    "mean_byte": payloads.map(
                        lambda b: float(int(np.frombuffer(b, np.uint8).sum(dtype=np.int64)))
                        / len(b)
                        if len(b)
                        else None
                    ),
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id long, width long, height long, out_width long, out_height long, resized_md5 string"
)


def resize_images(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize of image assets: decode → nearest-
    neighbor downscale on the real pixel array → digest of the resized
    buffer.

    The dimension math is vectorized pandas (integer, deterministic);
    the pixel transform is numpy index-gather on the decoded array
    (``decode_media`` — real codec when importable, deterministic
    fallback otherwise), so the digest commits to actual resized
    CONTENT, not just the target dims.  One Arrow batch in, one out;
    non-image rows are filtered before the UDF so the Python stage only
    ever sees the rows it must touch.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            out_ws, out_hs, digest = [], [], []
            for p, w_, h_ in zip(pdf["payload"], w, h):
                px = decode_media(p, "image", width=int(w_), height=int(h_))
                # source dims from the DECODED array, not the metadata:
                # a real codec's pixels are authoritative, and metadata
                # larger than the decode would index out of bounds
                # (fallback codec decodes to metadata dims, so both
                # agree there)
                sh, sw = int(px.shape[0]), int(px.shape[1])
                longest = max(sh, sw)
                if longest <= max_side:  # no upscaling: pass through
                    oh, ow = sh, sw
                else:
                    oh = (sh * max_side) // longest
                    ow = (sw * max_side) // longest
                ys = (np.arange(oh) * sh) // oh
                xs = (np.arange(ow) * sw) // ow
                resized = px[np.ix_(ys, xs)]  # first two axes; channels ride along
                out_ws.append(ow)
                out_hs.append(oh)
                digest.append(hashlib.md5(resized.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": w,
                    "height": h,
                    "out_width": pd.Series(out_ws, dtype="int64"),
                    "out_height": pd.Series(out_hs, dtype="int64"),
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

    Each emitted digest commits to the DECODED frame's pixel bytes
    (``decode_media`` — every fallback-codec frame is distinct, so a
    wrong frame index cannot produce a matching digest).  Expansion
    happens inside the Arrow batch, so a 10k-frame video never
    materializes per-frame rows on the driver, and partitions stay
    balanced by input asset.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            out_ids, out_idx, out_ts, out_md5 = [], [], [], []
            for aid, payload, n_frames in zip(
                pdf["asset_id"], pdf["payload"], pdf["n_frames"]
            ):
                frames = decode_media(payload, "video", n_frames=int(n_frames))
                for i in range(0, int(n_frames), every_n):
                    out_ids.append(aid)
                    out_idx.append(i)
                    out_ts.append(i * 1000 // FRAME_RATE)
                    out_md5.append(hashlib.md5(frames[i].tobytes()).hexdigest())
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
