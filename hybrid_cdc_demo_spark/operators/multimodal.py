"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + a typed metadata struct; the
Spark-side machinery — schema, partitioning, Arrow batch shape,
mapInPandas signatures — is real and tested. The actual codec calls
are STUBBED (image/audio libraries are not in this container): decode
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder produces a byte-histogram "feature vector"
so the distributed plumbing can be exercised end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime_type", StringType()),
        StructField("content", BinaryType()),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def documents_as_media(df: DataFrame, modality: str = "image") -> DataFrame:
    """Build a media table from the documents fixture: text bytes stand
    in for encoded media content. Shapes the exact schema a real
    ingest (binaryFile source / object-store listing) would produce."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit(f"{modality}/fake").alias("mime_type"),
        F.encode("text", "utf-8").alias("content"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def decode_media(content: bytes, mime_type: str):
    """Real codec hook — not available in this container."""
    raise NotImplementedError(
        "media decoding requires imaging/audio libraries not present in "
        "this environment; pass fake=True for the deterministic stub"
    )


def _fake_features(content: bytes, bins: int = 16) -> list[float]:
    """Deterministic stand-in for decode+feature-extract: normalized
    byte histogram (same output for same bytes, any machine)."""
    arr = np.frombuffer(content, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
    total = max(len(arr), 1)
    return (hist / total).round(6).tolist()


def extract_features(
    media: DataFrame, fake: bool = False, bins: int = 16
) -> DataFrame:
    """Distributed decode + feature extraction via mapInPandas.

    Arrow-batched: each worker receives a pandas batch of binary
    payloads and emits fixed-width feature vectors — the identical
    plumbing a real image decoder (PIL/libvips) would use, with the
    codec call swapped in for ``_fake_features``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # surface the stub explicitly rather than silently faking
                raise NotImplementedError("no media codecs in this environment")
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(len),
                    "features": pdf["content"].map(
                        lambda c: _fake_features(bytes(c), bins)
                    ),
                }
            )
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("mime_type", StringType()),
        StructField("content", BinaryType()),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def resize_media(
    media: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Distributed image resize via mapInPandas: same batch shape a
    real decoder+resizer (PIL/libvips) uses — binary in, binary out,
    metadata updated. The codec is stubbed: ``fake=True`` emits a
    deterministic byte downsample so the plumbing (schema, Arrow
    round trip, metadata propagation) is testable end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = max(width * height, 1)
        for pdf in batches:
            if not fake:
                raise NotImplementedError("no media codecs in this environment")

            def shrink(c: bytes) -> bytes:
                arr = np.frombuffer(bytes(c), dtype=np.uint8)
                if len(arr) == 0:
                    return b"\x00" * target
                idx = np.linspace(0, len(arr) - 1, target).astype(int)
                return arr[idx].tobytes()

            out = pdf.copy()
            out["content"] = out["content"].map(shrink)
            out["width"] = width
            out["height"] = height
            yield out[[f.name for f in RESIZED_SCHEMA.fields]]

    return media.mapInPandas(run, RESIZED_SCHEMA)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("mean_level", DoubleType()),
        StructField("rms", DoubleType()),
    ]
)


def audio_stats(media: DataFrame, fake: bool = False) -> DataFrame:
    """Waveform-level statistics via mapInPandas (decode stubbed;
    ``fake=True`` treats bytes as unsigned 8-bit samples)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("no audio codecs in this environment")
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = np.frombuffer(bytes(content), dtype=np.uint8).astype(float)
                n = len(arr)
                rows.append(
                    {
                        "media_id": mid,
                        "n_samples": n,
                        "mean_level": float(arr.mean()) if n else 0.0,
                        "rms": float(np.sqrt((arr**2).mean())) if n else 0.0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_STATS_SCHEMA.fields])

    return media.mapInPandas(run, AUDIO_STATS_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (content decode stubbed). Demonstrates the explode-based
    fan-out shape: partition count grows with frames, not videos."""
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


HEADER_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("channels", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def _sniff_header(b: bytes) -> dict:
    """REAL container-header parsing — pure byte-level, no codec
    libraries: PNG IHDR, GIF logical screen, BMP info header, JPEG
    SOF marker walk, WAV fmt/data chunks. This is the object-store
    ingest step that types and sizes media before any pixel/sample
    decode happens (which remains stubbed in this container).
    Malformed/foreign bytes classify as 'unknown' with null metadata —
    never an exception (corrupt media must not fail the scan)."""
    import struct

    out = {"format": "unknown", "width": None, "height": None,
           "sample_rate": None, "channels": None, "duration_ms": None}
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            out.update(format="png", width=w, height=h)
        elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            out.update(format="gif", width=w, height=h)
        elif b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            out.update(format="bmp", width=w, height=abs(h))
        elif b[:2] == b"\xff\xd8":
            # walk JPEG segments to the first SOF (C0-CF minus C4/C8/CC)
            i = 2
            while i + 9 <= len(b) and b[i] == 0xFF:
                marker = b[i + 1]
                if 0xD0 <= marker <= 0xD9:  # standalone markers
                    i += 2
                    continue
                seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    out.update(format="jpeg", width=w, height=h)
                    break
                i += 2 + seg_len
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i, rate, ch, bps, data_len = 12, None, None, None, None
            while i + 8 <= len(b):
                cid, clen = b[i:i + 4], struct.unpack("<I", b[i + 4:i + 8])[0]
                if cid == b"fmt " and i + 24 <= len(b):
                    ch, rate = struct.unpack("<HI", b[i + 10:i + 16])
                    bps = struct.unpack("<H", b[i + 22:i + 24])[0]
                elif cid == b"data":
                    data_len = clen
                i += 8 + clen + (clen & 1)
            if rate:
                out.update(format="wav", sample_rate=rate, channels=ch)
                if data_len is not None and ch and bps:
                    frames = data_len // max(ch * (bps // 8), 1)
                    out["duration_ms"] = frames * 1000 // rate
    except (struct.error, IndexError):
        out = {"format": "unknown", "width": None, "height": None,
               "sample_rate": None, "channels": None, "duration_ms": None}
    return out


def parse_media_headers(media: DataFrame) -> DataFrame:
    """Distributed header sniffing via mapInPandas (Arrow-batched, the
    same plumbing as extract_features but with NOTHING stubbed — the
    parser reads real container bytes). One row per media item:
    (media_id, format, width, height, sample_rate, channels,
    duration_ms), nulls where the container doesn't carry the field."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in HEADER_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = _sniff_header(bytes(content) if content is not None else b"")
                d["media_id"] = mid
                rows.append(d)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, HEADER_SCHEMA)
