"""Multimodal column plumbing: schema, Arrow batch shape, stub gating."""

import pytest

from hybrid_cdc_demo_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    extract_features,
    frame_sample_plan,
)
from hybrid_cdc_demo_spark.sources.tables import load_table
import pyspark.sql.functions as F


def test_media_schema(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = documents_as_media(docs)
    assert dict(media.dtypes)["content"] == "binary"
    assert media.count() == 10


def test_extract_features_fake(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = documents_as_media(docs)
    feats = extract_features(media, fake=True, bins=16).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-3  # normalized histogram
        assert r["n_bytes"] > 0


def test_extract_features_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    media = documents_as_media(docs)
    a = {r["media_id"]: r["features"] for r in extract_features(media, fake=True).collect()}
    b = {r["media_id"]: r["features"] for r in extract_features(media, fake=True).collect()}
    assert a == b


def test_real_decode_is_explicitly_stubbed(spark, sf_dir):
    with pytest.raises(NotImplementedError):
        decode_media(b"bytes", "image/png")
    docs = load_table(spark, sf_dir, "documents").limit(1)
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        extract_features(documents_as_media(docs), fake=False).collect()


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [(1, "video", "video/fake", bytearray(b"x"), None, None, 3500)],
        "media_id long, modality string, mime_type string, content binary, width long, height long, duration_ms long",
    )
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000]


def test_resize_media_plumbing(spark):
    from hybrid_cdc_demo_spark.operators.multimodal import (
        documents_as_media,
        resize_media,
    )
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    media = documents_as_media(docs)
    out = resize_media(media, width=8, height=4, fake=True)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["content"]) == 32  # exactly width*height bytes
        assert r["width"] == 8 and r["height"] == 4
    # deterministic: same input -> same bytes
    again = {r["media_id"]: bytes(r["content"]) for r in
             resize_media(media, 8, 4, fake=True).collect()}
    assert all(bytes(r["content"]) == again[r["media_id"]] for r in rows)


def test_resize_without_codec_raises(spark):
    import pytest
    from hybrid_cdc_demo_spark.operators.multimodal import (
        documents_as_media,
        resize_media,
    )
    from hybrid_cdc_demo_spark.sources.tables import load_table
    from py4j.protocol import Py4JJavaError

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(2)
    with pytest.raises(Exception):  # NotImplementedError inside the worker
        resize_media(documents_as_media(docs), 4, 4, fake=False).collect()


def test_audio_stats(spark):
    from hybrid_cdc_demo_spark.operators.multimodal import (
        audio_stats,
        documents_as_media,
    )
    from hybrid_cdc_demo_spark.sources.tables import load_table
    import numpy as np

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(10)
    media = documents_as_media(docs, modality="audio")
    stats = {r["media_id"]: r for r in audio_stats(media, fake=True).collect()}
    raw = {r["media_id"]: r["content"] for r in media.collect()}
    assert set(stats) == set(raw)
    for mid, r in stats.items():
        arr = np.frombuffer(bytes(raw[mid]), dtype=np.uint8).astype(float)
        assert r["n_samples"] == len(arr)
        assert abs(r["mean_level"] - arr.mean()) < 1e-9
        assert abs(r["rms"] - np.sqrt((arr ** 2).mean())) < 1e-9


def test_parse_media_headers_all_formats(spark):
    """REAL byte-level container parsing (no codec libs): golden
    hand-built PNG/GIF/BMP/JPEG(baseline+progressive)/WAV files parse
    to their spec dimensions; corrupt, truncated, and foreign bytes
    classify as 'unknown' with null metadata — never an exception."""
    import struct

    from hybrid_cdc_demo_spark.operators.multimodal import parse_media_headers

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">IIBBBBB", 640, 480, 8, 6, 0, 0, 0))
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 5
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 100, -50) + b"\x00" * 10
    jpg = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
           + b"\x00" * 9 + b"\xff\xc0"
           + struct.pack(">HBHH", 17, 8, 1080, 1920) + b"\x00" * 10 + b"\xff\xd9")
    jpg_prog = (b"\xff\xd8\xff\xc2"
                + struct.pack(">HBHH", 17, 8, 720, 1280) + b"\x00" * 10)
    data = b"\x01\x02" * 4410  # 8820 bytes = 2205 stereo 16-bit frames
    wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
           + b"data" + struct.pack("<I", len(data)) + data)
    rows = [
        (0, png), (1, gif), (2, bmp), (3, jpg), (4, jpg_prog), (5, wav),
        (6, b"not media at all"), (7, png[:12]), (8, b""),
    ]
    media = spark.createDataFrame(
        [(i, "image", "application/octet-stream", c, None, None, None)
         for i, c in rows],
        "media_id long, modality string, mime_type string, content binary, "
        "width long, height long, duration_ms long",
    )
    got = {r["media_id"]: r.asDict() for r in parse_media_headers(media).collect()}
    assert (got[0]["format"], got[0]["width"], got[0]["height"]) == ("png", 640, 480)
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("gif", 320, 200)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("bmp", 100, 50)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("jpeg", 1920, 1080)
    assert (got[4]["format"], got[4]["width"], got[4]["height"]) == ("jpeg", 1280, 720)
    assert got[5]["format"] == "wav"
    assert got[5]["sample_rate"] == 44100 and got[5]["channels"] == 2
    assert got[5]["duration_ms"] == 50  # 2205 frames / 44100 Hz
    for mid in (6, 7, 8):
        assert got[mid]["format"] == "unknown"
        assert got[mid]["width"] is None and got[mid]["sample_rate"] is None
