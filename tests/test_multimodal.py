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
