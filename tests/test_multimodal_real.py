"""Round-5 real-codec tests (VERDICT r4 #4): PNG pixel decode (pure
zlib + filter reconstruction), PCM-WAV sample decode (stdlib wave),
end-to-end agreement with the real header parser, and the PIL /
soundfile optional-import fast paths (skipif-gated)."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from hybrid_cdc_demo_spark.operators import multimodal as M


def _rng(seed=7):
    return np.random.default_rng(seed)


def make_png(pixels: np.ndarray) -> bytes:
    return M._encode_png(pixels)


def make_png_with_filters(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Encode (h, w, c) uint8 applying the given per-row filter types —
    exercises the decoder's Sub/Up/Average/Paeth reconstruction against
    ground-truth pixels."""
    h, w, c = pixels.shape
    bpp = c
    lines = []
    prior = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        raw = pixels[y].reshape(-1)
        f = filters[y % len(filters)]
        filt = np.zeros_like(raw)
        for x in range(len(raw)):
            a = int(raw[x - bpp]) if x >= bpp else 0
            b = int(prior[x])
            cc = int(prior[x - bpp]) if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:  # paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (int(raw[x]) - pred) & 0xFF
        lines.append(bytes([f]) + filt.tobytes())
        prior = raw
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    return (
        M._PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


def make_wav(samples: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(channels)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# -- codec unit tests -------------------------------------------------


def test_png_roundtrip_rgb():
    px = _rng().integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    out = M._decode_png(make_png(px))
    assert out.shape == (9, 7, 3)
    assert np.array_equal(out, px)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_all_filters_reconstruct(channels):
    px = _rng(channels).integers(0, 256, size=(8, 5, channels), dtype=np.uint8)
    data = make_png_with_filters(px, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(M._decode_png(data), px)


def test_png_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        M._decode_png(b"not a png at all")
    px = _rng().integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    good = make_png(px)
    # 16-bit depth refused by the pure path with a clear message
    bad_ihdr = bytearray(good)
    bad_ihdr[24] = 16  # bit depth byte inside IHDR
    with pytest.raises((NotImplementedError, ValueError, zlib.error)):
        M._decode_png(bytes(bad_ihdr))


def test_wav_roundtrip_int16_stereo():
    s = _rng().integers(-32768, 32767, size=(50, 2), dtype=np.int16)
    out = M._decode_wav(make_wav(s.reshape(-1), channels=2))
    assert out.dtype == np.int16
    assert np.array_equal(out, s.reshape(-1, 2))


def test_decode_media_dispatch():
    px = _rng().integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    assert M.decode_media(make_png(px), "image/png").shape == (4, 6, 3)
    s = np.arange(-10, 10, dtype=np.int16)
    assert M.decode_media(make_wav(s), "audio/wav").shape == (20, 1)
    with pytest.raises(NotImplementedError):
        M.decode_media(b"\x00\x01\x02", "video/mp4")
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(NotImplementedError):
            M.decode_media(b"\xff\xd8\xff\xe0jpegish", "image/jpeg")


def test_pil_agrees_with_pure_decoder():
    pytest.importorskip("PIL")
    from PIL import Image

    px = _rng().integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
    data = make_png(px)
    assert np.array_equal(
        np.asarray(Image.open(io.BytesIO(data))), M._decode_png(data)
    )


# -- e2e over the Spark plumbing --------------------------------------


def _media_df(spark, rows):
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_real_feature_extraction_matches_numpy_and_headers(spark):
    px = _rng().integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    data = make_png(px)
    media = _media_df(
        spark, [(1, "image", "image/png", bytearray(data), None, None, None)]
    )
    feats = M.extract_features(media, fake=False, bins=16).collect()
    assert len(feats) == 1
    hist, _ = np.histogram(
        px.astype(np.float64).ravel(), bins=16, range=(0.0, 256.0)
    )
    expected = (hist / px.size).round(6).tolist()
    assert feats[0]["features"] == pytest.approx(expected)
    assert feats[0]["n_bytes"] == len(data)
    # the REAL header parser and the REAL pixel decoder agree
    hdr = M.parse_media_headers(media).collect()[0]
    assert (hdr["format"], hdr["width"], hdr["height"]) == ("png", 16, 16)
    assert M.decode_media(data, "image/png").shape[:2] == (16, 16)


def test_real_resize_nearest_neighbor(spark):
    px = _rng().integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    media = _media_df(
        spark,
        [(5, "image", "image/png", bytearray(make_png(px)), None, None, None)],
    )
    out = M.resize_media(media, width=4, height=4, fake=False).collect()[0]
    assert (out["width"], out["height"], out["mime_type"]) == (4, 4, "image/png")
    decoded = M._decode_png(bytes(out["content"]))
    ys = np.linspace(0, 7, 4).astype(int)
    xs = np.linspace(0, 7, 4).astype(int)
    assert np.array_equal(decoded, px[np.ix_(ys, xs)])


def test_real_audio_stats_from_wav(spark):
    s = _rng().integers(-2000, 2000, size=120, dtype=np.int16)
    media = _media_df(
        spark,
        [(9, "audio", "audio/wav", bytearray(make_wav(s)), None, None, 15)],
    )
    row = M.audio_stats(media, fake=False).collect()[0]
    assert row["n_samples"] == 120
    assert row["mean_level"] == pytest.approx(float(s.astype(float).mean()))
    assert row["rms"] == pytest.approx(
        float(np.sqrt((s.astype(float) ** 2).mean()))
    )


def test_fake_paths_unchanged(spark):
    """The deterministic stand-ins still work byte-for-byte (plumbing
    tests elsewhere rely on them)."""
    media = _media_df(
        spark, [(2, "image", "image/fake", bytearray(b"abcdef"), None, None, None)]
    )
    row = M.extract_features(media, fake=True, bins=4).collect()[0]
    assert row["features"] == pytest.approx(
        M._fake_features(b"abcdef", 4)
    )
