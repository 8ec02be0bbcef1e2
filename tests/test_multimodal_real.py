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


# -- round-7: BMP + GIF pure-python decode ----------------------------


def make_bmp(pixels: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal BI_RGB BMP writer (24/32 bpp) for decoder ground truth."""
    h, w, c = pixels.shape
    assert c in (3, 4)
    bgr = pixels[:, :, [2, 1, 0]] if c == 3 else pixels[:, :, [2, 1, 0, 3]]
    rows = bgr if top_down else bgr[::-1]
    stride = (w * c + 3) & ~3
    body = bytearray()
    for y in range(h):
        line = rows[y].tobytes()
        body += line + b"\x00" * (stride - len(line))
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, c * 8, 0,
        len(body), 2835, 2835, 0, 0,
    )
    hdr = struct.pack("<2sIHHI", b"BM", 14 + len(dib) + len(body), 0, 0,
                      14 + len(dib))
    return hdr + dib + bytes(body)


def make_bmp_8bit(indexes: np.ndarray, palette: np.ndarray) -> bytes:
    """8-bit palettized BMP writer (bottom-up)."""
    h, w = indexes.shape
    n = len(palette)
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([b, g, r, 0])
    stride = (w + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        line = indexes[y].astype(np.uint8).tobytes()
        body += line + b"\x00" * (stride - len(line))
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 2835, 2835, n, n
    )
    hdr = struct.pack(
        "<2sIHHI", b"BM", 14 + len(dib) + len(pal) + len(body), 0, 0,
        14 + len(dib) + len(pal),
    )
    return hdr + dib + bytes(pal) + bytes(body)


def make_gif(indexes: np.ndarray, palette: np.ndarray) -> bytes:
    """Minimal GIF89a writer using the classic 'uncompressed' LZW
    trick: emit a CLEAR code before every literal so the code width
    never grows — trivially valid LZW, exercising the decoder's
    clear/reset handling heavily."""
    h, w = indexes.shape
    n = len(palette)
    bits = max(2, (n - 1).bit_length())
    pal_n = 1 << bits
    min_code = bits
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    # bitstream: CLEAR, (CLEAR, literal)*, END
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for v in indexes.reshape(-1):
        emit(int(v))
        emit(clear)
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    # sub-blocks
    data = bytearray()
    for i in range(0, len(out), 255):
        blk = out[i : i + 255]
        data += bytes([len(blk)]) + blk
    data += b"\x00"
    pal_bytes = bytearray()
    for r, g, b in palette:
        pal_bytes += bytes([r, g, b])
    pal_bytes += b"\x00" * (3 * (pal_n - n))
    screen = struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    return (
        b"GIF89a" + screen + bytes(pal_bytes) + img
        + bytes([min_code]) + bytes(data) + b"\x3b"
    )


def test_bmp_24_and_32_roundtrip_both_orientations():
    px3 = _rng(11).integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    px4 = _rng(12).integers(0, 256, size=(6, 3, 4), dtype=np.uint8)
    assert np.array_equal(M._decode_bmp(make_bmp(px3)), px3)
    assert np.array_equal(M._decode_bmp(make_bmp(px3, top_down=True)), px3)
    assert np.array_equal(M._decode_bmp(make_bmp(px4)), px4)


def test_bmp_8bit_palette():
    pal = _rng(13).integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = _rng(14).integers(0, 16, size=(9, 5), dtype=np.uint8)
    out = M._decode_bmp(make_bmp_8bit(idx, pal))
    assert np.array_equal(out, pal[idx])


def test_bmp_rejects_compressed_and_garbage():
    with pytest.raises(ValueError):
        M._decode_bmp(b"not a bmp")
    px = _rng(15).integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    blob = bytearray(make_bmp(px))
    blob[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(NotImplementedError):
        M._decode_bmp(bytes(blob))


def test_gif_roundtrip_with_lzw_clear_codes():
    pal = _rng(16).integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = _rng(17).integers(0, 8, size=(11, 13), dtype=np.uint8)
    out = M._decode_gif(make_gif(idx, pal))
    assert out.shape == (11, 13, 3)
    assert np.array_equal(out, pal[idx])


def test_gif_growing_code_table():
    """A real LZW stream (not the all-clear trick): encode with a
    growing dictionary to exercise code-width increases and the
    prefix+first-symbol construction."""
    pal = np.array([[0, 0, 0], [255, 255, 255], [10, 20, 30], [7, 8, 9]],
                   dtype=np.uint8)
    idx = np.tile(np.array([[0, 1, 2, 3]], dtype=np.uint8), (16, 16))[:, :16]
    # encoder: textbook GIF LZW
    min_code = 2
    clear, end = 4, 5
    table = {bytes([i]): i for i in range(4)}
    next_code, width = 6, 3
    codes = [clear]
    prev = b""
    for v in idx.reshape(-1):
        cur = prev + bytes([int(v)])
        if cur in table:
            prev = cur
        else:
            codes.append(table[prev])
            table[cur] = next_code
            next_code += 1
            prev = bytes([int(v)])
    if prev:
        codes.append(table[prev])
    codes.append(end)
    acc = nbits = 0
    out = bytearray()
    width = 3
    emitted_since_clear = 0
    # re-walk emitting with the width schedule the decoder uses
    table_size = 6
    body = bytearray()
    for code in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if code == clear:
            table_size, width = 6, 3
        elif code != end and emitted_since_clear >= 0:
            # decoder adds one entry per code after the first
            if emitted_since_clear > 0 and table_size < 4096:
                table_size += 1
                if table_size >= (1 << width) and width < 12:
                    width += 1
            emitted_since_clear += 1
    if nbits:
        body.append(acc & 0xFF)
    data = bytearray()
    for i in range(0, len(body), 255):
        blk = body[i : i + 255]
        data += bytes([len(blk)]) + blk
    data += b"\x00"
    pal_bytes = b"".join(bytes(list(p)) for p in pal)
    screen = struct.pack("<HHBBB", 16, 16, 0x80 | 1, 0, 0)
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, 16, 16, 0)
    gif = (b"GIF89a" + screen + pal_bytes + img
           + bytes([min_code]) + bytes(data) + b"\x3b")
    out_px = M._decode_gif(gif)
    assert np.array_equal(out_px, pal[idx])


def test_decode_media_dispatch_bmp_gif():
    px = _rng(18).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    assert np.array_equal(M.decode_media(make_bmp(px), "image/bmp"), px)
    pal = _rng(19).integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = _rng(20).integers(0, 4, size=(5, 6), dtype=np.uint8)
    assert np.array_equal(
        M.decode_media(make_gif(idx, pal), "image/gif"), pal[idx]
    )
