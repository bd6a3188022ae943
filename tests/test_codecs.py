"""Real media decode kernels (operators/codecs.py): PNG/BMP/WAV round
trips, resize, features — and the full Spark mapInPandas path decoding
real payloads (upgrades the multimodal pipeline from fake-only)."""

from __future__ import annotations

import numpy as np
import pytest

from hurricanedb_spark.operators import codecs


def _grad(h, w, ch):
    rng = np.arange(h * w * ch, dtype=np.uint32)
    return ((rng * 7 + 13) % 256).astype(np.uint8).reshape(h, w, ch)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip(ch):
    img = _grad(13, 17, ch)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)


def test_png_filters_decode():
    """Filters 1-4 appear in real PNGs; exercise them by round-tripping
    through zlib with hand-built filtered scanlines."""
    import struct
    import zlib

    img = _grad(4, 4, 3)
    h, w, ch = img.shape
    stride = w * ch
    # build scanlines with filter 2 (Up): line - prev
    raws = []
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = img[y].reshape(-1)
        raws.append(b"\x02" + ((line.astype(np.int16) - prev) % 256).astype(np.uint8).tobytes())
        prev = line
    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(payload), img)


def test_bmp_roundtrip():
    img = _grad(9, 7, 3)  # odd width exercises row padding
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)


def test_wav_roundtrip():
    t = np.arange(800)
    samples = (np.sin(t / 10.0) * 20000).astype(np.int16).reshape(-1, 2)
    rate, nch, got = codecs.decode_wav(codecs.encode_wav(16000, samples))
    assert rate == 16000 and nch == 2
    assert np.array_equal(got, samples)


def test_resize_nearest():
    img = _grad(10, 10, 3)
    small = codecs.resize_nearest(img, 5, 5)
    assert small.shape == (5, 5, 3)
    assert np.array_equal(small[0, 0], img[0, 0])
    big = codecs.resize_nearest(img, 20, 20)
    assert big.shape == (20, 20, 3)
    assert np.array_equal(big[::2, ::2], img)


def test_unsupported_raises():
    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_png(b"\xff\xd8\xff\xe0JFIF-not-png")
    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_bmp(b"GIF89a")
    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_wav(b"ID3\x03mp3data")


def test_spark_pipeline_decodes_real_payloads(spark):
    """End-to-end: real PNG/BMP/WAV payloads through the Arrow-batched
    extract_features path, with the fallback engaging only for the
    codec-less payload."""
    from hurricanedb_spark.operators.multimodal import extract_features

    img = _grad(6, 8, 3)
    samples = (np.sin(np.arange(400) / 5.0) * 1000).astype(np.int16).reshape(-1, 1)
    rows = [
        (1, bytearray(codecs.encode_png(img)), "image", 8, 6),
        (2, bytearray(codecs.encode_bmp(img)), "image", 8, 6),
        (3, bytearray(codecs.encode_wav(8000, samples)), "audio", 0, 0),
        (4, bytearray(b"\xff\xd8\xff\xe0 jpeg-ish opaque bytes"), "image", 0, 0),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string, width int, height int"
    )
    out = {r.media_id: r for r in extract_features(df).collect()}
    assert out[1].decoder == "png" and out[2].decoder == "bmp"
    # identical pixels -> identical image features regardless of container
    assert out[1].feature == out[2].feature
    assert out[1].feature[0] == 8.0 and out[1].feature[1] == 6.0  # w, h
    assert out[3].decoder == "wav"
    assert out[3].feature[0] == 8000.0  # sample rate
    assert out[4].decoder == "byte-stats"


def test_jpeg_seam_without_pillow_degrades_honestly():
    """In a Pillow-less container a JPEG-magic payload must raise the
    typed UnsupportedMediaError from the seam and reach the byte-stat
    fallback with decoder='byte-stats' (not 'corrupt') in the dispatch."""
    import pytest

    from hurricanedb_spark.operators import codecs as cx
    from hurricanedb_spark.operators.multimodal import _decode_features

    fake_jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 64
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        pytest.skip("Pillow present: covered by the round-trip test")
    with pytest.raises(cx.UnsupportedMediaError):
        cx.decode_jpeg(fake_jpeg)
    name, feats = _decode_features(fake_jpeg)
    assert name == "byte-stats" and len(feats) == 8


def test_jpeg_seam_roundtrip_with_pillow():
    """Where Pillow exists: encode a golden gradient with Pillow, decode
    through our seam, and cross-check against Pillow's own pixels."""
    import io as _io

    import numpy as np
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image", reason="Pillow not installed")

    from hurricanedb_spark.operators import codecs as cx

    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[..., 0] = np.arange(8, dtype=np.uint8)[None, :] * 30
    img = PIL_Image.fromarray(rgb)
    buf = _io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    payload = buf.getvalue()
    got = cx.decode_jpeg(payload)
    ref = np.asarray(PIL_Image.open(_io.BytesIO(payload)).convert("RGB"))
    assert got.shape == (8, 8, 3) and np.array_equal(got, ref)
