"""Baseline PNG decode (functions/png.py, r10 verdict item 5) and
its wiring through the multimodal seam: every unfilter branch
forced via the encoder, all supported color types, corrupt-asset
quarantine, and the phash-dedup e2e on genuine compressed bytes."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

from news_clustering_and_summarization_spark.functions import bmp, png
from news_clustering_and_summarization_spark.operators import multimodal as MM
from news_clustering_and_summarization_spark.schemas import MEDIA_SCHEMA


def _img(seed: int, w: int = 32, h: int = 24, ch: int = 3) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)


def test_png_roundtrip_exact_rgb():
    img = _img(1)
    assert np.array_equal(png.decode_png(png.encode_png(img)), img)


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_png_every_filter_branch_roundtrips(f):
    img = _img(2, w=17, h=9)  # odd width: exercises lane edges
    out = png.decode_png(png.encode_png(img, row_filter=f))
    assert np.array_equal(out, img), f"filter {f}"


def test_png_mixed_filters_roundtrip():
    img = _img(3, w=21, h=10)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    out = png.decode_png(png.encode_png(img, row_filter=filters))
    assert np.array_equal(out, img)


def test_png_gray_and_rgba_color_types():
    gray = _img(4, ch=1)[:, :, 0]
    out = png.decode_png(png.encode_png(gray, row_filter=4))
    assert np.array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))
    rgba = _img(5, ch=4)
    out = png.decode_png(png.encode_png(rgba, row_filter=3))
    assert np.array_equal(out, rgba[:, :, :3])  # alpha dropped


def test_png_palette_color_type():
    # hand-build a color-type-3 PNG: 2x2 image over a 3-entry palette
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx_rows = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])
    payload = (
        png.SIGNATURE
        + png._chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + png._chunk(b"PLTE", pal)
        + png._chunk(b"IDAT", zlib.compress(idx_rows))
        + png._chunk(b"IEND", b"")
    )
    out = png.decode_png(payload)
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]],
        dtype=np.uint8,
    )
    assert np.array_equal(out, want)
    # palette index beyond PLTE -> precise rejection
    bad = (
        png.SIGNATURE
        + png._chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
        + png._chunk(b"PLTE", pal)
        + png._chunk(b"IDAT", zlib.compress(b"\x00\x09"))
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index"):
        png.decode_png(bad)


def test_png_rejects_garbage_precisely():
    with pytest.raises(ValueError, match="signature"):
        png.decode_png(b"\x89PNG-fake")
    ok = png.encode_png(_img(6))
    with pytest.raises(ValueError, match="truncated"):
        png.decode_png(ok[:40])
    # flip a byte inside IDAT: surfaces via zlib or size mismatch
    broken = bytearray(ok)
    idat_at = ok.index(b"IDAT") + 10
    broken[idat_at] ^= 0xFF
    with pytest.raises(ValueError):
        png.decode_png(bytes(broken))
    # interlaced header -> explicit unsupported
    interlaced = (
        png.SIGNATURE
        + png._chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + png._chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlace"):
        png.decode_png(interlaced)
    # 16-bit depth -> explicit unsupported
    deep = (
        png.SIGNATURE
        + png._chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + png._chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        png.decode_png(deep)


def test_decode_media_real_png_through_mapinpandas(spark):
    img = _img(7, w=40, h=24)
    rows = [
        ("png-1", "d1", "image", "image/png",
         png.encode_png(img, row_filter=4), None, None, None),
        # corrupt: PNG signature, unparseable body -> ok=False row
        ("png-bad", "d2", "image", "image/png",
         png.SIGNATURE + b"\x00" * 40, None, None, None),
        # BMP still decodes through the same dispatch
        ("bmp-1", "d3", "image", "image/bmp",
         bmp.encode_bmp(img), None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["asset_id"]: r for r in MM.decode_media(media).collect()}
    assert got["png-1"]["ok"] is True
    assert (got["png-1"]["width"], got["png-1"]["height"]) == (40, 24)
    feat = got["png-1"]["feature"]
    assert len(feat) == MM.FEATURE_DIM
    assert abs(sum(feat) - 1.0) < 1e-6
    assert got["png-bad"]["ok"] is False
    # PNG and BMP encodings of the SAME pixels give the SAME feature
    assert got["png-1"]["feature"] == got["bmp-1"]["feature"]


def test_phash_dedup_on_real_png_bytes(spark):
    base = _img(8, w=64, h=64)
    near = base.copy()
    near[0, 0] = [255, 255, 255]
    near[10, 10] = [0, 0, 0]
    other = _img(9, w=64, h=64)
    rows = [
        # near-dup pair split ACROSS formats: phash must see through
        # the container encoding
        ("a", "d", "image", "image/png",
         png.encode_png(base, row_filter=4), None, None, None),
        ("b", "d", "image", "image/bmp",
         bmp.encode_bmp(near), None, None, None),
        ("c", "d", "image", "image/png",
         png.encode_png(other), None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = MM.phash_duplicates(
        media, max_hamming=3, pixel_fn=MM.real_pixels
    ).collect()
    got = sorted((r["l_id"], r["r_id"]) for r in pairs)
    assert ("a", "b") in got
    assert all(p in {("a", "b")} for p in got), got
