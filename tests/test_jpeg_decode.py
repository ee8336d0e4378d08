"""JPEG decode (functions/jpeg.py — r10 verdict "What's missing"
#1) and its wiring through the multimodal seam.

Two independent evidence axes, so the codec is not graded against
its own mirror image:
- analytic: zigzag involution + spec prefix, orthonormal DCT basis
  vs the closed-form cosine sum, EXTEND spec cases, exact DC for
  solid blocks;
- real-encoder: the container ships two PROGRESSIVE JPEGs emitted
  by a real encoder (/usr/share/doc/nodejs/*.jpg, SOF2 with
  successive approximation) — decoding them exercises the
  progressive entropy layer (DC first/refine, AC first/refine,
  EOB runs) against bytes this repo did not produce, and the
  content assertions (dimensions from SOF, near-white stripe with
  a dark header band) pin real structure, not just "didn't crash".

Round trips through ``encode_jpeg`` (baseline, 4:4:4/4:2:0, restart
intervals) then pin the shared finishing stage (dequant, un-zigzag,
IDCT, upsample, YCbCr) that both entropy layers feed.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from news_clustering_and_summarization_spark.functions import bmp, jpeg
from news_clustering_and_summarization_spark.operators import multimodal as MM
from news_clustering_and_summarization_spark.schemas import MEDIA_SCHEMA

_NODEJS_JPGS = [
    "/usr/share/doc/nodejs/thin-white-stripe.jpg",
    "/usr/share/doc/nodejs/full-white-stripe.jpg",
]


def _img(seed: int, w: int = 48, h: int = 32) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _smooth(w: int = 96, h: int = 64) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    g = (128 + 100 * np.sin(x / 20) * np.cos(y / 15)).clip(0, 255)
    return np.repeat(g[:, :, None], 3, axis=2).astype(np.uint8)


# -- analytic invariants (spec-side, not round-trip) -------------------

def test_zigzag_is_the_spec_order():
    zz = jpeg.ZZ
    assert sorted(zz.tolist()) == list(range(64))
    # T.81 figure 5 first/last entries
    assert zz[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert zz[-4:].tolist() == [47, 55, 62, 63]


def test_dct_basis_orthonormal_and_closed_form():
    C = jpeg._C
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-12)
    # closed form: C[u,x] = 1/2 alpha(u) cos((2x+1)u pi/16)
    assert np.isclose(C[0, 0], 1 / (2 * np.sqrt(2)))
    assert np.isclose(C[3, 5], 0.5 * np.cos(11 * 3 * np.pi / 16))


def test_extend_matches_spec_table():
    # T.81 F.12: receive s bits -> signed value
    assert jpeg._extend(0, 0) == 0
    assert jpeg._extend(1, 1) == 1
    assert jpeg._extend(0, 1) == -1
    assert jpeg._extend(0b011, 3) == -4
    assert jpeg._extend(0b111, 3) == 7
    assert jpeg._extend(0b100, 3) == 4


def test_huffman_table_rejects_non_prefix_counts():
    with pytest.raises(ValueError, match="prefix|DHT"):
        jpeg._HuffTable([3] + [0] * 15, bytes(3))  # 3 codes of len 1


# -- round trips (encoder-as-inverse) ----------------------------------

@pytest.mark.parametrize("sub", ["444", "420"])
def test_solid_color_roundtrip_exact(sub):
    img = np.full((24, 40, 3), [120, 64, 200], dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, subsample=sub))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() == 0


@pytest.mark.parametrize("sub", ["444", "420"])
def test_smooth_image_high_quality_tight(sub):
    img = _smooth()
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95, subsample=sub))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 1.5


def test_odd_dimensions_pad_and_crop():
    # 17x9 with 4:2:0 forces MCU padding on both axes + chroma crop
    img = _img(3, w=17, h=9)
    for sub in ("444", "420"):
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90, subsample=sub))
        assert out.shape == (9, 17, 3)


def test_grayscale_roundtrip_replicates_channels():
    g = _smooth()[:, :, 0]
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=92))
    assert out.shape == (*g.shape, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 6


def test_restart_intervals_decode_identically():
    img = _img(7, w=72, h=56)
    plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85))
    withrst = jpeg.encode_jpeg(img, quality=85, restart_interval=3)
    assert b"\xff\xdd" in withrst and b"\xff\xd0" in withrst
    assert np.array_equal(jpeg.decode_jpeg(withrst), plain)


def test_noise_image_quality_ladder():
    # pure noise is JPEG's worst case; error must still be bounded
    # and shrink as quality rises
    img = _img(11, w=64, h=64)
    errs = []
    for q in (50, 75, 95):
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q))
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    assert errs[0] > errs[2]
    assert errs[2] < 20


# -- real-encoder progressive files ------------------------------------

@pytest.mark.skipif(
    not all(os.path.exists(p) for p in _NODEJS_JPGS),
    reason="container's sample JPEGs not present",
)
def test_progressive_real_files_decode_with_real_structure():
    with open(_NODEJS_JPGS[0], "rb") as f:
        thin = jpeg.decode_jpeg(f.read())
    assert thin.shape == (58, 493, 3)  # SOF2 header: 493x58
    lum = thin.mean(axis=2)
    # named "white-stripe": mostly near-white...
    assert (thin.min(axis=2) > 200).mean() > 0.8
    # ...with a DARK header band across the top (real content, not
    # uniform noise): top rows far darker than the middle
    assert lum[:4].mean() < lum[20:40].mean() - 100
    with open(_NODEJS_JPGS[1], "rb") as f:
        full = jpeg.decode_jpeg(f.read())
    assert full.shape == (312, 493, 3)
    assert (full.min(axis=2) > 200).mean() > 0.9


# -- error paths -------------------------------------------------------

def test_rejects_garbage_precisely():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"not a jpeg")
    # valid SOI then noise -> ValueError (quarantine), never a crash
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(jpeg.SOI + b"\x00\x01\x02\x03")
    good = jpeg.encode_jpeg(_img(1), quality=80)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(good[:40])  # truncated mid-header
    # flip a header byte inside the SOF segment -> parse error
    bad = bytearray(good)
    sof = bad.find(b"\xff\xc0")
    bad[sof + 9] = 99  # component count byte -> nonsense
    with pytest.raises((ValueError, NotImplementedError)):
        jpeg.decode_jpeg(bytes(bad))


def test_unsupported_variants_raise_not_implemented():
    good = bytearray(jpeg.encode_jpeg(_img(2), quality=80))
    sof = good.find(b"\xff\xc0")
    good[sof + 1] = 0xC3  # lossless sequential
    with pytest.raises(NotImplementedError, match="SOF"):
        jpeg.decode_jpeg(bytes(good))
    good[sof + 1] = 0xC9  # arithmetic coding
    with pytest.raises(NotImplementedError, match="SOF"):
        jpeg.decode_jpeg(bytes(good))
    good[sof + 1] = 0xC0
    good[sof + 4] = 12  # 12-bit precision
    with pytest.raises(NotImplementedError, match="12-bit"):
        jpeg.decode_jpeg(bytes(good))


# -- the multimodal seam -----------------------------------------------

def _blocks(w: int = 64, h: int = 64) -> np.ndarray:
    """High-contrast 16x16 block checkerboard: block MEANS survive
    lossy compression almost exactly, so the aHash grid is stable
    across the JPEG round trip."""
    y, x = np.mgrid[0:h, 0:w]
    cells = ((x // 16 + y // 16) % 2) * 215 + 20
    return np.repeat(cells[:, :, None], 3, axis=2).astype(np.uint8)


def test_decode_media_real_jpeg_through_mapinpandas(spark):
    img = _blocks()
    rows = [
        ("jpg-1", "d1", "image", "image/jpeg",
         jpeg.encode_jpeg(img, quality=95), None, None, None),
        ("jpg-bad", "d2", "image", "image/jpeg",
         jpeg.SOI + b"\x00" * 40, None, None, None),
        ("bmp-1", "d3", "image", "image/bmp",
         bmp.encode_bmp(img), None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["asset_id"]: r for r in MM.decode_media(media).collect()}
    assert got["jpg-1"]["ok"] is True
    assert (got["jpg-1"]["width"], got["jpg-1"]["height"]) == (64, 64)
    assert len(got["jpg-1"]["feature"]) == MM.FEATURE_DIM
    assert got["jpg-bad"]["ok"] is False
    # lossy but block-mean-preserving: JPEG and BMP features of the
    # same pixels agree to within the 8x8-mean quantization
    fj = np.array(got["jpg-1"]["feature"])
    fb = np.array(got["bmp-1"]["feature"])
    assert np.abs(fj - fb).max() < 0.01


def test_phash_dedup_pairs_jpeg_with_bmp_original(spark):
    base = _blocks()
    other = 255 - base  # inverted: every aHash bit flips
    rows = [
        ("a", "d", "image", "image/bmp",
         bmp.encode_bmp(base), None, None, None),
        ("b", "d", "image", "image/jpeg",
         jpeg.encode_jpeg(base, quality=90, subsample="420"),
         None, None, None),
        ("c", "d", "image", "image/jpeg",
         jpeg.encode_jpeg(other, quality=90), None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = MM.phash_duplicates(
        media, max_hamming=3, pixel_fn=MM.real_pixels
    ).collect()
    got = sorted((r["l_id"], r["r_id"]) for r in pairs)
    assert ("a", "b") in got
    assert all(p in {("a", "b")} for p in got), got
