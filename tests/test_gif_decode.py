"""GIF decode (functions/gif.py) and its multimodal wiring: LZW
round trips (including the 12-bit dictionary overflow + reset),
interlace, animation composition with transparency and disposal
methods, a HAND-COMPUTED LZW byte fixture (pins the bit order
independently of the encoder), the container's real-world GIFs from
a real encoder, and the seam e2e (animated GIF as video; frame
extraction into the image relation)."""

from __future__ import annotations

import glob
import os
import struct

import numpy as np
import pytest

from news_clustering_and_summarization_spark.functions import gif
from news_clustering_and_summarization_spark.operators import multimodal as MM
from news_clustering_and_summarization_spark.schemas import MEDIA_SCHEMA

_REAL_GIFS = sorted(
    glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif")
)


def _pal_img(seed: int, w: int = 30, h: int = 20, k: int = 5) -> np.ndarray:
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (k, 3), dtype=np.uint8)
    return pal[rng.randint(0, k, (h, w))]


# -- round trips -------------------------------------------------------

def test_roundtrip_exact():
    img = _pal_img(1)
    assert np.array_equal(gif.decode_gif(gif.encode_gif(img)), img)


def test_roundtrip_interlaced():
    img = _pal_img(2, w=17, h=13)  # odd dims: pass-boundary rows
    out = gif.decode_gif(gif.encode_gif(img, interlace=True))
    assert np.array_equal(out, img)


def test_roundtrip_dictionary_overflow():
    # 256-color noise at 128x128 overflows the 12-bit code space,
    # forcing the encoder's CLEAR+reset and the decoder's resync
    rng = np.random.RandomState(3)
    img = np.repeat(
        rng.randint(0, 256, (128, 128), dtype=np.uint8)[:, :, None],
        3, axis=2,
    )
    assert np.array_equal(gif.decode_gif(gif.encode_gif(img)), img)


def test_animation_composition_disposal_and_transparency():
    f1 = np.full((16, 16, 3), [10, 20, 30], dtype=np.uint8)
    f2 = f1.copy()
    f2[4:8, 4:8] = [200, 100, 50]
    m1 = np.zeros((16, 16), bool)
    m2 = np.ones((16, 16), bool)
    m2[4:8, 4:8] = False  # second frame draws only the square
    frames = gif.decode_gif_frames(
        gif.encode_gif([f1, f2], transparent_masks=[m1, m2])
    )
    assert len(frames) == 2
    assert np.array_equal(frames[0], f1)
    assert np.array_equal(frames[1], f2)  # square composed over f1
    # disposal 2 (restore to background) between frames: the square
    # must NOT persist into a transparent third frame
    f3_mask = np.ones((16, 16), bool)
    frames = gif.decode_gif_frames(
        gif.encode_gif(
            [f1, f2, f1],
            transparent_masks=[m1, m2, f3_mask],
            disposals=[1, 2, 1],
        )
    )
    sq = frames[2][4:8, 4:8]
    assert not np.array_equal(sq, f2[4:8, 4:8])


# -- the hand fixture (independent of the encoder) ---------------------

def test_lzw_hand_fixture():
    """2x2 image, palette {0: red, 1: green}, indices [0,1,1,0],
    min code size 2: clear=4, end=5, width starts at 3 bits.
    Stream: 4, 0, 1, 1 (3-bit; after the '1,1' appends the table
    reaches 8 entries -> width bumps to 4), then 0, 5 (4-bit).
    LSB-first packing, bit index = code order:
      bits0-2=100, 3-5=000, 6-8=100, 9-11=100, 12-15=0000,
      16-19=1010  ->  bytes 0x44, 0x02, 0x05."""
    pal = bytes([255, 0, 0, 0, 255, 0]) + bytes(6)  # 4-slot table
    lzw = bytes([0x44, 0x02, 0x05])
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)  # GCT, 4 entries
        + pal
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
        + bytes([2])  # LZW min code size
        + bytes([len(lzw)]) + lzw + b"\x00"
        + b"\x3b"
    )
    out = gif.decode_gif(payload)
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 255, 0], [255, 0, 0]]],
        dtype=np.uint8,
    )
    assert np.array_equal(out, expect)


# -- real-world files --------------------------------------------------

@pytest.mark.skipif(not _REAL_GIFS, reason="no system GIFs present")
def test_real_world_gifs_decode():
    decoded = 0
    for p in _REAL_GIFS[:12]:
        with open(p, "rb") as f:
            img = gif.decode_gif(f.read())
        h, w, c = img.shape
        assert c == 3 and h > 0 and w > 0
        # real images have real content: more than one distinct color
        assert len(np.unique(img.reshape(-1, 3), axis=0)) > 1
        decoded += 1
    assert decoded >= 5
    # spot-pin one known file's header-declared dimensions
    logo = os.path.join(
        os.path.dirname(_REAL_GIFS[0]), "Libxslt-Logo-180x168.gif"
    )
    if os.path.exists(logo):
        with open(logo, "rb") as f:
            img = gif.decode_gif(f.read())
        assert img.shape == (68, 180, 3)  # the FILE says 180x68


def test_rejects_malformed():
    with pytest.raises(ValueError, match="GIF"):
        gif.decode_gif(b"nope")
    good = gif.encode_gif(_pal_img(4))
    with pytest.raises(ValueError):
        gif.decode_gif(good[:20])
    bad = bytearray(good)
    bad[-10] ^= 0xFF  # corrupt LZW tail
    try:
        out = gif.decode_gif(bytes(bad))
        assert out.shape == (20, 30, 3)  # decoded despite the flip
    except ValueError:
        pass  # or rejected — either way, never a crash


# -- the multimodal seam -----------------------------------------------

def test_decode_media_gif_still_and_animated(spark):
    still = _pal_img(5, w=32, h=16)
    f1 = np.full((24, 24, 3), [5, 5, 5], dtype=np.uint8)
    f2 = f1.copy()
    f2[:12] = [250, 250, 250]
    rows = [
        ("g1", "d", "image", "image/gif", gif.encode_gif(still),
         None, None, None),
        ("g2", "d", "video", "image/gif", gif.encode_gif([f1, f2, f1]),
         None, None, None),
        ("g-bad", "d", "image", "image/gif", b"GIF89a" + b"\x01" * 8,
         None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["asset_id"]: r for r in MM.decode_media(media).collect()}
    assert got["g1"]["ok"] is True
    assert (got["g1"]["width"], got["g1"]["height"]) == (32, 16)
    assert got["g1"]["n_frames"] == 1
    assert got["g2"]["ok"] is True
    assert got["g2"]["n_frames"] == 3  # animated -> video semantics
    assert got["g-bad"]["ok"] is False


def test_extract_frames_from_animated_gif(spark):
    from news_clustering_and_summarization_spark.functions import bmp

    f1 = np.full((16, 16, 3), [0, 0, 0], dtype=np.uint8)
    f2 = np.full((16, 16, 3), [255, 255, 255], dtype=np.uint8)
    media = spark.createDataFrame(
        [("anim", "d", "video", "image/gif",
          gif.encode_gif([f1, f2, f1, f2]), None, None, None)],
        MEDIA_SCHEMA,
    )
    ext = {r["asset_id"]: r
           for r in MM.extract_frames(media, every_nth=1).collect()}
    assert sorted(ext) == ["anim#0", "anim#1", "anim#2", "anim#3"]
    # frames are standalone BMP images of the COMPOSED frame
    assert np.array_equal(bmp.decode_bmp(ext["anim#1"]["payload"]), f2)
    assert np.array_equal(bmp.decode_bmp(ext["anim#0"]["payload"]), f1)
