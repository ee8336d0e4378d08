"""Real BMP decode (r09 verdict item 4): the dependency-free
functions/bmp.py decoder behind the decode_media codec seam, and
phash_duplicates end-to-end on genuine image bytes via real_pixels.
The fake codec (and every oracled surface) is untouched — these
tests cover the REAL path the stub used to gate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.functions import bmp
from news_clustering_and_summarization_spark.operators import multimodal as MM
from news_clustering_and_summarization_spark.schemas import MEDIA_SCHEMA


def _img(seed: int, w: int = 48, h: int = 32) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).astype(
        np.uint8
    )


def test_bmp_roundtrip_exact():
    img = _img(1)
    assert np.array_equal(bmp.decode_bmp(bmp.encode_bmp(img)), img)


def test_bmp_rejects_garbage_precisely():
    with pytest.raises(ValueError, match="magic"):
        bmp.decode_bmp(b"\x89PNG" + b"\x00" * 60)
    with pytest.raises(ValueError, match="truncated"):
        bmp.decode_bmp(bmp.encode_bmp(_img(2))[:-10])
    with pytest.raises(ValueError, match="shorter"):
        bmp.decode_bmp(b"BM")


def test_bmp_top_down_rows():
    # negative height = top-down storage; decode must match the
    # bottom-up encode of the same image
    img = _img(3, w=8, h=8)
    payload = bytearray(bmp.encode_bmp(img))
    # flip height sign and re-order rows to top-down
    import struct

    h = struct.unpack_from("<i", payload, 22)[0]
    struct.pack_into("<i", payload, 22, -h)
    stride = (8 * 3 + 3) & ~3
    px_off = 54
    rows = [
        bytes(payload[px_off + i * stride: px_off + (i + 1) * stride])
        for i in range(8)
    ]
    payload[px_off:] = b"".join(reversed(rows))
    assert np.array_equal(bmp.decode_bmp(bytes(payload)), img)


def test_decode_media_real_bmp_through_mapinpandas(spark):
    img = _img(4, w=40, h=24)
    rows = [
        ("bmp-1", "d1", "image", "image/bmp", bmp.encode_bmp(img),
         None, None, None),
        # corrupt: BMP magic, unparseable body -> ok=False row
        ("bmp-bad", "d2", "image", "image/bmp",
         b"BM" + b"\x00" * 80, None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["asset_id"]: r for r in MM.decode_media(media).collect()}
    assert got["bmp-1"]["ok"] is True
    assert (got["bmp-1"]["width"], got["bmp-1"]["height"]) == (40, 24)
    assert got["bmp-1"]["n_frames"] == 1
    feat = got["bmp-1"]["feature"]
    assert len(feat) == MM.FEATURE_DIM
    assert abs(sum(feat) - 1.0) < 1e-6  # normalized histogram
    assert got["bmp-bad"]["ok"] is False
    assert got["bmp-bad"]["width"] is None


def test_decode_media_non_bmp_still_raises(spark):
    media = spark.createDataFrame(
        [("png-1", "d1", "image", "image/png", b"\x89PNG-fake",
          None, None, None)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as ei:
        MM.decode_media(media).collect()
    assert "NotImplementedError" in str(ei.value) or "codecs" in str(
        ei.value
    )


def test_phash_dedup_on_real_bytes(spark):
    # near-identical images (a few perturbed pixels) must pair; an
    # unrelated image must not
    base = _img(5, w=64, h=64)
    near = base.copy()
    near[0, 0] = [255, 255, 255]
    near[10, 10] = [0, 0, 0]
    other = _img(6, w=64, h=64)
    rows = [
        ("a", "d", "image", "image/bmp", bmp.encode_bmp(base),
         None, None, None),
        ("b", "d", "image", "image/bmp", bmp.encode_bmp(near),
         None, None, None),
        ("c", "d", "image", "image/bmp", bmp.encode_bmp(other),
         None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = MM.phash_duplicates(
        media, max_hamming=3, pixel_fn=MM.real_pixels
    ).collect()
    got = sorted((r["l_id"], r["r_id"]) for r in pairs)
    assert ("a", "b") in got
    assert all(p in {("a", "b")} for p in got), got


def test_real_pixels_grid_values_match_numpy(spark):
    # the Spark relation must equal the driver-side luma_grid values
    img = _img(7, w=32, h=32)
    media = spark.createDataFrame(
        [("x", "d", "image", "image/bmp", bmp.encode_bmp(img),
          None, None, None)],
        MEDIA_SCHEMA,
    )
    got = {
        r["cell"]: r["value"]
        for r in MM.real_pixels(media).collect()
    }
    grid = bmp.luma_grid(img)
    corners = {(0, 0), (0, 7), (7, 0), (7, 7)}
    want, c = {}, 0
    for i in range(8):
        for j in range(8):
            if (i, j) in corners:
                continue
            want[c] = int(grid[i, j])
            c += 1
    assert got == want
