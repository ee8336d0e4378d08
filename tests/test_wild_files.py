"""The engine meets files it did not produce: every real image this
container ships (nodejs' progressive JPEGs, libxslt's GIFs — all
emitted by real-world encoders years before this repo existed) runs
through the FULL media pipeline: binaryFile ingestion, magic-based
decode, feature extraction, phash fingerprinting, and the resize
kernel. No round-trip self-consistency here — if the decoders
humored their own encoders' dialect, these files would break them."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pytest

from news_clustering_and_summarization_spark.functions import bmp
from news_clustering_and_summarization_spark.operators import multimodal as MM
from news_clustering_and_summarization_spark.sources import media_ingest as MI

_WILD = sorted(
    glob.glob("/usr/share/doc/nodejs/*.jpg")
    + glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif")
)


@pytest.mark.skipif(len(_WILD) < 5, reason="system sample files absent")
def test_wild_corpus_end_to_end(spark, tmp_path):
    landing = str(tmp_path / "wild")
    os.makedirs(landing)
    for p in _WILD:
        shutil.copy(p, landing)
    media = MI.read_media(spark, landing, glob="*.{jpg,gif}")
    n_files = len(_WILD)
    assert media.count() == n_files

    # 1. every single wild file decodes ok through the real path
    dec = {r["asset_id"]: r for r in MM.decode_media(media).collect()}
    assert len(dec) == n_files
    assert all(r["ok"] for r in dec.values()), [
        a for a, r in dec.items() if not r["ok"]
    ]
    # dimensions come from the files' own headers
    assert (dec["thin-white-stripe.jpg"]["width"],
            dec["thin-white-stripe.jpg"]["height"]) == (493, 58)
    assert (dec["Libxslt-Logo-180x168.gif"]["width"],
            dec["Libxslt-Logo-180x168.gif"]["height"]) == (180, 68)

    # 2. phash over the wild corpus: the two logo variants
    #    (180x68 and 90x34 downscale of the same artwork) and the two
    #    stripe banners are the plausible near-dup pairs; unrelated
    #    diagram GIFs must never pair with the photos
    pairs = MM.phash_duplicates(
        media.select("asset_id", "payload"),
        max_hamming=3,
        pixel_fn=MM.real_pixels,
    ).collect()
    for r in pairs:
        l, rr = r["l_id"], r["r_id"]
        # any surviving pair must be within one family of files
        fam = lambda s: ("logo" if "Logo" in s  # noqa: E731
                         else "stripe" if "stripe" in s else s)
        assert fam(l) == fam(rr), (l, rr)

    # 3. resize every wild file to a training-shard shape
    resized = MM.resize_images(media, 64, 64).collect()
    assert len(resized) == n_files
    for r in resized:
        canvas = bmp.decode_bmp(r["payload"])
        assert canvas.shape == (64, 64, 3)
        # content must actually land on the canvas (not all pad)
        assert canvas.max() > 0
        assert (r["content_width"] == 64) or (r["content_height"] == 64)

    # 4. the wild GIF logos have real multi-color content end to end
    lum = np.array(dec["Libxslt-Logo-180x168.gif"]["feature"])
    assert lum.sum() == pytest.approx(1.0, abs=1e-5)
    assert (lum > 0).sum() >= 2  # more than one luma bin occupied
