"""Multimodal plumbing: schema, mapInPandas batch shape, stub gating,
deterministic fake decode, frame sampling, resize arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators import multimodal as MM
from news_clustering_and_summarization_spark.schemas import MEDIA_SCHEMA


@pytest.fixture()
def media(spark):
    rows = [
        ("img-1", "d1", "image", "image/png", b"\x89PNG-fake-1", None, None, None),
        ("img-2", "d2", "image", "image/png", b"\x89PNG-fake-2", None, None, None),
        ("vid-1", "d3", "video", "video/mp4", b"\x00mp4-fake", None, None, None),
        ("aud-1", "d4", "audio", "audio/wav", b"RIFF-fake", None, None, 1200),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stub_raises_without_fake(media):
    with pytest.raises(Exception) as ei:
        MM.decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "codecs unavailable" in str(
        ei.value
    )


def test_fake_decode_deterministic(media):
    a = {r["asset_id"]: r for r in MM.decode_media(media, fake=True).collect()}
    b = {r["asset_id"]: r for r in MM.decode_media(media, fake=True).collect()}
    assert a.keys() == b.keys() and len(a) == 4
    for k in a:
        assert a[k]["feature"] == b[k]["feature"]
        assert len(a[k]["feature"]) == MM.FEATURE_DIM
        assert a[k]["ok"] is True
    assert a["img-1"]["n_frames"] == 1
    assert a["vid-1"]["n_frames"] >= 1


def test_frame_sampling(media, spark):
    decoded = MM.decode_media(media, fake=True)
    frames = MM.sample_frames(decoded, every_nth=5).collect()
    per_asset = {}
    for r in frames:
        per_asset.setdefault(r["asset_id"], []).append(r["frame_index"])
    # only multi-frame assets appear; indices stride by 5 from 0
    assert "img-1" not in per_asset
    for idxs in per_asset.values():
        assert idxs == sorted(idxs)
        assert all(i % 5 == 0 for i in idxs)


def test_resize_plan_arithmetic(media):
    decoded = MM.decode_media(media, fake=True)
    plan = {r["asset_id"]: r for r in MM.resize_plan(decoded, 224, 224).collect()}
    dec = {r["asset_id"]: r for r in decoded.collect()}
    for k, p in plan.items():
        assert max(p["new_width"], p["new_height"]) <= 224
        # aspect ratio preserved within rounding
        ar_in = dec[k]["width"] / dec[k]["height"]
        ar_out = p["new_width"] / p["new_height"]
        assert abs(ar_in - ar_out) < 0.1
        assert p["pad_x"] >= 0 and p["pad_y"] >= 0


def test_media_stats(media):
    got = {r["media_type"]: r for r in MM.media_stats(media).collect()}
    assert got["image"]["n_assets"] == 2
    assert got["video"]["total_bytes"] == len(b"\x00mp4-fake")


def test_phash_planted_near_duplicates(spark):
    """aHash fingerprints pair an exact payload copy (hamming 0) and
    a lightly-perturbed copy (sub-threshold cell change), never the
    unrelated asset; l_id < r_id and the pigeonhole banding finds
    every pair an all-pairs scan would (verified by brute force)."""
    base = (
        b"the quick brown fox jumps over the lazy dog and keeps "
        b"running far beyond the old stone bridge by the river"
    )
    rows = [
        ("a1", base),
        ("a2", base),                       # exact duplicate
        ("a3", base + b" zz"),              # near duplicate
        ("b1", b"volcanic ash clouds ground flights across europe "
               b"as the eruption intensifies near the glacier"),
    ]
    df = spark.createDataFrame(rows, ["asset_id", "payload"])
    got = {
        (r["l_id"], r["r_id"]): r["hamming"]
        for r in MM.phash_duplicates(df, max_hamming=3).collect()
    }
    assert ("a1", "a2") in got and got[("a1", "a2")] == 0
    assert ("a1", "a3") in got and got[("a1", "a3")] <= 3
    assert not any("b1" in pair for pair in got)
    # banding == all-pairs at this threshold (pigeonhole)
    from news_clustering_and_summarization_spark.functions import hashing as H
    from pyspark.sql import functions as F

    fp = MM.ahash_fingerprints(MM.fake_pixels(df))
    a = fp.select(F.col("asset_id").alias("l_id"), F.col("phash").alias("l_fp"))
    b = fp.select(F.col("asset_id").alias("r_id"), F.col("phash").alias("r_fp"))
    brute = {
        (r["l_id"], r["r_id"]): r["hamming"]
        for r in a.join(b, F.col("l_id") < F.col("r_id"))
        .withColumn("hamming", H.hamming_distance(F.col("l_fp"), F.col("r_fp")))
        .where(F.col("hamming") <= 3)
        .collect()
    }
    assert got == brute
