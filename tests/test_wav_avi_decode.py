"""Real-bytes audio (functions/wav.py) and video (functions/avi.py)
behind the multimodal seam: WAV round trips across every sample
width plus hand-built byte fixtures (so the fixed-point scaling is
pinned against the spec, not the encoder), MJPEG-AVI container round
trips with real JPEG frames, and the frame-level phash e2e that
pairs two videos sharing frames."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from news_clustering_and_summarization_spark.functions import avi, jpeg, wav
from news_clustering_and_summarization_spark.operators import multimodal as MM
from news_clustering_and_summarization_spark.schemas import MEDIA_SCHEMA


def _tone(n: int = 4096, ch: int = 2) -> np.ndarray:
    t = np.arange(n) / 8000.0
    left = 0.5 * np.sin(2 * np.pi * 440 * t)
    out = np.stack([left] * ch, axis=1)
    if ch > 1:
        out[:, 1] = 0.25 * np.sin(2 * np.pi * 880 * t)
    return out


# -- WAV ---------------------------------------------------------------

@pytest.mark.parametrize("bits,tol", [
    (8, 1 / 120.0), (16, 1 / 3e4), (24, 1 / 7e6), (32, 1e-7),
    (-32, 1e-7),
])
def test_wav_roundtrip_every_width(bits, tol):
    x = _tone()
    out, rate = wav.decode_wav(wav.encode_wav(x, 8000, bits=bits))
    assert rate == 8000
    assert out.shape == x.shape and out.dtype == np.float32
    assert np.abs(out - x).max() < tol


def test_wav_mono_1d_input():
    x = _tone(ch=1)[:, 0]
    out, _ = wav.decode_wav(wav.encode_wav(x, 16000, bits=16))
    assert out.shape == (len(x), 1)


def test_wav_fixed_point_scaling_hand_fixture():
    # hand-build PCM16 stereo: samples (0, 16384), (-32768, 32767)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    data = struct.pack("<4h", 0, 16384, -32768, 32767)
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    out, rate = wav.decode_wav(payload)
    assert rate == 8000
    expect = np.array([[0.0, 0.5], [-1.0, 32767 / 32768]], dtype=np.float32)
    assert np.allclose(out, expect, atol=1e-7)


def test_wav_unknown_chunks_skipped_and_odd_padding():
    x = _tone(999, ch=1)  # odd byte counts exercise RIFF padding
    enc = bytearray(wav.encode_wav(x, 8000, bits=8))
    # splice an unknown chunk between header and fmt
    extra = b"JUNK" + struct.pack("<I", 3) + b"abc\x00"
    enc[12:12] = extra
    enc[4:8] = struct.pack("<I", struct.unpack("<I", enc[4:8])[0]
                           + len(extra))
    out, _ = wav.decode_wav(bytes(enc))
    assert out.shape == (999, 1)


def test_wav_rejects_malformed_and_unsupported():
    with pytest.raises(ValueError, match="RIFF"):
        wav.decode_wav(b"nope")
    with pytest.raises(ValueError, match="WAVE"):
        wav.decode_wav(b"RIFF\x04\x00\x00\x00AVI ")
    good = wav.encode_wav(_tone(64, 1), 8000)
    with pytest.raises(ValueError, match="truncated"):
        wav.decode_wav(good[:30])
    # format tag 2 (ADPCM) -> explicit NotImplementedError
    bad = bytearray(good)
    bad[20] = 2
    with pytest.raises(NotImplementedError, match="compressed"):
        wav.decode_wav(bytes(bad))


# -- AVI ---------------------------------------------------------------

def _frames(k: int = 6, w: int = 48, h: int = 32) -> list[bytes]:
    out = []
    for i in range(k):
        img = np.full((h, w, 3), [40 * i % 256, 255 - 30 * i, 80],
                      dtype=np.uint8)
        img[: h // 2] //= 2  # structure, so luma grids differ
        out.append(jpeg.encode_jpeg(img, quality=90))
    return out


def test_avi_roundtrip_preserves_frames_and_meta():
    frames = _frames()
    payload = avi.encode_avi(frames, 48, 32, fps=5)
    meta, got = avi.parse_avi(payload)
    assert meta["width"] == 48 and meta["height"] == 32
    assert meta["total_frames"] == 6
    assert meta["us_per_frame"] == 200_000
    assert got == frames  # byte-identical JPEG payloads
    for f in got:  # every frame decodable by the image relation
        assert jpeg.decode_jpeg(f).shape == (32, 48, 3)


def test_avi_rejects_malformed_and_foreign_codec():
    with pytest.raises(ValueError, match="RIFF"):
        avi.parse_avi(b"junk")
    with pytest.raises(ValueError, match="AVI"):
        avi.parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    payload = bytearray(avi.encode_avi(_frames(2), 48, 32))
    h264 = payload.replace(b"MJPG", b"H264", 1)  # strh handler
    with pytest.raises(NotImplementedError, match="H264"):
        avi.parse_avi(bytes(h264))
    with pytest.raises(ValueError, match="overruns|truncated"):
        avi.parse_avi(bytes(payload[:100]))


# -- the multimodal seam -----------------------------------------------

def test_decode_media_real_audio_and_video(spark):
    frames = _frames()
    loud_then_quiet = np.concatenate(
        [0.8 * np.ones(2048), 0.01 * np.ones(2048)]
    ) * np.sin(np.arange(4096))
    rows = [
        ("wav-1", "d1", "audio", "audio/wav",
         wav.encode_wav(loud_then_quiet, 8000, bits=16), None, None, None),
        ("avi-1", "d2", "video", "video/avi",
         avi.encode_avi(frames, 48, 32), None, None, None),
        ("wav-bad", "d3", "audio", "audio/wav",
         b"RIFF\x00\x00\x00\x00WAVEjunk", None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["asset_id"]: r for r in MM.decode_media(media).collect()}
    a = got["wav-1"]
    assert a["ok"] is True and a["n_frames"] == 4  # 4096/1024
    feat = np.array(a["feature"])
    assert len(feat) == MM.FEATURE_DIM
    # energy profile: first half loud, second half quiet
    assert feat[:8].sum() > 0.9 > feat[8:].sum()
    v = got["avi-1"]
    assert v["ok"] is True
    assert (v["width"], v["height"], v["n_frames"]) == (48, 32, 6)
    assert abs(sum(v["feature"]) - 1.0) < 1e-5  # mean of histograms
    assert got["wav-bad"]["ok"] is False


def test_extract_frames_feeds_image_relation(spark):
    frames = _frames(7)
    rows = [
        ("vid-a", "d", "video", "video/avi",
         avi.encode_avi(frames, 48, 32), None, None, None),
        ("not-avi", "d", "audio", "audio/wav",
         wav.encode_wav(_tone(256, 1), 8000), None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    ext = MM.extract_frames(media, every_nth=3).collect()
    got = {r["asset_id"]: r for r in ext}
    assert sorted(got) == ["vid-a#0", "vid-a#3", "vid-a#6"]
    assert all(r["video_id"] == "vid-a" for r in ext)
    # frame payloads decode through decode_media as plain images
    frame_media = spark.createDataFrame(
        [(r["asset_id"], "d", "image", "image/jpeg", r["payload"],
          None, None, None) for r in ext],
        MEDIA_SCHEMA,
    )
    dec = MM.decode_media(frame_media).collect()
    assert all(r["ok"] and (r["width"], r["height"]) == (48, 32)
               for r in dec)


def test_phash_pairs_videos_sharing_frames(spark):
    """Cross-video near-dup: two clips share their first frame
    (re-encoded at different quality — near, not identical bytes);
    a third clip is unrelated. Frame-level phash must pair exactly
    the shared frame."""
    y, x = np.mgrid[0:64, 0:64]
    shared = np.repeat(
        (((x // 16 + y // 16) % 2) * 215 + 20)[:, :, None], 3, axis=2
    ).astype(np.uint8)
    other1 = np.full((64, 64, 3), 200, dtype=np.uint8)
    other2 = 255 - shared
    clip_a = avi.encode_avi(
        [jpeg.encode_jpeg(shared, quality=95),
         jpeg.encode_jpeg(other1, quality=90)], 64, 64)
    clip_b = avi.encode_avi(
        [jpeg.encode_jpeg(shared, quality=80, subsample="420"),
         jpeg.encode_jpeg(other2, quality=90)], 64, 64)
    media = spark.createDataFrame(
        [("A", "d", "video", "video/avi", clip_a, None, None, None),
         ("B", "d", "video", "video/avi", clip_b, None, None, None)],
        MEDIA_SCHEMA,
    )
    frames = MM.extract_frames(media, every_nth=1)
    pairs = MM.phash_duplicates(
        frames, max_hamming=3, pixel_fn=MM.real_pixels
    ).collect()
    got = sorted((r["l_id"], r["r_id"]) for r in pairs)
    assert got == [("A#0", "B#0")], got


# -- real resize kernel ------------------------------------------------

def test_resize_images_kernel_matches_plan(spark):
    from news_clustering_and_summarization_spark.functions import bmp, png

    # 100x40 gradient -> letterboxed into 64x64
    y, x = np.mgrid[0:40, 0:100]
    img = np.stack([(x * 255 // 99), (y * 255 // 39),
                    np.full_like(x, 7)], axis=2).astype(np.uint8)
    rows = [
        ("p1", "d", "image", "image/png", png.encode_png(img),
         None, None, None),
        ("bad", "d", "image", "image/png", png.SIGNATURE + b"\x00" * 9,
         None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = MM.resize_images(media, 64, 64).collect()
    assert [r["asset_id"] for r in out] == ["p1"]  # corrupt dropped
    r = out[0]
    assert (r["width"], r["height"]) == (64, 64)
    # kernel dims == resize_plan's metadata arithmetic
    plan = MM.resize_plan(
        MM.decode_media(media.where("asset_id = 'p1'")), 64, 64
    ).collect()[0]
    assert (r["content_width"], r["content_height"]) == (
        plan["new_width"], plan["new_height"])
    canvas = bmp.decode_bmp(r["payload"])
    assert canvas.shape == (64, 64, 3)
    py = (64 - r["content_height"]) // 2
    # letterbox bands are pad_value, content band is not
    assert (canvas[:py] == 0).all() and (canvas[-py:] == 0).all()
    band = canvas[py: py + r["content_height"]]
    # bilinear of a linear ramp stays a ramp: red increases left->
    # right, green top->bottom, blue constant
    assert band[:, :, 2].min() == band[:, :, 2].max() == 7
    assert (np.diff(band[5, :, 0].astype(int)) >= 0).all()
    assert (np.diff(band[:, 5, 1].astype(int)) >= 0).all()
    assert band[0, 0, 0] < 10 and band[0, -1, 0] > 245
