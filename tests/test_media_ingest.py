"""binaryFile media ingestion (sources/media_ingest.py): batch read
with glob pushdown, the streaming variant with paced triggers +
checkpointed exactly-once restart, and the e2e into decode_media on
real bytes."""

from __future__ import annotations

import os
import time

import numpy as np

from news_clustering_and_summarization_spark.functions import (
    avi,
    bmp,
    jpeg,
    png,
    wav,
)
from news_clustering_and_summarization_spark.operators import multimodal as MM
from news_clustering_and_summarization_spark.sources import media_ingest as MI


def _img(seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(24, 32, 3), dtype=np.uint8)


def _write_assets(d: str) -> dict[str, bytes]:
    files = {
        "a.bmp": bmp.encode_bmp(_img(1)),
        "b.png": png.encode_png(_img(2)),
        "c.jpg": jpeg.encode_jpeg(_img(3), quality=90),
        "d.wav": wav.encode_wav(0.3 * np.sin(np.arange(2048) / 9.0), 8000),
        "e.avi": avi.encode_avi(
            [jpeg.encode_jpeg(_img(4), quality=85)] * 2, 32, 24
        ),
        "notes.txt": b"not media",
    }
    for name, data in files.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(data)
    return files


def test_batch_read_normalizes_and_globs(spark, tmp_path):
    d = str(tmp_path / "assets")
    os.makedirs(d)
    files = _write_assets(d)
    got = {r["asset_id"]: r for r in MI.read_media(spark, d).collect()}
    assert sorted(got) == sorted(files)
    assert got["a.bmp"]["media_type"] == "image"
    assert got["c.jpg"]["mime"] == "image/jpeg"
    assert got["d.wav"]["media_type"] == "audio"
    assert got["e.avi"]["media_type"] == "video"
    assert got["notes.txt"]["media_type"] is None  # unknown extension
    assert bytes(got["b.png"]["payload"]) == files["b.png"]
    assert got["a.bmp"]["n_bytes"] == len(files["a.bmp"])
    # glob pushdown: only images listed, the rest never opened
    only_png = MI.read_media(spark, d, glob="*.png").collect()
    assert [r["asset_id"] for r in only_png] == ["b.png"]


def test_batch_read_feeds_decode_media(spark, tmp_path):
    d = str(tmp_path / "assets")
    os.makedirs(d)
    _write_assets(d)
    media = MI.read_media(spark, d, glob="*.{bmp,png,jpg,wav,avi}")
    dec = {r["asset_id"]: r
           for r in MM.decode_media(media).collect()}
    assert len(dec) == 5 and all(r["ok"] for r in dec.values())
    assert (dec["a.bmp"]["width"], dec["a.bmp"]["height"]) == (32, 24)
    assert dec["e.avi"]["n_frames"] == 2
    assert dec["d.wav"]["n_frames"] == 2  # 2048 samples / 1024


def test_stream_paced_exactly_once_with_restart(spark, tmp_path):
    src = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_assets(src)

    def start():
        return (
            MI.read_media_stream(
                spark, src, glob="*.{bmp,png,jpg,wav,avi}",
                max_files_per_trigger=2,
            )
            .select("asset_id", "n_bytes")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )

    q = start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(sink).count() >= 5:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.read.parquet(sink)
    assert got.count() == 5
    # restart on the same checkpoint: nothing re-emitted
    q2 = start()
    try:
        time.sleep(3)
    finally:
        q2.stop()
    again = spark.read.parquet(sink)
    assert again.count() == 5  # exactly-once per file
    assert sorted(r["asset_id"] for r in again.collect()) == [
        "a.bmp", "b.png", "c.jpg", "d.wav", "e.avi",
    ]
