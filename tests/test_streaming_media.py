"""Streaming media near-dup dedup (streaming/dedup.PhashDedupStream):
a landing directory of REAL image files (mixed codecs) streamed via
the binaryFile source, fingerprinted with real decode, deduplicated
against cumulative history — including cross-format and cross-batch
near-dups — with the epoch layout's replay guarantee."""

from __future__ import annotations

import os
import time

import numpy as np

from news_clustering_and_summarization_spark.functions import bmp, jpeg, png
from news_clustering_and_summarization_spark.sources import media_ingest as MI
from news_clustering_and_summarization_spark.streaming.dedup import (
    PhashDedupStream,
)


def _blocks(shift: int = 0) -> np.ndarray:
    y, x = np.mgrid[0:64, 0:64]
    cells = (((x // 16 + y // 16 + shift) % 2) * 215 + 20)
    return np.repeat(cells[:, :, None], 3, axis=2).astype(np.uint8)


def _drain(q, sink, want, timeout=90):
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            if len(sink()) >= want:
                return
        except Exception:
            pass
        time.sleep(0.5)


def test_phash_stream_dedups_across_batches_and_formats(
    spark, tmp_path
):
    landing = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    a = _blocks()
    b = _blocks(1)  # inverted blocks: every aHash bit differs

    def put(name, data):
        tmp = os.path.join(landing, "." + name)
        with open(tmp, "wb") as f:
            f.write(data)
        os.rename(tmp, os.path.join(landing, name))

    # batch 1: original (BMP) + near-dup of it (JPEG re-encode) +
    # a genuinely different image
    put("a0.bmp", bmp.encode_bmp(a))
    put("a1.jpg", jpeg.encode_jpeg(a, quality=90))
    put("b0.png", png.encode_png(b))
    dedup = PhashDedupStream(spark, state, max_hamming=3)
    stream = MI.read_media_stream(
        spark, landing, glob="*.{bmp,png,jpg}", max_files_per_trigger=8
    )
    q = dedup.start(stream, ckpt)
    try:
        _drain(q, None, 2,
               timeout=60)
        # wait until epoch 0 processed
        deadline = time.time() + 60
        while time.time() < deadline:
            got = {r["asset_id"] for r in dedup.accepted().collect()}
            if got >= {"a0.bmp", "b0.png"}:
                break
            time.sleep(0.5)
        got = {r["asset_id"] for r in dedup.accepted().collect()}
        # min-id representative wins within the batch; the JPEG
        # re-encode of the same pixels is rejected ACROSS formats
        assert got == {"a0.bmp", "b0.png"}, got
        # batch 2: another re-encode of a (PNG this time) + one new
        put("a2.png", png.encode_png(a))
        # c: horizontal stripes — a pattern distinct from both
        # checkerboard phases
        stripes = np.repeat(
            (((np.mgrid[0:64, 0:64][0] // 8) % 2) * 215 + 20)
            .astype(np.uint8)[:, :, None], 3, axis=2)
        put("c0.bmp", bmp.encode_bmp(stripes))
        deadline = time.time() + 60
        while time.time() < deadline:
            got = {r["asset_id"] for r in dedup.accepted().collect()}
            if "c0.bmp" in got:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = {r["asset_id"] for r in dedup.accepted().collect()}
    # a2 rejected against HISTORY (a0 accepted in an earlier epoch)
    assert got == {"a0.bmp", "b0.png", "c0.bmp"}, got
    # replaying epoch state: reprocessing batch 1's rows with the
    # same epoch id recomputes the same acceptance set (exactly-once
    # layout: overwrite, not append)
    batch1 = MI.read_media(spark, landing, glob="a0.bmp")
    n_before = dedup.accepted().count()
    dedup.process_batch(batch1, 0)
    assert dedup.accepted().count() <= n_before
    assert "a0.bmp" in {
        r["asset_id"] for r in dedup.accepted().collect()
    }


def test_phash_stream_compact_preserves_acceptance(spark, tmp_path):
    state = str(tmp_path / "state2")
    dedup = PhashDedupStream(spark, state, max_hamming=3)
    rows1 = [("x1", "d", "image", "image/bmp", bmp.encode_bmp(_blocks()),
              None, None, None)]
    rows2 = [("x2", "d", "image", "image/jpeg",
              jpeg.encode_jpeg(_blocks(), quality=92), None, None, None),
             ("y1", "d", "image", "image/bmp",
              bmp.encode_bmp(_blocks(1)), None, None, None)]
    from news_clustering_and_summarization_spark.schemas import MEDIA_SCHEMA

    dedup.process_batch(spark.createDataFrame(rows1, MEDIA_SCHEMA), 0)
    dedup.process_batch(spark.createDataFrame(rows2, MEDIA_SCHEMA), 1)
    before = {r["asset_id"] for r in dedup.accepted().collect()}
    assert before == {"x1", "y1"}  # x2 near-dups history x1
    dedup.compact()
    after = {r["asset_id"] for r in dedup.accepted().collect()}
    assert after == before
    # post-compaction batches still dedup against folded history
    rows3 = [("x3", "d", "image", "image/png",
              png.encode_png(_blocks()), None, None, None)]
    dedup.process_batch(spark.createDataFrame(rows3, MEDIA_SCHEMA), 2)
    assert {r["asset_id"] for r in dedup.accepted().collect()} == before
