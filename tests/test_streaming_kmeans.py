"""Streaming mini-batch k-means (streaming/kmeans.py): blob tracking
across micro-batches, replay idempotence (state contribution AND
output), centroid drift toward batch means, and the init path."""

from __future__ import annotations

import json
import os

from news_clustering_and_summarization_spark.streaming.kmeans import (
    KMeansStream,
)

BLOBS = {0: [0.0, 0.0], 1: [10.0, 10.0]}


def _batch_rows(ids_blobs):
    return [
        {"id": i, "v": [c + (i % 3) * 0.01 for c in BLOBS[b]]}
        for i, b in ids_blobs
    ]


def _write_batch(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"{name}.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_tracks_blobs(spark, tmp_path):
    src = str(tmp_path / "src")
    # first batch: ids 0 (blob A) and 1 (blob B) seed the centroids
    _write_batch(src, "b0", _batch_rows([(0, 0), (1, 1), (2, 0), (3, 1)]))
    _write_batch(src, "b1", _batch_rows([(4, 0), (5, 1), (6, 1), (7, 0)]))
    km = KMeansStream(
        spark, str(tmp_path / "state"), "id", "v", k=2, dim=2
    )
    stream = (
        spark.readStream.schema("id long, v array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = km.start(stream, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    got = {r["id"]: r["cluster"] for r in km.assigned().collect()}
    assert len(got) == 8
    # blob members co-cluster, blobs stay separate
    a = {got[i] for i in (0, 2, 4, 7)}
    b = {got[i] for i in (1, 3, 5, 6)}
    assert len(a) == 1 and len(b) == 1 and a != b
    cents = dict(km.centroids())
    ca, cb = cents[a.pop()], cents[b.pop()]
    assert abs(ca[0] - 0.0) < 0.1 and abs(cb[0] - 10.0) < 0.1


def test_epoch_replay_is_idempotent(spark, tmp_path):
    km = KMeansStream(
        spark, str(tmp_path / "state"), "id", "v", k=2, dim=2
    )
    b0 = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [0.1, 0.0])],
        "id long, v array<double>",
    )
    b1 = spark.createDataFrame(
        [(3, [9.9, 10.0]), (4, [0.2, 0.1])], "id long, v array<double>"
    )
    km.process_batch(b0, 0)
    km.process_batch(b1, 1)
    cents_before = km.centroids()
    out_before = sorted(
        map(tuple, km.assigned().select("id", "cluster").collect())
    )
    # crash replay of BOTH epochs, out of order
    km.process_batch(b1, 1)
    km.process_batch(b0, 0)
    assert km.centroids() == cents_before
    assert (
        sorted(map(tuple, km.assigned().select("id", "cluster").collect()))
        == out_before
    )


def test_centroids_weighted_by_all_history(spark, tmp_path):
    km = KMeansStream(
        spark, str(tmp_path / "state"), "id", "v", k=1, dim=1
    )
    km.process_batch(
        spark.createDataFrame([(0, [0.0]), (1, [2.0])],
                              "id long, v array<double>"),
        0,
    )
    km.process_batch(
        spark.createDataFrame([(2, [10.0])], "id long, v array<double>"),
        1,
    )
    cents = km.centroids()
    # running mean over all 3 points: (0 + 2 + 10) / 3
    assert abs(cents[0][1][0] - 4.0) < 1e-9
