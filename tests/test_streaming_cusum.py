"""Streaming CUSUM (streaming/temporal.py): stream == batch
equivalence over micro-batches, replay idempotence
(overwrite-per-epoch), zero-fill across batch boundaries, and
compaction."""

from __future__ import annotations

import json
import os

from news_clustering_and_summarization_spark.operators.temporal import (
    cusum_daily,
)
from news_clustering_and_summarization_spark.streaming.temporal import (
    CusumStream,
)


def _write_batch(path: str, name: str, rows: list[tuple[str, str]]):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"{name}.json"), "w") as f:
        for etype, ts in rows:
            f.write(json.dumps({"event_type": etype, "ts": ts}) + "\n")


def _mk_stream(spark, src):
    return (
        spark.readStream.schema("event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )


def _rows(etype, day, n):
    return [(etype, f"2024-03-{day:02d}T10:00:00Z")] * n


# a drifting series: quiet week then a burst, split across batches so
# the zero-filled gap (03-05) spans a micro-batch boundary
B0 = _rows("login", 1, 2) + _rows("login", 2, 1) + _rows("click", 1, 3)
B1 = _rows("login", 3, 2) + _rows("click", 6, 3)
B2 = _rows("login", 7, 9) + _rows("login", 8, 11) + _rows("click", 7, 3)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, ts string"
    ).selectExpr("event_type", "cast(ts as timestamp) AS ts")


def test_stream_matches_batch_cusum(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(src, "b0", B0)
    _write_batch(src, "b1", B1)
    _write_batch(src, "b2", B2)
    cs = CusumStream(spark, str(tmp_path / "state"))
    q = cs.start(_mk_stream(spark, src), str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    streamed = sorted(map(tuple, cs.detect().collect()))
    union = _df(spark, B0 + B1 + B2)
    batch = sorted(map(tuple, cusum_daily(union).collect()))
    assert streamed == batch and len(streamed) > 0
    # the burst trips the alarm; the steady series never does
    alarms = {(r[0], r[1]): r[4] for r in streamed}
    assert alarms[("login", "2024-03-08")] is True
    assert not any(v for (g, _), v in alarms.items() if g == "click")


def test_epoch_replay_does_not_double_count(spark, tmp_path):
    cs = CusumStream(spark, str(tmp_path / "state"))
    batch = _df(spark, B0)
    cs.process_batch(batch, epoch_id=3)
    before = sorted(map(tuple, cs.detect().collect()))
    # crash replay: the SAME epoch id arrives again
    cs.process_batch(batch, epoch_id=3)
    after = sorted(map(tuple, cs.detect().collect()))
    assert before == after
    # a genuinely new epoch DOES change the counts
    cs.process_batch(batch, epoch_id=4)
    daily = {
        (r["g"], str(r["d"])): r["x"] for r in cs.daily().collect()
    }
    assert daily[("login", "2024-03-01")] == 4


def test_compact_preserves_detection(spark, tmp_path):
    cs = CusumStream(spark, str(tmp_path / "state"))
    for i, b in enumerate((B0, B1, B2)):
        cs.process_batch(_df(spark, b), epoch_id=i)
    before = sorted(map(tuple, cs.detect().collect()))
    cs.compact()
    dirs = sorted(
        d for d in os.listdir(cs.daily_path) if d.startswith("epoch=")
    )
    assert dirs == ["epoch=-1", "epoch=2"]
    assert sorted(map(tuple, cs.detect().collect())) == before
