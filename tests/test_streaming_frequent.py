"""Streaming count-min sketch (streaming/frequent.py): cumulative
counts across micro-batches, replay idempotence (overwrite-per-epoch),
equivalence to a one-shot batch build, and compaction."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from news_clustering_and_summarization_spark.operators.frequent import (
    cms_build,
)
from news_clustering_and_summarization_spark.streaming.frequent import (
    CMSStream,
)

WIDTH = 256


def _write_batch(path: str, name: str, tokens: list[str]):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"{name}.json"), "w") as f:
        for t in tokens:
            f.write(json.dumps({"token": t}) + "\n")


def _mk_stream(spark, src):
    return (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )


def _est(spark, cms, tokens):
    q = spark.createDataFrame([(t,) for t in tokens], "token string")
    return {
        r["token"]: r["cms_estimate"]
        for r in cms.estimate(q, "token").collect()
    }


def test_stream_accumulates_and_matches_batch_build(spark, tmp_path):
    b0 = ["a", "a", "b"]
    b1 = ["a", "b", "c", "c"]
    src = str(tmp_path / "src")
    _write_batch(src, "b0", b0)
    _write_batch(src, "b1", b1)
    cms = CMSStream(spark, str(tmp_path / "state"), "token", width=WIDTH)
    q = cms.start(_mk_stream(spark, src), str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    # streamed sketch == one-shot build over the union
    union = spark.createDataFrame([(t,) for t in b0 + b1], "token string")
    direct = cms_build(union, "token", WIDTH)
    assert sorted(map(tuple, cms.sketch().collect())) == sorted(
        map(tuple, direct.collect())
    )
    est = _est(spark, cms, ["a", "b", "c"])
    assert est["a"] >= 3 and est["b"] >= 2 and est["c"] >= 2


def test_epoch_replay_does_not_double_count(spark, tmp_path):
    cms = CMSStream(spark, str(tmp_path / "state"), "token", width=WIDTH)
    batch = spark.createDataFrame([("x",), ("x",), ("y",)], "token string")
    cms.process_batch(batch, epoch_id=7)
    before = sorted(map(tuple, cms.sketch().collect()))
    # crash replay: the SAME epoch id arrives again
    cms.process_batch(batch, epoch_id=7)
    after = sorted(map(tuple, cms.sketch().collect()))
    assert before == after
    # a genuinely new epoch DOES add
    cms.process_batch(batch, epoch_id=8)
    est = _est(spark, cms, ["x"])
    assert est["x"] >= 4


def test_compact_preserves_counts(spark, tmp_path):
    cms = CMSStream(spark, str(tmp_path / "state"), "token", width=WIDTH)
    for e in range(3):
        cms.process_batch(
            spark.createDataFrame([("t", ), ("u",)], "token string"), e
        )
    before = sorted(map(tuple, cms.sketch().collect()))
    cms.compact()
    assert sorted(map(tuple, cms.sketch().collect())) == before
    # finished epochs folded; the NEWEST stays (it may not be
    # checkpoint-committed — folding it would double-count a replay)
    dirs = sorted(
        d for d in os.listdir(cms.cells_path) if d.startswith("epoch=")
    )
    assert dirs == ["epoch=-1", "epoch=2"]
    # a replay of the newest epoch after compaction is STILL a no-op
    cms.process_batch(
        spark.createDataFrame([("t",), ("u",)], "token string"), 2
    )
    assert sorted(map(tuple, cms.sketch().collect())) == before


def test_empty_state_estimates_zero(spark, tmp_path):
    cms = CMSStream(spark, str(tmp_path / "state"), "token", width=WIDTH)
    est = _est(spark, cms, ["nothing"])
    assert est["nothing"] == 0
