"""Streaming HyperLogLog (streaming/cardinality.py): cumulative
registers across micro-batches equal a one-shot batch build, replay
is idempotent (max-merge + overwrite-per-epoch), the estimate tracks
the true running distinct count, and compaction preserves state."""

from __future__ import annotations

import json
import os

from news_clustering_and_summarization_spark.operators.cardinality import (
    hll_build,
)
from news_clustering_and_summarization_spark.streaming.cardinality import (
    HLLStream,
)

M = 512


def _write_batch(path: str, name: str, values: list[str]):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"{name}.json"), "w") as f:
        for v in values:
            f.write(json.dumps({"val": v}) + "\n")


def _mk_stream(spark, src):
    return (
        spark.readStream.schema("val string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )


def test_stream_matches_batch_build_and_estimates(spark, tmp_path):
    b0 = [f"x{i}" for i in range(300)]
    b1 = [f"x{i}" for i in range(150, 450)]  # 150 overlap
    src = str(tmp_path / "src")
    _write_batch(src, "b0", b0)
    _write_batch(src, "b1", b1)
    hll = HLLStream(spark, str(tmp_path / "state"), "val", m=M)
    q = hll.start(_mk_stream(spark, src), str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    union = spark.createDataFrame(
        [(v,) for v in b0 + b1], "val string"
    )
    direct = hll_build(union, "val", M)
    assert sorted(map(tuple, hll.registers().collect())) == sorted(
        map(tuple, direct.collect())
    )
    est = hll.estimate()
    assert abs(est - 450) <= 0.15 * 450, est


def test_replayed_epoch_does_not_change_registers(spark, tmp_path):
    vals = [f"v{i}" for i in range(200)]
    src = str(tmp_path / "src")
    _write_batch(src, "b0", vals)
    hll = HLLStream(spark, str(tmp_path / "state"), "val", m=M)
    q = hll.start(_mk_stream(spark, src), str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    before = sorted(map(tuple, hll.registers().collect()))

    # simulate crash replay: reprocess the same batch under the same
    # epoch id AND again under a new epoch id — max-merge absorbs both
    batch = spark.createDataFrame([(v,) for v in vals], "val string")
    hll.process_batch(batch, 0)
    hll.process_batch(batch, 99)
    after = sorted(map(tuple, hll.registers().collect()))
    assert before == after


def test_compaction_preserves_registers_and_estimate(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(src, "b0", [f"a{i}" for i in range(100)])
    _write_batch(src, "b1", [f"b{i}" for i in range(100)])
    _write_batch(src, "b2", [f"c{i}" for i in range(50)])
    hll = HLLStream(spark, str(tmp_path / "state"), "val", m=M)
    q = hll.start(_mk_stream(spark, src), str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    before = sorted(map(tuple, hll.registers().collect()))
    est_before = hll.estimate()
    hll.compact()
    dirs = sorted(
        d for d in os.listdir(hll.regs_path) if d.startswith("epoch=")
    )
    assert dirs == ["epoch=-1", "epoch=2"], dirs
    assert sorted(map(tuple, hll.registers().collect())) == before
    assert hll.estimate() == est_before


def test_estimate_on_fresh_state_is_zero(spark, tmp_path):
    hll = HLLStream(spark, str(tmp_path / "state"), "val", m=M)
    assert hll.estimate() == 0.0
