"""Streaming grid histogram (streaming/profiling.py): cumulative
bins across micro-batches match a one-shot batch histogram, quantile
reads are rank-exact on the grid (error <= one bin width vs the true
quantile), replay is idempotent, compaction preserves state."""

from __future__ import annotations

import json
import math
import os

from news_clustering_and_summarization_spark.streaming.profiling import (
    HistogramStream,
)


def _write_batch(path: str, name: str, values: list[float]):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"{name}.json"), "w") as f:
        for v in values:
            f.write(json.dumps({"v": v}) + "\n")


def _mk_stream(spark, src):
    return (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )


B0 = [float(i) for i in range(0, 100)]
B1 = [float(i) for i in range(100, 250)]
B2 = [float(i) for i in range(250, 300)] + [5000.0, -3.0]  # clamped tails


def test_stream_quantiles_within_one_bin(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(src, "b0", B0)
    _write_batch(src, "b1", B1)
    _write_batch(src, "b2", B2)
    hs = HistogramStream(
        spark, str(tmp_path / "state"), "v", lo=0.0, width=10.0,
        n_bins=40,
    )
    q = hs.start(_mk_stream(spark, src), str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    allv = sorted(B0 + B1 + B2)
    got = {r["p"]: r for r in hs.quantiles([0.5, 0.9]).collect()}
    assert got[0.5]["n"] == len(allv)
    for p in (0.5, 0.9):
        true_q = allv[math.ceil(p * len(allv)) - 1]
        assert abs(got[p]["value"] - true_q) <= 10.0
    # histogram equals the one-shot batch build over the union
    union = spark.createDataFrame([(v,) for v in allv], "v double")
    direct = sorted(
        map(
            tuple,
            union.groupBy(hs._bin().alias("bin"))
            .count()
            .withColumnRenamed("count", "cnt")
            .collect(),
        )
    )
    assert sorted(map(tuple, hs.histogram().collect())) == direct


def test_histogram_replay_and_compact(spark, tmp_path):
    hs = HistogramStream(
        spark, str(tmp_path / "state"), "v", lo=0.0, width=10.0,
        n_bins=40,
    )
    batch = spark.createDataFrame([(v,) for v in B0], "v double")
    hs.process_batch(batch, epoch_id=5)
    before = sorted(map(tuple, hs.histogram().collect()))
    hs.process_batch(batch, epoch_id=5)  # crash replay
    assert sorted(map(tuple, hs.histogram().collect())) == before
    hs.process_batch(batch, epoch_id=6)  # genuinely new epoch adds
    doubled = {b: c for b, c in map(tuple, hs.histogram().collect())}
    assert all(c == 2 * dict(before)[b] for b, c in doubled.items())
    hs.process_batch(batch, epoch_id=7)  # third epoch enables a fold
    tripled = {b: c for b, c in map(tuple, hs.histogram().collect())}
    hs.compact()
    dirs = sorted(
        d for d in os.listdir(hs.bins_path) if d.startswith("epoch=")
    )
    assert dirs == ["epoch=-1", "epoch=7"]
    assert {
        b: c for b, c in map(tuple, hs.histogram().collect())
    } == tripled
